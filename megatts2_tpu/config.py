"""Frozen dataclass configs for all models + a YAML config loader.

Replaces the reference's Lightning ``class_path``/``init_args`` YAML DI trees
(``configs/*.yaml`` + ``utils/utils.py:86-102 instantiate_class``) with typed
dataclasses and a small registry, keeping the same knob names so reference
configs translate 1:1.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Tuple

import yaml

from . import HIFIGAN_HOP_LENGTH, HIFIGAN_MEL_CHANNELS, HIFIGAN_SR


@dataclass(frozen=True)
class MRTEConfig:
    """Knobs of reference ``modules/mrte.py:63-152`` / configs/config_gan.yaml."""

    mel_bins: int = HIFIGAN_MEL_CHANNELS
    mel_frames: int = HIFIGAN_HOP_LENGTH
    mel_activation: str = "ReLU"
    mel_kernel_size: int = 3
    mel_stride: int = 16
    mel_n_layer: int = 5
    mel_n_stack: int = 5
    mel_n_block: int = 2
    content_ff_dim: int = 1024
    content_n_heads: int = 2
    content_n_layers: int = 8
    hidden_size: int = 512
    duration_token_ms: float = HIFIGAN_HOP_LENGTH / HIFIGAN_SR * 1000
    phone_vocab_size: int = 320
    dropout: float = 0.1
    sample_rate: int = HIFIGAN_SR
    use_flash: bool = False  # Pallas fused attention in the phone encoder


@dataclass(frozen=True)
class VQPEConfig:
    """Knobs of reference ``modules/vqpe.py:13-48``."""

    mel_bins: int = 20  # prosody = low mel bands (config_gan.yaml:62)
    stride: int = 8
    hidden_size: int = 384
    kernel_size: int = 5
    n_layers: int = 3
    n_stacks: int = 5
    n_blocks: int = 2
    vq_bins: int = 1024
    vq_dim: int = 256
    activation: str = "ReLU"


@dataclass(frozen=True)
class MegaGConfig:
    """Knobs of reference ``models/megatts2.py:30-54``."""

    mrte: MRTEConfig = field(default_factory=MRTEConfig)
    vqpe: VQPEConfig = field(default_factory=VQPEConfig)
    kernel_size: int = 5
    activation: str = "ReLU"
    hidden_size: int = 512
    decoder_n_stack: int = 4
    decoder_n_block: int = 2
    # scan conv residual stacks: ~10x faster compile, stacked conv param
    # layout (converter must match); numerics-equivalent
    scan_stacks: bool = False


@dataclass(frozen=True)
class DiscriminatorConfig:
    """Knobs of reference ``modules/dscrm.py:113-123``."""

    time_lengths: Tuple[int, ...] = (32, 64, 128)
    freq_length: int = 80
    kernel: Tuple[int, int] = (3, 3)
    c_in: int = 1
    hidden_size: int = 192


@dataclass(frozen=True)
class MegaPLMConfig:
    """Knobs of reference ``models/megatts2.py:120-146``."""

    n_layers: int = 12
    n_heads: int = 16
    vq_dim: int = 512
    tc_latent_dim: int = 512
    vq_bins: int = 1024
    dropout: float = 0.1
    # Pallas fused attention on the training path.  Default ON for the PLM:
    # its multi-utterance prompts reach 1-4k tokens, where flash measures
    # 3.7-4.6x fwd / 2-2.3x train-step vs masked einsum on v5e
    # (BENCHMARKS.md attention A/B); a wash at T<=512.
    use_flash: bool = True

    @property
    def d_model(self) -> int:
        return self.vq_dim + self.tc_latent_dim

    @property
    def bos_id(self) -> int:
        return self.vq_bins

    @property
    def eos_id(self) -> int:
        return self.vq_bins + 1


@dataclass(frozen=True)
class MegaADMConfig:
    """Knobs of reference ``models/megatts2.py:201-231``."""

    n_layers: int = 8
    n_heads: int = 8
    emb_dim: int = 256
    tc_latent_dim: int = 512
    tc_emb_dim: int = 256
    dropout: float = 0.1
    # The reference STORES max_duration_token=256 but never uses it: infer
    # clamps to a hardcoded 128 (megatts2.py:275) and the dataset skips
    # durations >=128 (datamodule.py:259-260).  Here the knob is wired for
    # real (infer clamp + ADMBatchBuilder skip threshold) and defaults to
    # the reference's EFFECTIVE value.
    max_duration_token: int = 128
    use_flash: bool = False  # Pallas fused attention on the training path

    @property
    def d_model(self) -> int:
        return self.emb_dim + self.tc_emb_dim


@dataclass(frozen=True)
class HiFiGANConfig:
    """HiFi-GAN V1 generator at 16 kHz / hop 256 (the speechbrain
    tts-hifigan-libritts-16kHz topology the reference vocodes with)."""

    in_channels: int = HIFIGAN_MEL_CHANNELS
    upsample_initial_channel: int = 512
    upsample_rates: Tuple[int, ...] = (8, 8, 2, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (16, 16, 4, 4)
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    lrelu_slope: float = 0.1
    # stages with ≤ this many channels run their MRF resblocks space-to-depth
    # blocked (exact; 2.3× faster at ch=32 on v5e — models/hifigan.py)
    space_to_depth_ch: int = 32


@dataclass(frozen=True)
class VocosConfig:
    """Vocos-style iSTFT vocoder (arXiv:2306.00814 topology) at the same
    16 kHz / hop-256 geometry as :class:`HiFiGANConfig`.

    Not a reference component (the reference only consumes a pretrained
    time-domain HiFi-GAN); this is the framework's fast vocoder family —
    the backbone runs at MEL rate (no 256x transposed-conv upsampling) and
    an iSTFT head reconstructs the waveform, ~23x fewer FLOPs than
    HiFi-GAN V1 at equal output length."""

    in_channels: int = HIFIGAN_MEL_CHANNELS
    dim: int = 512
    intermediate_dim: int = 1536
    num_layers: int = 8
    n_fft: int = 1024
    hop_length: int = HIFIGAN_HOP_LENGTH
    mag_clip: float = 100.0  # exp(log-mag) safety clip, as in Vocos


@dataclass(frozen=True)
class WaveDiscConfig:
    """Waveform discriminator set for vocoder training (HiFi-GAN MPD+MSD
    topology, arXiv:2010.05646 — no reference counterpart; the reference
    never trains a vocoder)."""

    periods: Tuple[int, ...] = (2, 3, 5, 7, 11)
    msd_scales: int = 3
    mpd_base_ch: int = 32
    msd_base_ch: int = 128
    max_ch: int = 1024
    lrelu_slope: float = 0.1


@dataclass(frozen=True)
class VocoderTrainConfig:
    """Vocoder GAN training knobs (HiFi-GAN recipe defaults)."""

    initial_learning_rate: float = 2e-4
    adam_b1: float = 0.8
    adam_b2: float = 0.99
    lr_decay: float = 0.999  # per-epoch-style exponential decay on steps
    lr_decay_steps: int = 1000
    max_steps: int = 400_000
    segment_frames: int = 64  # training crop: frames (x256 samples)
    mel_loss_coeff: float = 45.0
    fm_loss_coeff: float = 2.0
    train_dtype: str = "bfloat16"
    log_every_n_steps: int = 100
    val_check_interval: int = 1500
    # checkpoint on every k-th validation (saves ride the remote tunnel at
    # ~25 MB/s — a full-size save costs ~1.5 min, so at-scale runs decouple
    # save cadence from the val curve's cadence)
    save_every_n_vals: int = 1
    seed: int = 0


@dataclass(frozen=True)
class TrainConfig:
    initial_learning_rate: float = 3e-5
    warmup_steps: int = 200
    max_steps: int = 600_000
    G_commit_loss_coeff: float = 0.15
    G_vq_loss_coeff: float = 0.05
    G_adv_loss_coeff: float = 1.0
    # >0: maintain an EMA copy of the generator weights and use it for
    # validation / checkpoint selection / inference export.  Long GAN runs
    # drift past their val minimum (round-4 50k run: best 0.2550@28k then
    # 0.277@50k); EMA decouples the evaluated weights from the adversarial
    # wobble.  The reference has no equivalent (it just trains 600k steps
    # and relies on ModelCheckpoint top-k).
    g_ema_decay: float = 0.0
    train_dtype: str = "bfloat16"
    log_every_n_steps: int = 100
    val_check_interval: int = 1500
    save_every_n_vals: int = 1  # see VocoderTrainConfig
    seed: int = 0


def _build(cls, d: dict, strict_source: bool = False) -> Any:
    """Recursively build a (nested) dataclass from a plain dict, accepting the
    reference's ``{class_path, init_args}`` wrappers transparently.

    Unknown keys are warned about (``strict_source=True`` means ``d`` holds
    ONLY knobs for ``cls``, so any unknown key is a likely typo; loaders that
    pass mixed dicts leave it False and skip the check)."""
    if isinstance(d, dict) and "init_args" in d:
        d = d["init_args"]
        strict_source = True
    known = {f.name for f in dataclasses.fields(cls)}
    if strict_source:
        for k in d:
            if k not in known and k != "class_path":
                import warnings

                warnings.warn(
                    f"config key '{k}' is not a knob of {cls.__name__}; ignored"
                    " (typo?)",
                    stacklevel=2,
                )
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in d:
            continue
        v = d[f.name]
        if dataclasses.is_dataclass(f.type) or f.type in (
            MRTEConfig, VQPEConfig,
        ):
            v = _build(f.type, v)
        elif isinstance(v, list):
            v = tuple(tuple(e) if isinstance(e, list) else e for e in v)
        kwargs[f.name] = v
    return cls(**kwargs)


def load_gan_config(path: str) -> tuple[MegaGConfig, DiscriminatorConfig, TrainConfig]:
    with open(path) as f:
        cfg = yaml.safe_load(f)
    m = cfg["model"]
    g_args = dict(m["G"].get("init_args", m["G"]))
    g = MegaGConfig(
        mrte=_build(MRTEConfig, g_args["mrte"]),
        vqpe=_build(VQPEConfig, g_args["vqpe"]),
        **{k: v for k, v in g_args.items() if k not in ("mrte", "vqpe", "class_path")},
    )
    d = _build(DiscriminatorConfig, m.get("D", {}))
    t = _build(TrainConfig, {**m, **cfg.get("trainer", {})})
    return g, d, t


def load_vocoder_config(path: str):
    """Vocoder-training YAML → (voc_cfg, WaveDiscConfig, VocoderTrainConfig).
    ``model.vocoder.family`` picks the generator: ``vocos`` (default, fast
    iSTFT family) or ``hifigan``."""
    with open(path) as f:
        cfg = yaml.safe_load(f)
    m = cfg["model"]
    v = dict(m.get("vocoder", {}))
    family = v.pop("family", "vocos")
    if family not in ("vocos", "hifigan"):
        raise ValueError(f"unknown vocoder family {family!r}")
    vcls = VocosConfig if family == "vocos" else HiFiGANConfig
    voc = _build(vcls, v.get("init_args", v), strict_source=True)
    d = _build(WaveDiscConfig, m.get("D", {}))
    t = _build(VocoderTrainConfig, {**m, **cfg.get("trainer", {})})
    return voc, d, t


def load_plm_config(path: str) -> tuple[MegaPLMConfig, TrainConfig]:
    with open(path) as f:
        cfg = yaml.safe_load(f)
    return (
        _build(MegaPLMConfig, cfg["model"]["plm"]),
        _build(TrainConfig, {**cfg["model"], **cfg.get("trainer", {})}),
    )


def load_adm_config(path: str) -> tuple[MegaADMConfig, TrainConfig]:
    with open(path) as f:
        cfg = yaml.safe_load(f)
    return (
        _build(MegaADMConfig, cfg["model"]["adm"]),
        _build(TrainConfig, {**cfg["model"], **cfg.get("trainer", {})}),
    )
