"""Megatts — end-to-end zero-shot TTS synthesis.

Parity target: reference ``models/megatts2.py:295-375``:
prompt wavs → mel → MRTE tc_latent → ADM durations → length-regulate →
×8 max-pool → PLM prosody codes → VQ decode (+×8 repeat) → MegaG decoder →
HiFi-GAN waveform, prompt audio prepended.

TPU-first: the whole cascade after mel extraction is ONE jitted function with
static (bucketed) shapes; both AR loops are KV-cached scans; vocoding runs
on-TPU.  Dynamic true lengths ride alongside as scalars and the host trims
the final waveform.
"""
from __future__ import annotations

import functools
import glob
import os
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .. import HIFIGAN_HOP_LENGTH, HIFIGAN_SR
from ..config import (
    HiFiGANConfig,
    MegaADMConfig,
    MegaGConfig,
    MegaPLMConfig,
    VocosConfig,
)
from ..ops import mel_spectrogram, regulate_length
from ..text.symbol_table import SymbolTable
from ..text.tokenizer import TextTokenizer
from ..utils.audio import load_wav, peak_normalize, save_wav
from .adm import adm_infer
from .hifigan import HiFiGAN
from .megag import MegaG
from .plm import plm_infer


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


def vocode(params: dict, cfg, mel: jnp.ndarray, dtype: Any) -> jnp.ndarray:
    """mel (B, T, 80) → waveform (B, T*hop).  Dispatches on the vocoder
    config type: :class:`HiFiGANConfig` (reference-parity, converted
    speechbrain weights) or :class:`VocosConfig` (fast iSTFT family,
    models/vocos.py).  The config rides through ``synthesize``'s static
    args, so the choice is a compile-time switch, not a traced branch."""
    if isinstance(cfg, VocosConfig):
        from .vocos import Vocos

        return Vocos(cfg, dtype=dtype).apply({"params": params}, mel)
    return HiFiGAN(cfg, dtype=dtype).apply({"params": params}, mel)


def max_pool_time(x: jnp.ndarray, stride: int) -> jnp.ndarray:
    """F.max_pool1d(x, stride, ceil_mode=True) over the time axis of
    (B, T, D)."""
    pad = (-x.shape[1]) % stride
    return nn.max_pool(x, window_shape=(stride,), strides=(stride,), padding=((0, pad),))


@functools.partial(
    jax.jit,
    static_argnames=(
        "g_cfg", "plm_cfg", "adm_cfg", "hifi_cfg", "max_frames", "dtype", "quant",
        "plm_temperature", "plm_top_k",
    ),
)
def synthesize(
    g_vars: dict,
    plm_params: dict,
    adm_params: dict,
    hifi_params: dict,
    g_cfg: MegaGConfig,
    plm_cfg: MegaPLMConfig,
    adm_cfg: MegaADMConfig,
    hifi_cfg: HiFiGANConfig,
    phone_tokens: jnp.ndarray,  # (B, Tp) int32, 0-padded
    phone_lens: jnp.ndarray,  # (B,)
    mels_prompt: jnp.ndarray,  # (B, Tm, 80)
    max_frames: int,  # static output frame budget
    dtype: Any = jnp.bfloat16,
    quant: bool = False,  # plm params are an int8 weight-only tree
    plm_temperature: float = 0.0,  # >0: sample prosody codes
    plm_top_k: int = 0,
    rng: Optional[jnp.ndarray] = None,  # PRNGKey when sampling
    plm_prompt_tc: Optional[jnp.ndarray] = None,  # (B, P, D) in-context
    plm_prompt_codes: Optional[jnp.ndarray] = None,  # (B, P) prosody prompt
):
    """Batched zero-shot synthesis.  Returns (wav (B, max_frames*hop),
    n_frames (B,)) — callers trim with n_frames*hop."""
    g = MegaG(g_cfg, dtype=dtype)

    # 1. content/timbre latent (phone × mel-prompt cross attention)
    tc_latent = g.apply(
        g_vars,
        phone_tokens,
        mels_prompt,
        phone_lens,
        method=lambda m, p, mel, pl: m.mrte.tc_latent(p, mel, pl),
    )  # (B, Tp, H)

    # 2. AR duration decode (KV-cached scan)
    # quant applies to the PLM only: the ADM (d_model 512, 8 layers) is
    # latency- not weight-bound — int8 measured SLOWER there (8.1 vs 6.5 ms,
    # BENCHMARKS.md "Int8 weight-only decode")
    dt = adm_infer(adm_params, adm_cfg, tc_latent.astype(jnp.float32), dtype=dtype)
    # zero out predictions beyond the true phone length
    pos = jnp.arange(dt.shape[1])[None, :]
    dt = jnp.where(pos < phone_lens[:, None], dt, 0)
    n_frames = jnp.minimum(dt.sum(axis=1), max_frames)

    # 3. length-regulate to frame rate
    tc_expand = regulate_length(tc_latent, dt, max_frames)  # (B, Tf, H)

    # 4. 8x max-pool to prosody-code rate, AR prosody decode
    tc_plm = max_pool_time(tc_expand, 8)  # (B, Tf/8, H)
    p_codes = plm_infer(
        plm_params, plm_cfg, tc_plm.astype(jnp.float32), dtype=dtype, quant=quant,
        temperature=plm_temperature, top_k=plm_top_k, rng=rng,
        prompt_tc=plm_prompt_tc, prompt_codes=plm_prompt_codes,
    )

    # 5. VQ decode, ×8 upsample, mel decode
    zq = g.apply(
        g_vars, p_codes[None], method=lambda m, c: m.vqpe.vq.decode(c)
    )  # (B, T/8, vq_dim)
    zq = jnp.repeat(zq, 8, axis=1)
    mel_hat = g.apply(
        g_vars, tc_expand, zq, method=lambda m, a, b: m.decode_latents(a, b)
    )  # (B, Tf, 80)

    # 6. vocode on-TPU (HiFi-GAN or Vocos, by config type)
    wav = vocode(hifi_params, hifi_cfg, mel_hat.astype(jnp.float32), dtype)
    return wav.astype(jnp.float32), mel_hat, n_frames


class Megatts:
    """End-to-end inference driver holding converted/loaded variables.

    Mirrors the reference API: ``Megatts(...)(wavs_dir, text)`` writes
    ``test.wav`` with prompt audio + generated speech concatenated.
    """

    def __init__(
        self,
        g_vars: dict,
        plm_params: dict,
        adm_params: dict,
        hifi_params: dict,
        symbol_table: str,
        g_cfg: MegaGConfig = MegaGConfig(),
        plm_cfg: MegaPLMConfig = MegaPLMConfig(),
        adm_cfg: MegaADMConfig = MegaADMConfig(),
        hifi_cfg: HiFiGANConfig = HiFiGANConfig(),
        pinyin_dict_path: Optional[str] = None,
        max_frames: int = 2048,
        dtype: Any = jnp.bfloat16,
        cast_params: bool = True,
        quant_int8: bool = False,
        plm_temperature: float = 0.0,  # >0: sample prosody codes (top_k)
        plm_top_k: int = 0,
        seed: int = 0,
    ):
        if quant_int8:
            # int8 weight-only PLM decode (1.6x the PLM scan: weight-HBM
            # traffic halves; deliberate serving deviation — the reference
            # decodes full precision).  ADM stays bf16 (int8 measured
            # slower at its size).  Quantize from the original fp32 params.
            from ..quantization.weight_only import quantize_tree

            plm_params = quantize_tree(plm_params)
        if cast_params and dtype == jnp.bfloat16:
            # the AR decodes are weight-HBM-bound: storing params in bf16
            # halves per-step weight traffic (compute runs bf16 regardless)
            cast = lambda t: jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if hasattr(x, "dtype") and x.dtype == jnp.float32
                else x,
                t,
            )
            if not quant_int8:
                # a quantized PLM tree keeps fp32 scales/biases (tiny; the
                # int8 kernels already carry the traffic win)
                plm_params = cast(plm_params)
            adm_params = cast(adm_params)
            if isinstance(hifi_cfg, VocosConfig) and "head" in hifi_params:
                # the Vocos iSTFT head computes in fp32 (phase is
                # precision-sensitive); keep its stored params fp32 too
                head = hifi_params["head"]
                hifi_params = {**cast(hifi_params), "head": head}
            else:
                hifi_params = cast(hifi_params)
            g_vars = {"params": cast(g_vars["params"]), "vq_stats": g_vars["vq_stats"]}
        # Commit all variable trees to the device once.  Checkpoint-loaded
        # trees arrive as numpy; leaving them host-side makes every
        # synthesize() call re-transfer the full ~775 MB through the axon
        # tunnel (tens of seconds per call) AND leak the plugin's staging
        # buffers (measured: OOM after ~134 calls on a 125 GB host).  Random
        # -init jax trees pass through unchanged.
        g_vars, plm_params, adm_params, hifi_params = jax.device_put(
            (g_vars, plm_params, adm_params, hifi_params)
        )
        self.g_vars = g_vars
        self.plm_params = plm_params
        self.adm_params = adm_params
        self.hifi_params = hifi_params
        self.g_cfg, self.plm_cfg, self.adm_cfg, self.hifi_cfg = (
            g_cfg, plm_cfg, adm_cfg, hifi_cfg,
        )
        self.tt = TextTokenizer(pinyin_dict_path)
        st = SymbolTable.from_file(symbol_table)
        self.token2idx = {s: i for i, s in enumerate(st.symbols)}
        self.max_frames = max_frames
        self.dtype = dtype
        self.quant_int8 = quant_int8
        self.plm_temperature = float(plm_temperature)
        self.plm_top_k = int(plm_top_k)
        self._rng = jax.random.PRNGKey(seed)

    def phone_ids(self, text: str) -> np.ndarray:
        """G2P → symbol ids.  Separator tokens ('_'/'-') that are not in the
        symbol table (i.e. the corpus was aligned without them) are skipped;
        any other unknown phone raises KeyError, as the reference would."""
        phones = self.tt.tokenize_lty(self.tt.tokenize(text))
        ids = [
            self.token2idx[p]
            for p in phones
            if not (p in ("_", "-") and p not in self.token2idx)
        ]
        return np.array(ids, dtype=np.int32)

    def synthesize_batch(
        self,
        texts: list,
        mels_prompt: np.ndarray,  # (B, Tm, 80) — per-utterance prompt mels
        mesh=None,
        max_frames: Optional[int] = None,
        prompt_features: Optional[tuple] = None,  # (prompt_tc (B,P,D), prompt_codes (B,P))
    ) -> list:
        """Production batched synthesis: pads phone sequences to a bucket,
        runs the full jitted cascade once for the whole batch — optionally
        sharded over a Mesh's 'data' axis (utterances across chips, per-chip
        KV caches; the v5e-8 serving layout) — and returns per-utterance
        trimmed waveforms.  ``max_frames`` overrides the instance default so
        callers can length-bucket the static frame budget (serve.py groups
        mixed-length traffic into a small set of buckets — the AR scans and
        the vocoder then cost proportional to the bucket, not the global
        worst case).  ``prompt_features`` optionally supplies an in-context
        prosody prompt for the PLM — stage-2-style features (tc_latent at
        code rate, VQPE codes) of same-speaker utterances, shared across
        the batch (see plm_infer)."""
        from ..data.sampler import round_up

        ids = [self.phone_ids(t) for t in texts]
        B = len(ids)
        Tp = round_up(max(len(i) for i in ids), 16)
        phone = np.zeros((B, Tp), np.int32)
        for b, seq in enumerate(ids):
            phone[b, : len(seq)] = seq
        lens = np.asarray([len(i) for i in ids], np.int32)

        args = [jnp.asarray(phone), jnp.asarray(lens), jnp.asarray(mels_prompt)]
        if mesh is not None:
            from ..parallel import shard_batch

            sharded = shard_batch(
                {"phone": args[0], "lens": args[1], "mels": args[2]}, mesh
            )
            args = [sharded["phone"], sharded["lens"], sharded["mels"]]

        prompt_kw = {}
        if prompt_features is not None:
            ptc, pcodes = np.asarray(prompt_features[0]), np.asarray(prompt_features[1])
            if ptc.shape[0] == 1 and B > 1:  # one shared prompt for the batch
                ptc = np.broadcast_to(ptc, (B,) + ptc.shape[1:])
                pcodes = np.broadcast_to(pcodes, (B,) + pcodes.shape[1:])
            prompt_kw = dict(
                plm_prompt_tc=jnp.asarray(ptc), plm_prompt_codes=jnp.asarray(pcodes)
            )
        rng = None
        if self.plm_temperature > 0:
            self._rng, rng = jax.random.split(self._rng)
        wav, _, n_frames = synthesize(
            self.g_vars, self.plm_params, self.adm_params, self.hifi_params,
            self.g_cfg, self.plm_cfg, self.adm_cfg, self.hifi_cfg,
            *args, max_frames=max_frames or self.max_frames, dtype=self.dtype,
            quant=self.quant_int8, plm_temperature=self.plm_temperature,
            plm_top_k=self.plm_top_k, rng=rng, **prompt_kw,
        )
        wav = np.asarray(wav)
        n = np.asarray(n_frames)
        return [wav[b, : int(n[b]) * HIFIGAN_HOP_LENGTH] for b in range(B)]

    def stream(
        self,
        wavs_dir: str,
        text: str,
        chunk_frames: int = 256,
        max_frames: Optional[int] = None,
    ):
        """Streaming synthesis: yields waveform chunks (np.float32,
        ``chunk_frames``×hop samples) as soon as the prosody codes they
        depend on are decoded — time-to-first-audio instead of
        whole-utterance latency.  Concatenated chunks equal the one-shot
        ``synthesize`` output (RF-exact windows, models/streaming.py) at
        fp32 and int8, where the one-shot fast decode is op-identical to
        the flax scan this path uses (tests/test_fast_decode.py).  At
        unquantized bf16 the fast re-schedule's dot order can round a
        near-tie logit differently, so a prosody code may occasionally
        flip vs one-shot (same caveat as fast_decode's ADM note)."""
        from .streaming import stream_synthesize

        wavs = sorted(glob.glob(os.path.join(wavs_dir, "*.wav")))
        mels = [
            np.asarray(mel_spectrogram(jnp.asarray(peak_normalize(load_wav(w, HIFIGAN_SR)))))
            for w in wavs
        ]
        mel_prompt = np.concatenate(mels, axis=0)[None]
        ids = self.phone_ids(text)[None]
        rng = None
        if self.plm_temperature > 0:
            self._rng, rng = jax.random.split(self._rng)
        yield from stream_synthesize(
            self.g_vars, self.plm_params, self.adm_params, self.hifi_params,
            self.g_cfg, self.plm_cfg, self.adm_cfg, self.hifi_cfg,
            ids, np.array([ids.shape[1]], np.int32), mel_prompt,
            max_frames=max_frames or self.max_frames, chunk_frames=chunk_frames,
            dtype=self.dtype, quant=self.quant_int8,
            temperature=self.plm_temperature, top_k=self.plm_top_k, rng=rng,
        )

    def __call__(
        self,
        wavs_dir: str,
        text: str,
        out_path: str = "test.wav",
        prompt_features: Optional[tuple] = None,  # (tc (1,P,D), codes (1,P))
    ) -> np.ndarray:
        """``prompt_features`` optionally supplies the in-context prosody
        prompt (stage-2 features of same-speaker utterances — see
        ``data.datasets.prompt_features``) that the PLM was trained with
        (reference modules/datamodule.py:186-211) but which the reference's
        own infer path never exploits."""
        wavs = sorted(glob.glob(os.path.join(wavs_dir, "*.wav")))
        mels = []
        prompt_wav = None
        for w in wavs:
            y = peak_normalize(load_wav(w, HIFIGAN_SR))
            if prompt_wav is None:
                prompt_wav = y
            mels.append(np.asarray(mel_spectrogram(jnp.asarray(y))))
        mel_prompt = np.concatenate(mels, axis=0)[None]  # (1, Tm, 80)

        ids = self.phone_ids(text)[None]  # (1, Tp)
        lens = np.array([ids.shape[1]], np.int32)

        prompt_kw = {}
        if prompt_features is not None:
            ptc, pcodes = prompt_features
            prompt_kw = dict(
                plm_prompt_tc=jnp.asarray(ptc), plm_prompt_codes=jnp.asarray(pcodes)
            )
        rng = None
        if self.plm_temperature > 0:
            self._rng, rng = jax.random.split(self._rng)
        wav, _, n_frames = synthesize(
            self.g_vars, self.plm_params, self.adm_params, self.hifi_params,
            self.g_cfg, self.plm_cfg, self.adm_cfg, self.hifi_cfg,
            jnp.asarray(ids), jnp.asarray(lens), jnp.asarray(mel_prompt),
            max_frames=self.max_frames, dtype=self.dtype, quant=self.quant_int8,
            plm_temperature=self.plm_temperature, plm_top_k=self.plm_top_k,
            rng=rng, **prompt_kw,
        )
        n = int(n_frames[0]) * HIFIGAN_HOP_LENGTH
        gen = np.asarray(wav[0])[:n]
        full = np.concatenate([prompt_wav, gen]) if prompt_wav is not None else gen
        save_wav(out_path, full, HIFIGAN_SR)
        return full
