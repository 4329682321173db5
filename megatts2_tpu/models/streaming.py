"""Streaming zero-shot synthesis: incremental PLM decode + chunked
mel-decode/vocode with receptive-field-exact overlap windows.

No reference counterpart (the reference synthesizes the whole utterance in
one pass, ``models/megatts2.py:326-375``); this is the TPU-serving answer
to time-to-first-audio: the content path (MRTE → ADM → length-regulate)
runs once, then prosody codes stream out of the KV-cached PLM in fixed
chunks and each audio chunk is emitted as soon as the codes it depends on
exist.

Exactness: the MegaG mel decoder and HiFi-GAN are finite-receptive-field
convolutions.  An audio chunk covering frames ``[a, a+F)`` is computed
from a window padded by the decoder RF (``rd``) plus the vocoder RF
(``rv``) on each side and trimmed — bit-equal to the full-utterance pass
in the interior, and equal at the sequence edges because windows are
clamped to the true boundary (same zero-padding the full pass sees).  All
window arithmetic is 8-frame aligned so prosody-code windows slice
cleanly (tests/test_streaming.py asserts streamed == full).

Everything jitted here takes params as ARGUMENTS (axon remote-compile
constraint) with static window geometry, so the whole stream reuses three
compiled graphs (prep / plm chunk / emit) regardless of utterance count.
"""
from __future__ import annotations

import functools
from typing import Any, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import HIFIGAN_HOP_LENGTH
from ..config import HiFiGANConfig, MegaADMConfig, MegaGConfig, MegaPLMConfig, VocosConfig
from ..ops import regulate_length
from .adm import adm_infer
from .megag import MegaG
from .megatts import max_pool_time, vocode
from .plm import MegaPLM


def _roundup(x: int, m: int) -> int:
    return -(-x // m) * m


def decoder_rf_frames(g_cfg: MegaGConfig) -> int:
    """One-sided receptive field of the MegaG mel decoder (ConvNet: first
    conv + n_stack×n_block ConvBlocks + last conv, same kernel, no
    dilation) in mel frames."""
    n_convs = g_cfg.decoder_n_stack * g_cfg.decoder_n_block + 2
    return (g_cfg.kernel_size - 1) // 2 * n_convs


def vocoder_rf_frames(cfg) -> int:
    """One-sided receptive field of the vocoder in mel frames, by config
    type.  For Vocos: embed k=7 (3) + num_layers dwconvs k=7 (3 each) for
    the backbone, plus ``n_fft/hop - 1`` frames of iSTFT window overlap —
    interior samples of a chunked iSTFT then see exactly the frames (and
    the steady window envelope) the full pass sees."""
    if isinstance(cfg, VocosConfig):
        return 3 + 3 * cfg.num_layers + (cfg.n_fft // cfg.hop_length - 1)
    return hifigan_rf_frames(cfg)


def hifigan_rf_frames(cfg: HiFiGANConfig) -> int:
    """One-sided receptive field of the HiFi-GAN generator in mel frames
    (conservative backward walk from the output through conv_post, each
    MRF bank, and each transposed conv)."""
    # MRF banks run in parallel and are summed → RF is the max over banks;
    # each ResBlock1 chains (dilated, dilation-1) conv pairs
    mrf = max(
        (k - 1) // 2 * (sum(ds) + len(ds))
        for k, ds in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)
    )
    r = 3  # conv_post k=7
    for rate, kern in zip(cfg.upsample_rates[::-1], cfg.upsample_kernel_sizes[::-1]):
        r += mrf
        r = -(-(r + kern) // rate)  # through the transposed conv
    r += 3  # conv_pre k=7
    return r


@functools.partial(
    jax.jit, static_argnames=("g_cfg", "adm_cfg", "max_frames", "dtype")
)
def stream_prep(
    g_vars: dict,
    adm_params: dict,
    g_cfg: MegaGConfig,
    adm_cfg: MegaADMConfig,
    phone: jnp.ndarray,  # (1, Tp)
    lens: jnp.ndarray,  # (1,)
    mels_prompt: jnp.ndarray,  # (1, Tm, 80)
    max_frames: int,
    dtype: Any,
):
    """Content path, one pass: MRTE latent → AR durations → length-regulate
    → ×8 pool.  Returns (tc_expand (1,Tf,H), tc_plm (1,Tf/8,H), n_frames)."""
    g = MegaG(g_cfg, dtype=dtype)
    tc_latent = g.apply(
        g_vars, phone, mels_prompt, lens,
        method=lambda m, p, mel, pl: m.mrte.tc_latent(p, mel, pl),
    )
    dt = adm_infer(adm_params, adm_cfg, tc_latent.astype(jnp.float32), dtype=dtype)
    pos = jnp.arange(dt.shape[1])[None, :]
    dt = jnp.where(pos < lens[:, None], dt, 0)
    n_frames = jnp.minimum(dt.sum(axis=1), max_frames)
    tc_expand = regulate_length(tc_latent, dt, max_frames)
    tc_plm = max_pool_time(tc_expand, 8)
    return tc_expand, tc_plm, n_frames


@functools.partial(
    jax.jit,
    static_argnames=("plm_cfg", "max_decode_len", "dtype", "quant", "temperature", "top_k"),
)
def plm_stream_start(
    plm_params: dict,
    plm_cfg: MegaPLMConfig,
    tc_plm: jnp.ndarray,  # (1, Tc, D)
    max_decode_len: int,
    dtype: Any,
    quant: bool,
    temperature: float = 0.0,
    top_k: int = 0,
    rng: Optional[jnp.ndarray] = None,
):
    """Step 0: initialize the KV cache, emit the first code."""
    model = MegaPLM(
        plm_cfg, dtype=dtype, decode=True, max_decode_len=max_decode_len, quant=quant
    )
    bos = jnp.full((tc_plm.shape[0],), plm_cfg.bos_id, jnp.int32)
    logits0, cache = model.apply(
        {"params": plm_params},
        tc_plm[:, 0:1],
        bos,
        jnp.asarray(0, jnp.int32),
        method=MegaPLM.decode_step,
        mutable=["cache"],
    )
    code0 = _pick(logits0, jnp.asarray(0, jnp.int32), plm_cfg, temperature, top_k, rng)
    return cache, code0


def _pick(logits, t, cfg, temperature, top_k, rng):
    if temperature > 0:
        lg = logits / temperature
        if top_k and top_k < cfg.vq_bins:
            kth = jax.lax.top_k(lg, top_k)[0][..., -1:]
            lg = jnp.where(lg < kth, jnp.float32(-1e9), lg)
        return jax.random.categorical(jax.random.fold_in(rng, t), lg).astype(jnp.int32)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "plm_cfg", "n_steps", "max_decode_len", "dtype", "quant", "temperature", "top_k",
    ),
)
def plm_stream_chunk(
    plm_params: dict,
    plm_cfg: MegaPLMConfig,
    cache: dict,
    prev: jnp.ndarray,  # (1,) last emitted code
    tc_plm: jnp.ndarray,  # (1, Tc, D) full conditioning
    t0: jnp.ndarray,  # scalar: first code position of this chunk
    n_steps: int,
    max_decode_len: int,
    dtype: Any,
    quant: bool,
    temperature: float = 0.0,
    top_k: int = 0,
    rng: Optional[jnp.ndarray] = None,
):
    """Decode ``n_steps`` codes from position ``t0``.  Steps past the true
    sequence end clamp their tc slice (and overwrite the final cache slot)
    — harmless: they only ever happen on the last chunk and their codes
    are discarded by the host."""
    model = MegaPLM(
        plm_cfg, dtype=dtype, decode=True, max_decode_len=max_decode_len, quant=quant
    )

    def step(carry, t):
        cache, prev = carry
        tc_t = jax.lax.dynamic_slice_in_dim(tc_plm, t, 1, axis=1)
        logits, cache = model.apply(
            {"params": plm_params, **cache},
            tc_t,
            prev,
            t,
            method=MegaPLM.decode_step,
            mutable=["cache"],
        )
        code = _pick(logits, t, plm_cfg, temperature, top_k, rng)
        return (cache, code), code

    (cache, prev), codes = jax.lax.scan(
        step, (cache, prev), t0 + jnp.arange(n_steps, dtype=jnp.int32), unroll=4
    )
    return cache, prev, jnp.transpose(codes, (1, 0))  # (1, n_steps)


@functools.partial(
    jax.jit,
    static_argnames=("g_cfg", "hifi_cfg", "F", "rv", "rd", "dtype"),
)
def emit_chunk(
    g_vars: dict,
    hifi_params: dict,
    g_cfg: MegaGConfig,
    hifi_cfg: HiFiGANConfig,
    tc_expand: jnp.ndarray,  # (1, Tmax, H)
    codes: jnp.ndarray,  # (1, Tmax//8) int32 (positions ≥ needed are junk)
    a: jnp.ndarray,  # scalar frame start, multiple of F
    F: int,  # chunk frames (multiple of 8)
    rv: int,  # vocoder RF pad, frames (multiple of 8)
    rd: int,  # decoder RF pad, frames (multiple of 8)
    dtype: Any,
):
    """Audio for frames [a, a+F): decode mel over an RF-padded window,
    vocode a vocoder-RF-padded sub-window, trim.  Bit-equal to the full
    pass (see module docstring)."""
    Tmax = tc_expand.shape[1]
    W = F + 2 * (rv + rd)
    assert Tmax >= W, (Tmax, W)
    s = jnp.clip(a - rv - rd, 0, Tmax - W)  # 8-aligned by construction
    tc_win = jax.lax.dynamic_slice_in_dim(tc_expand, s, W, axis=1)
    codes_win = jax.lax.dynamic_slice_in_dim(codes, s // 8, W // 8, axis=1)

    g = MegaG(g_cfg, dtype=dtype)
    zq = g.apply(g_vars, codes_win[None], method=lambda m, c: m.vqpe.vq.decode(c))
    zq = jnp.repeat(zq, 8, axis=1)
    mel_win = g.apply(
        g_vars, tc_win, zq, method=lambda m, x, z: m.decode_latents(x, z)
    )  # (1, W, 80)

    mv = jnp.clip(a - rv, s, s + W - (F + 2 * rv))
    mel_v = jax.lax.dynamic_slice_in_dim(mel_win, mv - s, F + 2 * rv, axis=1)
    wav = vocode(hifi_params, hifi_cfg, mel_v.astype(jnp.float32), dtype)
    # (1, (F+2rv)*hop)
    off = (a - mv) * HIFIGAN_HOP_LENGTH
    return jax.lax.dynamic_slice_in_dim(
        wav, off, F * HIFIGAN_HOP_LENGTH, axis=1
    ).astype(jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "g_cfg", "plm_cfg", "adm_cfg", "hifi_cfg", "Tmax", "F", "rv", "rd",
        "dtype", "quant", "temperature", "top_k",
    ),
)
def _stream_first(
    g_vars, plm_params, adm_params, hifi_params,
    g_cfg, plm_cfg, adm_cfg, hifi_cfg,
    phone, lens, mels_prompt,
    Tmax: int, F: int, rv: int, rd: int,
    dtype, quant: bool, temperature: float = 0.0, top_k: int = 0, rng=None,
):
    """First-chunk graph: content prep + PLM steps for chunk 0's window +
    emit — ONE dispatch to first audio (the per-call tunnel round trip on
    this target is ~75 ms, so every stage boundary crossed on the host
    would land straight on TTFA)."""
    Tc = Tmax // 8
    n0 = min(Tc, (F + rv + rd) // 8)  # codes chunk 0 needs
    tc_expand, tc_plm, n_frames = stream_prep.__wrapped__(
        g_vars, adm_params, g_cfg, adm_cfg, phone, lens, mels_prompt, Tmax, dtype
    )
    cache, prev = plm_stream_start.__wrapped__(
        plm_params, plm_cfg, tc_plm, Tc, dtype, quant, temperature, top_k, rng
    )
    codes = jnp.zeros((1, Tc), jnp.int32).at[:, 0].set(prev)
    cache, prev, new = plm_stream_chunk.__wrapped__(
        plm_params, plm_cfg, cache, prev, tc_plm, jnp.asarray(1, jnp.int32),
        n0 - 1, Tc, dtype, quant, temperature, top_k, rng,
    ) if n0 > 1 else (cache, prev, jnp.zeros((1, 0), jnp.int32))
    codes = jax.lax.dynamic_update_slice(codes, new, (0, 1))
    wav = emit_chunk.__wrapped__(
        g_vars, hifi_params, g_cfg, hifi_cfg, tc_expand, codes,
        jnp.asarray(0, jnp.int32), F, rv, rd, dtype,
    )
    carry = dict(tc_expand=tc_expand, tc_plm=tc_plm, cache=cache, prev=prev,
                 codes=codes, n_codes=jnp.asarray(n0, jnp.int32))
    return carry, wav, n_frames


@functools.partial(
    jax.jit,
    static_argnames=(
        "g_cfg", "plm_cfg", "hifi_cfg", "F", "rv", "rd", "dtype", "quant",
        "temperature", "top_k", "n_steps",
    ),
)
def _stream_next(
    g_vars, plm_params, hifi_params,
    g_cfg, plm_cfg, hifi_cfg,
    carry: dict, a,  # frame start of this chunk (scalar)
    F: int, rv: int, rd: int, n_steps: int,
    dtype, quant: bool, temperature: float = 0.0, top_k: int = 0, rng=None,
):
    """Steady-state chunk graph: advance the PLM ``n_steps`` codes, emit
    frames [a, a+F) — one dispatch per audio chunk.  ``n_steps == 0``
    (all codes decoded, only lag frames left to emit) skips the PLM."""
    Tc = carry["codes"].shape[1]
    if n_steps > 0:
        cache, prev, new = plm_stream_chunk.__wrapped__(
            plm_params, plm_cfg, carry["cache"], carry["prev"], carry["tc_plm"],
            carry["n_codes"], n_steps, Tc, dtype, quant, temperature, top_k, rng,
        )
        codes = jax.lax.dynamic_update_slice(
            carry["codes"], new, (0, carry["n_codes"])
        )
        carry = dict(carry, cache=cache, prev=prev, codes=codes,
                     n_codes=carry["n_codes"] + n_steps)
    wav = emit_chunk.__wrapped__(
        g_vars, hifi_params, g_cfg, hifi_cfg, carry["tc_expand"], carry["codes"],
        a, F, rv, rd, dtype,
    )
    return carry, wav


def stream_synthesize(
    g_vars: dict,
    plm_params: dict,
    adm_params: dict,
    hifi_params: dict,
    g_cfg: MegaGConfig,
    plm_cfg: MegaPLMConfig,
    adm_cfg: MegaADMConfig,
    hifi_cfg: HiFiGANConfig,
    phone: np.ndarray,  # (1, Tp) int32
    lens: np.ndarray,  # (1,)
    mels_prompt: np.ndarray,  # (1, Tm, 80)
    max_frames: int,
    chunk_frames: int = 256,
    dtype: Any = jnp.bfloat16,
    quant: bool = False,
    temperature: float = 0.0,
    top_k: int = 0,
    rng: Optional[jnp.ndarray] = None,
) -> Iterator[np.ndarray]:
    """Generator of waveform chunks (np.float32, ``chunk_frames*hop``
    samples each except a possibly-trimmed last one); concatenated chunks
    equal ``synthesize(...)`` trimmed to ``n_frames`` (greedy decode).

    Dispatch discipline: chunk j is one jitted call; its successor is
    dispatched (async) BEFORE chunk j's samples are pulled to the host, so
    device compute overlaps the host-side transfer."""
    F = _roundup(chunk_frames, 8)
    rv = _roundup(vocoder_rf_frames(hifi_cfg), 8)
    rd = _roundup(decoder_rf_frames(g_cfg), 8)
    Tmax = max(_roundup(max_frames, F), F + 2 * (rv + rd))
    Tc = Tmax // 8
    Cc = F // 8

    carry, wav, n_frames = _stream_first(
        g_vars, plm_params, adm_params, hifi_params,
        g_cfg, plm_cfg, adm_cfg, hifi_cfg,
        jnp.asarray(phone), jnp.asarray(lens), jnp.asarray(mels_prompt),
        Tmax, F, rv, rd, dtype, quant, temperature, top_k, rng,
    )
    total = int(np.asarray(n_frames)[0])
    if total <= 0:
        return
    n_chunks = -(-total // F)
    n0 = min(Tc, (F + rv + rd) // 8)

    pending = [(0, wav)]
    n_codes = n0
    for j in range(1, n_chunks):
        # codes chunk j needs beyond what's already decoded (≤ Cc; 0 near
        # the sequence end when only lag frames remain to emit)
        n_steps = min(Cc, Tc - n_codes)
        carry, wav = _stream_next(
            g_vars, plm_params, hifi_params, g_cfg, plm_cfg, hifi_cfg,
            carry, jnp.asarray(j * F, jnp.int32), F, rv, rd, n_steps,
            dtype, quant, temperature, top_k, rng,
        )
        n_codes = min(Tc, n_codes + n_steps)
        pending.append((j, wav))
        jj, w = pending.pop(0)  # transfer chunk j-1 while j computes
        yield _trim(np.asarray(w)[0], jj, F, total)
    for jj, w in pending:
        yield _trim(np.asarray(w)[0], jj, F, total)


def _trim(wav: np.ndarray, j: int, F: int, total: int) -> np.ndarray:
    if (j + 1) * F > total:
        return wav[: (total - j * F) * HIFIGAN_HOP_LENGTH]
    return wav
