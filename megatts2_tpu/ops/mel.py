"""Mel-spectrogram extraction (TPU-native).

Numerically mirrors the reference front-end (``modules/tokenizer.py:107-125``:
speechbrain ``mel_spectogram`` → torchaudio ``MelSpectrogram`` with power=1,
normalized=False, norm='slaney', mel_scale='slaney', hann window, center=True
reflect padding, followed by dynamic-range compression ``log(clamp(x, 1e-5))``).
The energy min-max normalization flag of the reference only affects the energy
return value it discards, so it is irrelevant to the mel output.

Two implementations:

* :func:`mel_spectrogram` — pure jnp (frame + rfft + matmul), the golden path.
* :func:`mel_spectrogram_fused` — a fused Pallas TPU kernel that performs
  window, DFT-as-matmul (MXU), magnitude, mel projection and log compression
  in one VMEM-resident pass over frame blocks.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from .. import (
    HIFIGAN_HOP_LENGTH,
    HIFIGAN_MAX_FREQ,
    HIFIGAN_MEL_CHANNELS,
    HIFIGAN_NFFT,
    HIFIGAN_SR,
    HIFIGAN_WIN_LENGTH,
)

LOG_CLIP = 1e-5


def _hz_to_mel_slaney(f: np.ndarray) -> np.ndarray:
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = math.log(6.4) / 27.0
    mel = f / f_sp
    with np.errstate(divide="ignore"):
        log_mel = min_log_mel + np.log(np.maximum(f, 1e-30) / min_log_hz) / logstep
    return np.where(f >= min_log_hz, log_mel, mel)


def _mel_to_hz_slaney(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = math.log(6.4) / 27.0
    hz = m * f_sp
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), hz)


def mel_filterbank(
    sr: int = HIFIGAN_SR,
    n_fft: int = HIFIGAN_NFFT,
    n_mels: int = HIFIGAN_MEL_CHANNELS,
    fmin: float = 0.0,
    fmax: float = HIFIGAN_MAX_FREQ,
) -> np.ndarray:
    """Slaney-scale, slaney-normalized triangular filterbank, (n_freqs, n_mels).

    Matches torchaudio ``melscale_fbanks(norm='slaney', mel_scale='slaney')``
    (and librosa ``filters.mel(htk=False, norm='slaney')`` transposed).
    """
    n_freqs = n_fft // 2 + 1
    all_freqs = np.linspace(0, sr / 2, n_freqs)
    m_min = _hz_to_mel_slaney(fmin)
    m_max = _hz_to_mel_slaney(fmax)
    m_pts = np.linspace(m_min, m_max, n_mels + 2)
    f_pts = _mel_to_hz_slaney(m_pts)  # (n_mels + 2,)
    f_diff = np.diff(f_pts)  # (n_mels + 1,)
    slopes = f_pts[None, :] - all_freqs[:, None]  # (n_freqs, n_mels + 2)
    down = -slopes[:, :-2] / f_diff[None, :-1]
    up = slopes[:, 2:] / f_diff[None, 1:]
    fb = np.maximum(0.0, np.minimum(down, up))  # (n_freqs, n_mels)
    enorm = 2.0 / (f_pts[2 : n_mels + 2] - f_pts[:n_mels])
    fb = fb * enorm[None, :]
    return fb.astype(np.float32)


def _hann_window(win_length: int) -> np.ndarray:
    # torch.hann_window(periodic=True)
    n = np.arange(win_length, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * math.pi * n / win_length)).astype(np.float32)


def num_frames(n_samples: int, hop: int = HIFIGAN_HOP_LENGTH) -> int:
    """center=True frame count: 1 + n_samples // hop."""
    return 1 + n_samples // hop


def frame_signal(
    signal: jnp.ndarray,  # (..., n_samples)
    n_fft: int = HIFIGAN_NFFT,
    hop: int = HIFIGAN_HOP_LENGTH,
) -> jnp.ndarray:
    """Reflect-pad (center=True) and frame: (..., n_frames, n_fft)."""
    pad = n_fft // 2
    sig = jnp.pad(signal, [(0, 0)] * (signal.ndim - 1) + [(pad, pad)], mode="reflect")
    n_fr = num_frames(signal.shape[-1], hop)
    starts = jnp.arange(n_fr) * hop
    idx = starts[:, None] + jnp.arange(n_fft)[None, :]
    return jnp.take(sig, idx, axis=-1)


@functools.partial(jax.jit, static_argnames=("n_fft", "hop", "win_length", "n_mels"))
def mel_spectrogram(
    signal: jnp.ndarray,  # (n_samples,) or (B, n_samples), float32 in [-1, 1]
    n_fft: int = HIFIGAN_NFFT,
    hop: int = HIFIGAN_HOP_LENGTH,
    win_length: int = HIFIGAN_WIN_LENGTH,
    n_mels: int = HIFIGAN_MEL_CHANNELS,
) -> jnp.ndarray:
    """Log-mel spectrogram, (..., n_frames, n_mels).  Pure-jnp golden path."""
    window = jnp.asarray(_hann_window(win_length))
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))
    frames = frame_signal(signal, n_fft, hop) * window
    spec = jnp.abs(jnp.fft.rfft(frames.astype(jnp.float32), axis=-1))
    fb = jnp.asarray(mel_filterbank(n_fft=n_fft, n_mels=n_mels))
    mel = spec @ fb
    return jnp.log(jnp.clip(mel, min=LOG_CLIP))


# ---------------------------------------------------------------------------
# Fused Pallas kernel: window ∘ DFT(matmul) ∘ |.| ∘ mel ∘ log in one pass.
# ---------------------------------------------------------------------------


def _dft_matrices(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Real/imag DFT matrices (n_fft, n_freqs) so rfft(x) = x@C - i x@S."""
    n_freqs = n_fft // 2 + 1
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_freqs)[None, :]
    ang = 2.0 * math.pi * n * k / n_fft
    return np.cos(ang).astype(np.float32), -np.sin(ang).astype(np.float32)


def _mel_kernel(frames_ref, win_ref, cos_ref, sin_ref, fb_ref, out_ref):
    import jax

    hi = jax.lax.Precision.HIGHEST  # full-f32 MXU passes: match XLA FFT
    x = frames_ref[0] * win_ref[:]  # (BLK, n_fft) windowing on VPU
    re = jnp.dot(x, cos_ref[:], precision=hi, preferred_element_type=jnp.float32)
    im = jnp.dot(x, sin_ref[:], precision=hi, preferred_element_type=jnp.float32)
    mag = jnp.sqrt(re * re + im * im)
    mel = jnp.dot(mag, fb_ref[:], precision=hi, preferred_element_type=jnp.float32)
    out_ref[0] = jnp.log(jnp.clip(mel, min=LOG_CLIP))


@functools.partial(jax.jit, static_argnames=("n_fft", "hop", "win_length", "n_mels", "block"))
def mel_spectrogram_fused(
    signal: jnp.ndarray,  # (n_samples,) or (B, n_samples)
    n_fft: int = HIFIGAN_NFFT,
    hop: int = HIFIGAN_HOP_LENGTH,
    win_length: int = HIFIGAN_WIN_LENGTH,
    n_mels: int = HIFIGAN_MEL_CHANNELS,
    block: int = 128,
) -> jnp.ndarray:
    """Fused Pallas TPU mel kernel.  Same output as :func:`mel_spectrogram`."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    squeeze = signal.ndim == 1
    if squeeze:
        signal = signal[None]
    B = signal.shape[0]
    frames = frame_signal(signal, n_fft, hop)  # (B, T, n_fft)
    T = frames.shape[1]
    Tp = ((T + block - 1) // block) * block
    frames = jnp.pad(frames, ((0, 0), (0, Tp - T), (0, 0)))
    frames = frames.reshape(B * Tp // block, block, n_fft)

    window = _hann_window(win_length)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = np.pad(window, (lpad, n_fft - win_length - lpad))
    cos_m, sin_m = _dft_matrices(n_fft)
    n_freqs = n_fft // 2 + 1
    fb = mel_filterbank(n_fft=n_fft, n_mels=n_mels)

    out = pl.pallas_call(
        _mel_kernel,
        grid=(frames.shape[0],),
        in_specs=[
            pl.BlockSpec((1, block, n_fft), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_fft), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, n_freqs), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, n_freqs), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_freqs, n_mels), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block, n_mels), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((frames.shape[0], block, n_mels), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * frames.shape[0] * block * n_fft * n_freqs * 2,
            bytes_accessed=frames.size * 4,
            transcendentals=frames.shape[0] * block * (n_freqs + n_mels),
        ),
    )(
        frames,
        jnp.asarray(window)[None],
        jnp.asarray(cos_m),
        jnp.asarray(sin_m),
        jnp.asarray(fb),
    )
    out = out.reshape(B, Tp, n_mels)[:, :T]
    return out[0] if squeeze else out
