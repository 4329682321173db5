"""Inverse STFT (TPU-native overlap-add).

The reference never needs an iSTFT — its vocoder is a time-domain
HiFi-GAN (speechbrain, ``models/megatts2.py:321-323``).  This op exists
for the framework's *faster* vocoder family (``models/vocos.py``): a
mel-rate backbone predicts STFT coefficients and the waveform is
reconstructed here, replacing 256x of transposed-conv upsampling with an
irfft + 4-way shifted add.

Semantics match ``torch.istft(center=True, onesided=True,
normalized=False, window=hann(periodic))``: window/envelope
overlap-add division, then ``n_fft//2`` trimmed from both ends — output
length ``(T-1)*hop`` (golden-tested in tests/test_ops.py).

TPU-first notes: the overlap-add is NOT a scatter — with
``r = n_fft/hop`` (4 here) each output hop-chunk is the sum of r
statically-shifted frame chunks, so XLA lowers it to r pads+adds that
fuse with the irfft epilogue; everything is static-shape.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .mel import _hann_window


def _overlap_add(frames: jnp.ndarray, hop: int) -> jnp.ndarray:
    """OLA of (..., T, n_fft) windows at stride ``hop`` → (..., (T-1)*hop + n_fft).

    Requires hop | n_fft (true for the 1024/256 vocoder geometry)."""
    *lead, T, n_fft = frames.shape
    assert n_fft % hop == 0, "overlap-add requires hop | n_fft"
    r = n_fft // hop
    x = frames.reshape(*lead, T, r, hop)
    out = jnp.zeros((*lead, T + r - 1, hop), frames.dtype)
    for j in range(r):
        out = jax.lax.dynamic_update_slice_in_dim(
            out,
            jax.lax.dynamic_slice_in_dim(out, j, T, axis=-2) + x[..., :, j, :],
            j,
            axis=-2,
        )
    return out.reshape(*lead, (T + r - 1) * hop)


@functools.partial(jax.jit, static_argnames=("n_fft", "hop", "win_length"))
def istft(
    spec_real: jnp.ndarray,  # (..., T, n_fft//2 + 1)
    spec_imag: jnp.ndarray,
    n_fft: int = 1024,
    hop: int = 256,
    win_length: int = 1024,
) -> jnp.ndarray:
    """Inverse STFT → (..., (T-1)*hop) float32 waveform.

    Takes real/imag parts separately (model heads emit mag/phase, not
    complex arrays; complex dtypes also keep the whole graph real-typed
    except the single irfft)."""
    window = _hann_window(win_length)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = np.pad(window, (lpad, n_fft - win_length - lpad))
    w = jnp.asarray(window)

    spec = spec_real.astype(jnp.float32) + 1j * spec_imag.astype(jnp.float32)
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1)  # (..., T, n_fft)
    y = _overlap_add(frames * w, hop)

    T = spec_real.shape[-2]
    wsq = jnp.broadcast_to(w * w, (T, n_fft))
    env = _overlap_add(wsq, hop)  # (T-1)*hop + n_fft
    y = y / jnp.clip(env, 1e-11)

    p = n_fft // 2
    return y[..., p : y.shape[-1] - p]
