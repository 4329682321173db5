"""Vocos-style iSTFT vocoder — the framework's fast vocoder family.

The reference's only vocoder is a pretrained time-domain HiFi-GAN decoded
on CPU (``models/megatts2.py:321-323,370-372``); this module is a
deliberate beyond-parity addition.  Rationale (BENCHMARKS.md vocoder
roofline): HiFi-GAN spends most of its time in small-channel resblocks at
waveform rate (ch 32 @ 131k samples) where the 128-lane MXU is mostly
idle.  Vocos (arXiv:2306.00814) keeps ALL compute at mel frame rate —
a ConvNeXt backbone at d=512 (perfectly MXU-shaped) predicts STFT
magnitude+phase, and the waveform is reconstructed with an irfft +
overlap-add (``ops/istft.py``).  ~23x fewer FLOPs than HiFi-GAN V1 for
the same output length.

Drop-in contract: ``(B, T, 80)`` log-mel → ``(B, T*256)`` waveform, same
as :class:`..models.hifigan.HiFiGAN` (the head appends one repeated
coefficient frame so the iSTFT's ``(T'-1)*hop`` length lands on
``T*hop``).  Weights are NOT checkpoint-compatible with anything
pretrained — train with ``training/vocoder_trainer.py``.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..config import VocosConfig
from ..ops.istft import istft


class ConvNeXtBlock(nn.Module):
    """1-D ConvNeXt block: depthwise k=7 → LN → pw GELU MLP → layerscale
    residual.  Channels-last throughout; the two pointwise Linears carry
    ~99% of the FLOPs and are plain (T, dim)x(dim, inter) matmuls."""

    dim: int
    intermediate_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Conv(
            self.dim, (7,), padding=[(3, 3)], feature_group_count=self.dim,
            dtype=self.dtype, name="dwconv",
        )(x)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(h)
        h = nn.Dense(self.intermediate_dim, dtype=self.dtype, name="pwconv1")(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(h)
        gamma = self.param(
            "gamma", nn.initializers.constant(1e-6), (self.dim,), jnp.float32
        )
        return x + gamma.astype(self.dtype) * h


class Vocos(nn.Module):
    """mel (B, T, 80) → waveform (B, T*hop)."""

    cfg: VocosConfig = VocosConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        x = nn.Conv(
            c.dim, (7,), padding=[(3, 3)], dtype=self.dtype, name="embed"
        )(mel.astype(self.dtype))
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm_pre")(x)
        for i in range(c.num_layers):
            x = ConvNeXtBlock(
                c.dim, c.intermediate_dim, dtype=self.dtype, name=f"block_{i}"
            )(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm_post")(x)

        # iSTFT head — fp32: phase wraps badly in bf16, and the irfft is
        # a tiny fraction of total FLOPs anyway.
        n_freq = c.n_fft // 2 + 1
        h = nn.Dense(2 * n_freq, dtype=jnp.float32, name="head")(
            x.astype(jnp.float32)
        )
        logmag, phase = h[..., :n_freq], h[..., n_freq:]
        mag = jnp.clip(jnp.exp(logmag), max=c.mag_clip)
        re = mag * jnp.cos(phase)
        im = mag * jnp.sin(phase)
        # (T-1)*hop from T frames → repeat the last frame so output length
        # equals T*hop, matching HiFiGAN's contract exactly.
        re = jnp.concatenate([re, re[..., -1:, :]], axis=-2)
        im = jnp.concatenate([im, im[..., -1:, :]], axis=-2)
        return istft(re, im, n_fft=c.n_fft, hop=c.hop_length, win_length=c.n_fft)
