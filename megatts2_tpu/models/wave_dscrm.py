"""Waveform discriminators for vocoder training (multi-period +
multi-scale, HiFi-GAN topology, arXiv:2010.05646).

No reference counterpart: the reference repo never trains a vocoder — it
consumes a pretrained speechbrain HiFi-GAN (``models/megatts2.py:321-323``)
and its only discriminator is the MEL-window one used by the VQ-GAN stage
(``modules/dscrm.py``).  This module closes that gap so the framework can
train its own vocoders (``training/vocoder_trainer.py``) for both the
HiFi-GAN and Vocos families.

TPU-first notes: channels-last everywhere; the period reshape is a free
row-major ``(B, T) → (B, T/p, p, 1)`` view feeding NHWC convs whose inner
dim is the period — XLA tiles the (5,1)-kernel convs onto the MXU as
batched matmuls; all shapes static (period padding is computed from the
static T).
"""
from __future__ import annotations

from typing import Any, List, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..config import WaveDiscConfig


class PeriodDiscriminator(nn.Module):
    """One period-p discriminator: (B, T) → per-sample logits + features."""

    period: int
    base_ch: int = 32
    max_ch: int = 1024
    lrelu_slope: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, wav: jnp.ndarray) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        p = self.period
        B, T = wav.shape
        pad = (-T) % p
        if pad:  # reflect-pad so the fold is exact, as HiFi-GAN does
            wav = jnp.pad(wav, ((0, 0), (0, pad)), mode="reflect")
        x = wav.reshape(B, (T + pad) // p, p, 1).astype(self.dtype)

        feats = []
        ch = self.base_ch
        for i in range(4):
            x = nn.Conv(
                min(ch, self.max_ch), (5, 1), strides=(3, 1), padding=[(2, 2), (0, 0)],
                dtype=self.dtype, name=f"convs_{i}",
            )(x)
            x = nn.leaky_relu(x, self.lrelu_slope)
            feats.append(x)
            ch *= 4
        x = nn.Conv(
            min(ch, self.max_ch), (5, 1), padding=[(2, 2), (0, 0)],
            dtype=self.dtype, name="convs_4",
        )(x)
        x = nn.leaky_relu(x, self.lrelu_slope)
        feats.append(x)
        x = nn.Conv(
            1, (3, 1), padding=[(1, 1), (0, 0)], dtype=self.dtype, name="conv_post"
        )(x)
        feats.append(x)
        return x.reshape(B, -1), feats


class ScaleDiscriminator(nn.Module):
    """One scale discriminator over the raw (or avg-pooled) waveform."""

    base_ch: int = 128
    max_ch: int = 1024
    lrelu_slope: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, wav: jnp.ndarray) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        B = wav.shape[0]
        x = wav[..., None].astype(self.dtype)  # (B, T, 1)
        c, M = self.base_ch, self.max_ch
        layers = [  # (features, kernel, stride, groups) — HiFi-GAN MSD
            (c, 15, 1, 1),
            (c, 41, 2, 4),
            (min(2 * c, M), 41, 2, 16),
            (min(4 * c, M), 41, 4, 16),
            (min(8 * c, M), 41, 4, 16),
            (min(8 * c, M), 41, 1, 16),
            (min(8 * c, M), 5, 1, 1),
        ]
        feats = []
        for i, (f, k, s, g) in enumerate(layers):
            x = nn.Conv(
                f, (k,), strides=(s,), padding=[(k // 2, k // 2)],
                feature_group_count=min(g, x.shape[-1]), dtype=self.dtype,
                name=f"convs_{i}",
            )(x)
            x = nn.leaky_relu(x, self.lrelu_slope)
            feats.append(x)
        x = nn.Conv(1, (3,), padding=[(1, 1)], dtype=self.dtype, name="conv_post")(x)
        feats.append(x)
        return x.reshape(B, -1), feats


class WaveDiscriminator(nn.Module):
    """MPD (one sub-disc per period) + MSD (3 scales: raw, x2, x4 avgpool).

    Returns (logits_list, features_list) over all sub-discriminators."""

    cfg: WaveDiscConfig = WaveDiscConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, wav: jnp.ndarray):
        c = self.cfg
        logits, feats = [], []
        for p in c.periods:
            l, f = PeriodDiscriminator(
                p, c.mpd_base_ch, c.max_ch, c.lrelu_slope, dtype=self.dtype,
                name=f"mpd_{p}",
            )(wav)
            logits.append(l)
            feats.append(f)
        x = wav
        for s in range(c.msd_scales):
            if s > 0:  # AvgPool1d(kernel=4, stride=2, pad=2)
                x = nn.avg_pool(
                    x[..., None], window_shape=(4,), strides=(2,), padding=((2, 2),)
                )[..., 0]
            l, f = ScaleDiscriminator(
                c.msd_base_ch, c.max_ch, c.lrelu_slope, dtype=self.dtype,
                name=f"msd_{s}",
            )(x)
            logits.append(l)
            feats.append(f)
        return logits, feats
