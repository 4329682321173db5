"""HiFi-GAN V1 generator (vocoder) in flax, channels-last.

The reference never trains a vocoder; it loads the pretrained speechbrain
``tts-hifigan-libritts-16kHz`` generator and decodes on CPU
(``models/megatts2.py:321-323,370-372``).  This module implements the same
topology (upsample rates 8/8/2/2, kernels 16/16/4/4, initial 512 channels,
MRF resblocks k=3/7/11 × dilations 1/3/5) natively in JAX so vocoding runs
on-TPU inside the jitted synthesis graph; a torch-checkpoint converter in
``training/convert.py`` maps pretrained weights (weight-norm folded, conv
kernels transposed/flipped).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import HiFiGANConfig


def _polyphase_plan(k: int, s: int):
    """Static decomposition of ConvTranspose1d(k, s, p=(k-s)//2) into one
    dense conv: output phase r (position s*q+r) reads input window
    [q+lo, q+hi] through taps kernel[j0(r)::s].  Returns (lo, hi, placements)
    where placements = [(r, u, j, shift)] maps kernel tap j into row
    ``shift`` of the combined (hi-lo+1, in, s*out) kernel."""
    p = (k - s) // 2
    rows = []
    for r in range(s):
        j0 = (k - 1 - p - r) % s
        taps = list(range(j0, k, s))
        off0 = (r - (k - 1 - p) + j0) // s
        rows.append((r, taps, off0))
    lo = min(o for _, _, o in rows)
    hi = max(o + len(t) - 1 for _, t, o in rows)
    placements = [
        (r, o - lo + u, j)
        for r, taps, o in rows
        for u, j in enumerate(taps)
    ]
    return lo, hi, placements


class TransposedConv1d(nn.Module):
    """Exact torch ``ConvTranspose1d(k, s, padding=(k-s)//2)`` equivalent:
    output length = T*s.  Kernel stored (k, in, out); torch weights convert
    via transpose(2,0,1) + kernel flip.

    ``polyphase=True`` lowers it as a dense conv — one ``(width, in, s*out)``
    kernel + phase interleave — instead of ``lhs_dilation`` (input-dilated
    conv).  Numerics are identical (test_models.py asserts vs the
    lhs_dilation path).  Measured on v5e (tools/perf_probe.py): XLA already
    lowers the lhs_dilation form well and the polyphase interleave-reshape
    breaks fusion with the surrounding resblocks (111 ms vs 191 ms for the
    full generator at B=8×512 frames), so the default stays False."""

    features: int
    kernel_size: int
    stride: int
    dtype: Any = jnp.float32
    polyphase: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k, s = self.kernel_size, self.stride
        p = (k - s) // 2
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, in_ch, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        if not self.polyphase:
            out = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                kernel.astype(self.dtype),
                window_strides=(1,),
                padding=[(k - 1 - p, k - 1 - p)],
                lhs_dilation=(s,),
                dimension_numbers=("NHC", "HIO", "NHC"),
            )
            return out + bias.astype(self.dtype)

        lo, hi, placements = _polyphase_plan(k, s)
        width = hi - lo + 1
        big = jnp.zeros((width, in_ch, s, self.features), kernel.dtype)
        for r, shift, j in placements:
            big = big.at[shift, :, r, :].set(kernel[j])
        big = big.reshape(width, in_ch, s * self.features)
        B, T, _ = x.shape
        z = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            big.astype(self.dtype),
            window_strides=(1,),
            padding=[(-lo, hi)],
            dimension_numbers=("NHC", "HIO", "NHC"),
        )  # (B, T, s*out); z[q, r*out:...] = y[s*q+r]
        out = z.reshape(B, T, s, self.features).reshape(B, T * s, self.features)
        return out + bias.astype(self.dtype)


def _blocked_conv_kernel(w: jnp.ndarray, d: int, b: int):
    """Exact space-to-depth transform of a dilated 'same' conv kernel:
    w (k, cin, cout) with dilation d acting on (T, cin) ≡ a dense kernel
    (width, b*cin, b*cout) acting on the blocked layout (T/b, b*cin).
    Returns (Wb, lo, hi) with conv padding (-lo, hi)."""
    k, ci, co = w.shape
    p1 = (k - 1) * d // 2
    entries = [
        (r, j, (r - p1 + d * j) // b, (r - p1 + d * j) % b)
        for r in range(b)
        for j in range(k)
    ]
    lo = min(e[2] for e in entries)
    hi = max(e[2] for e in entries)
    Wb = jnp.zeros((hi - lo + 1, b, ci, b, co), w.dtype)
    for r, j, s, c in entries:
        Wb = Wb.at[s - lo, c, :, r, :].set(w[j])
    return Wb.reshape(hi - lo + 1, b * ci, b * co), lo, hi


class _ConvParams(nn.Module):
    """Parameter holder with nn.Conv's exact param tree (kernel, bias) so
    blocked resblocks stay checkpoint-compatible with ResBlock1."""

    k: int
    cin: int
    cout: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (self.k, self.cin, self.cout),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.cout,), jnp.float32)
        return kernel, bias


class ResBlock1Blocked(nn.Module):
    """ResBlock1 computed in a space-to-depth layout: (B, T, ch) reshaped
    (free, row-major) to (B, T/block, block*ch); each dilated conv becomes a
    dense conv with K=width*block*ch, N=block*ch — MXU-shaped where raw
    ch (e.g. 32) would waste 3/4 of the lanes.  Numerics identical to
    ResBlock1 (same taps/weights; tests assert ≤1e-5), params identical
    (``convs1_{i}``/``convs2_{i}`` kernel+bias).  Measured on v5e: 2.3×
    faster at ch=32 (tools/probe_hifigan_breakdown.py)."""

    channels: int
    kernel_size: int
    dilations: tuple
    lrelu_slope: float = 0.1
    dtype: Any = jnp.float32
    block: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k, b, ch = self.kernel_size, self.block, self.channels
        B, T, _ = x.shape
        pad = (-T) % b
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        xb = x.reshape(B, (T + pad) // b, b * ch).astype(self.dtype)

        # pad positions must STAY zero between convs (the dense form
        # zero-pads each conv independently; bias would otherwise leak into
        # the tail and corrupt edge outputs through the residual chain)
        mask = None
        if pad:
            mask = (jnp.arange(T + pad) < T).astype(self.dtype)
            mask = jnp.broadcast_to(mask[None, :, None], (1, T + pad, ch)).reshape(
                1, (T + pad) // b, b * ch
            )

        def bconv(name, y, d):
            kernel, bias = _ConvParams(k, ch, ch, name=name)()
            Wb, lo, hi = _blocked_conv_kernel(kernel.astype(self.dtype), d, b)
            z = jax.lax.conv_general_dilated(
                y, Wb, window_strides=(1,), padding=[(-lo, hi)],
                dimension_numbers=("NHC", "HIO", "NHC"),
            )
            z = z + jnp.tile(bias.astype(self.dtype), b)
            return z * mask if mask is not None else z

        for i, d in enumerate(self.dilations):
            y = nn.leaky_relu(xb, self.lrelu_slope)
            y = bconv(f"convs1_{i}", y, d)
            y = nn.leaky_relu(y, self.lrelu_slope)
            y = bconv(f"convs2_{i}", y, 1)
            xb = xb + y
        out = xb.reshape(B, T + pad, ch)
        return out[:, :T] if pad else out


class ResBlock1(nn.Module):
    """MRF residual block: per dilation, LReLU→dilated conv→LReLU→conv."""

    channels: int
    kernel_size: int
    dilations: tuple
    lrelu_slope: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        for i, d in enumerate(self.dilations):
            p1 = (k - 1) * d // 2
            p2 = (k - 1) // 2
            y = nn.leaky_relu(x, self.lrelu_slope)
            y = nn.Conv(
                self.channels, (k,), kernel_dilation=(d,), padding=[(p1, p1)],
                dtype=self.dtype, name=f"convs1_{i}",
            )(y)
            y = nn.leaky_relu(y, self.lrelu_slope)
            y = nn.Conv(
                self.channels, (k,), padding=[(p2, p2)], dtype=self.dtype, name=f"convs2_{i}"
            )(y)
            x = x + y
        return x


class HiFiGAN(nn.Module):
    cfg: HiFiGANConfig = HiFiGANConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        """mel (B, T, 80) log-mel → waveform (B, T*256)."""
        c = self.cfg
        x = nn.Conv(
            c.upsample_initial_channel, (7,), padding=[(3, 3)], dtype=self.dtype,
            name="conv_pre",
        )(mel.astype(self.dtype))
        n_k = len(c.resblock_kernel_sizes)
        for i, (r, k) in enumerate(zip(c.upsample_rates, c.upsample_kernel_sizes)):
            ch = c.upsample_initial_channel // (2 ** (i + 1))
            x = nn.leaky_relu(x, c.lrelu_slope)
            x = TransposedConv1d(ch, k, r, dtype=self.dtype, name=f"ups_{i}")(x)
            acc = None
            blocked = ch <= c.space_to_depth_ch
            for j, (rk, rd) in enumerate(
                zip(c.resblock_kernel_sizes, c.resblock_dilation_sizes)
            ):
                if blocked:
                    y = ResBlock1Blocked(
                        ch, rk, tuple(rd), c.lrelu_slope, dtype=self.dtype,
                        block=max(2, 128 // ch), name=f"resblocks_{i * n_k + j}",
                    )(x)
                else:
                    y = ResBlock1(
                        ch, rk, tuple(rd), c.lrelu_slope, dtype=self.dtype,
                        name=f"resblocks_{i * n_k + j}",
                    )(x)
                acc = y if acc is None else acc + y
            x = acc / n_k
        x = nn.leaky_relu(x, c.lrelu_slope)
        x = nn.Conv(1, (7,), padding=[(3, 3)], dtype=self.dtype, name="conv_post")(x)
        return jnp.tanh(x)[..., 0]
