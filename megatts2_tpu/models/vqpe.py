"""VQPE — vector-quantized prosody encoder.

Parity target: reference ``modules/vqpe.py:13-62``: keep only the first
``mel_bins`` (low) mel bands, encode with a ConvNetDouble whose middle layer
is MaxPool1d(stride=8, ceil_mode), quantize with a 1-codebook EMA RVQ
(1024 bins, dim 256, decay 0.99), then upsample ×8 by repetition truncated to
the input length.  Returns (zq, commit_loss, vq_loss, codes);
``vq_loss = mse(stop_grad(ze), zq)``.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import VQPEConfig
from ..nn import ConvNetDouble
from ..quantization import ResidualVectorQuantizer


class VQProsodyEncoder(nn.Module):
    cfg: VQPEConfig = VQPEConfig()
    dtype: Any = jnp.float32
    scan_stacks: bool = False

    def setup(self):
        c = self.cfg
        self.convnet = ConvNetDouble(
            in_channels=c.mel_bins,
            out_channels=c.vq_dim,
            hidden_size=c.hidden_size,
            n_layers=c.n_layers,
            n_stacks=c.n_stacks,
            n_blocks=c.n_blocks,
            kernel_size=c.kernel_size,
            activation=c.activation,
            middle_kind="maxpool",
            middle_stride=c.stride,
            dtype=self.dtype,
            scan_stacks=self.scan_stacks,
        )
        self.vq = ResidualVectorQuantizer(
            dimension=c.vq_dim, n_q=1, bins=c.vq_bins, decay=0.99
        )

    def encode(self, mel: jnp.ndarray, train: bool = False):
        """mel (B, T, >=mel_bins) → (ze (B, ceil(T/8), vq_dim))."""
        mel = mel[..., : self.cfg.mel_bins].astype(self.dtype)
        return self.convnet(mel, deterministic=not train)

    def __call__(self, mel: jnp.ndarray, train: bool = False):
        mel_len = mel.shape[1]
        ze = self.encode(mel, train=train).astype(jnp.float32)
        zq, codes, commit_loss = self.vq(ze, train=train)
        vq_loss = jnp.mean((jax.lax.stop_gradient(ze) - zq) ** 2)
        zq = jnp.repeat(zq, self.cfg.stride, axis=1)[:, :mel_len, :]
        return zq.astype(self.dtype), commit_loss, vq_loss, codes
