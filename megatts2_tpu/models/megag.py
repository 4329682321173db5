"""MegaG — the VQ-GAN mel autoencoder (generator).

Parity target: reference ``models/megatts2.py:30-117``.  Forward composes
VQPE prosody latents with MRTE length-regulated content latents and decodes
to an 80-bin mel via a ConvNet; returns ``(mel_hat, commit_loss, vq_loss)``.
``s2_latent`` returns ``(tc_latent, codes)`` for the stage-2 latent
extraction (with the phone-mask arity fixed, see ``models/mrte.py``).
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from ..config import MegaGConfig
from ..nn import ConvNet
from .mrte import MRTE
from .vqpe import VQProsodyEncoder


class MegaG(nn.Module):
    cfg: MegaGConfig = MegaGConfig()
    dtype: Any = jnp.float32

    def setup(self):
        c = self.cfg
        self.mrte = MRTE(c.mrte, dtype=self.dtype, scan_stacks=c.scan_stacks)
        self.vqpe = VQProsodyEncoder(c.vqpe, dtype=self.dtype, scan_stacks=c.scan_stacks)
        self.decoder = ConvNet(
            in_channels=c.mrte.hidden_size + c.vqpe.vq_dim,
            out_channels=c.mrte.mel_bins,
            hidden_size=c.hidden_size,
            n_stacks=c.decoder_n_stack,
            n_blocks=c.decoder_n_block,
            kernel_size=c.kernel_size,
            activation=c.activation,
            dtype=self.dtype,
            scan_stacks=c.scan_stacks,
        )

    def __call__(
        self,
        duration_tokens: jnp.ndarray,  # (B, Tp)
        phone: jnp.ndarray,  # (B, Tp)
        phone_lens: jnp.ndarray,  # (B,)
        mel_mrte: jnp.ndarray,  # (B, Tm_prompt, mel_bins)
        mel_vqpe: jnp.ndarray,  # (B, Tm, mel_bins)
        train: bool = False,
    ):
        zq, commit_loss, vq_loss, _ = self.vqpe(mel_vqpe, train=train)
        x = self.mrte(
            duration_tokens, phone, phone_lens, mel_mrte,
            max_out_len=mel_vqpe.shape[1], deterministic=not train,
        )
        x = jnp.concatenate([x, zq], axis=-1)
        mel_hat = self.decoder(x, deterministic=not train)
        return mel_hat, commit_loss, vq_loss

    def s2_latent(
        self,
        phone: jnp.ndarray,
        phone_lens: Optional[jnp.ndarray],
        mel_mrte: jnp.ndarray,
        mel_vqpe: jnp.ndarray,
    ):
        _, _, _, codes = self.vqpe(mel_vqpe, train=False)
        tc = self.mrte.tc_latent(phone, mel_mrte, phone_lens)
        return tc, codes

    def decode_latents(self, tc_latent_expand: jnp.ndarray, zq: jnp.ndarray) -> jnp.ndarray:
        """Inference helper: concat frame-rate latents and run the decoder
        (reference ``models/megatts2.py:365-368``)."""
        x = jnp.concatenate(
            [tc_latent_expand, zq[:, : tc_latent_expand.shape[1], :]], axis=-1
        )
        return self.decoder(x, deterministic=True)
