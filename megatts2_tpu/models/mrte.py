"""MRTE — multi-reference timbre encoder.

Parity target: reference ``modules/mrte.py:63-183``.  Phone tokens are
embedded + sine-position-encoded, run through an 8-layer conv-FF transformer;
the (multi-utterance) mel prompt is encoded by a ConvNetDouble whose shared
middle layer is a stride-16 conv; a single-head cross-attention with phone
queries and mel keys/values, then LayerNorm + ReLU, yields the
timbre/content latent ``tc_latent``; the forward path length-regulates it to
frame rate.

Fixes the reference's arity bug (``tc_latent`` declared with 2 args but
called with 3 on the training path, ``mrte.py:154-158`` vs ``:180``): here
``phone_lens`` is an optional argument that masks phone padding in the
self-attention stack, exactly what the masked transformer already supported.

The length regulator is the vectorized cumsum/searchsorted gather of
``ops.length_regulator`` — no host numpy round-trip (reference
``mrte.py:53-55``).
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from ..config import MRTEConfig
from ..nn import (
    ConvNetDouble,
    MultiHeadAttention,
    SinePositionalEmbedding,
    TokenEmbedding,
    TransformerEncoder,
)
from ..ops import regulate_length


class MRTE(nn.Module):
    cfg: MRTEConfig = MRTEConfig()
    dtype: Any = jnp.float32
    scan_stacks: bool = False  # scan conv residual stacks (compile-time opt)

    def setup(self):
        c = self.cfg
        assert (c.mel_frames / c.sample_rate * 1000 / c.duration_token_ms) == 1
        self.phone_embedding = TokenEmbedding(
            dim_model=c.hidden_size, vocab_size=c.phone_vocab_size, dropout=c.dropout,
            dtype=self.dtype,
        )
        self.phone_pos_embedding = SinePositionalEmbedding(
            dim_model=c.hidden_size, dropout=c.dropout, dtype=self.dtype
        )
        self.mel_encoder = ConvNetDouble(
            in_channels=c.mel_bins,
            out_channels=c.hidden_size,
            hidden_size=c.hidden_size,
            n_layers=c.mel_n_layer,
            n_stacks=c.mel_n_stack,
            n_blocks=c.mel_n_block,
            kernel_size=c.mel_kernel_size,
            activation=c.mel_activation,
            middle_kind="conv",
            middle_stride=c.mel_stride,
            dtype=self.dtype,
            scan_stacks=self.scan_stacks,
        )
        self.phone_encoder = TransformerEncoder(
            dim=c.hidden_size,
            ff_dim=c.content_ff_dim,
            num_layers=c.content_n_layers,
            conv_ff=True,
            n_heads=c.content_n_heads,
            dropout=c.dropout,
            dtype=self.dtype,
            use_flash=c.use_flash,
        )
        self.mha = MultiHeadAttention(
            qkv_dim=c.hidden_size, n_heads=1, dropout=c.dropout, dtype=self.dtype
        )
        self.norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)

    def tc_latent(
        self,
        phone: jnp.ndarray,  # (B, Tp) int
        mel: jnp.ndarray,  # (B, Tm, mel_bins)
        phone_lens: Optional[jnp.ndarray] = None,  # (B,)
        deterministic: bool = True,
    ) -> jnp.ndarray:
        phone_emb = self.phone_embedding(phone, deterministic=deterministic)
        phone_pos = self.phone_pos_embedding(phone_emb, deterministic=deterministic)
        mel_context = self.mel_encoder(
            mel.astype(self.dtype), deterministic=deterministic
        )  # (B, ceil(Tm/16), H)
        phone_x = self.phone_encoder(
            phone_pos, x_lens=phone_lens, deterministic=deterministic
        )
        tc = self.mha(phone_x, kv=mel_context, deterministic=deterministic)
        tc = self.norm(tc)
        return nn.relu(tc)

    def __call__(
        self,
        duration_tokens: jnp.ndarray,  # (B, Tp) int frames per phone
        phone: jnp.ndarray,  # (B, Tp)
        phone_lens: jnp.ndarray,  # (B,)
        mel: jnp.ndarray,  # (B, Tm, mel_bins)
        max_out_len: int,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        tc = self.tc_latent(phone, mel, phone_lens, deterministic=deterministic)
        return regulate_length(tc, duration_tokens, max_out_len)
