"""Token and sinusoidal positional embeddings.

Parity targets: reference ``modules/embedding.py:21-98`` (TokenEmbedding =
Embedding + dropout; SinePositionalEmbedding = classic sin/cos table with
``x * x_scale + alpha * pe[offset:offset+T]``, alpha fixed to 1 by default).
The table here is statically sized (``max_len``) instead of lazily extended —
static shapes are a requirement under jit.
"""
from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def sinusoidal_table(max_len: int, dim: int) -> np.ndarray:
    position = np.arange(max_len, dtype=np.float64)[:, None]
    div_term = np.exp(np.arange(0, dim, 2, dtype=np.float64) * -(math.log(10000.0) / dim))
    pe = np.zeros((max_len, dim), dtype=np.float64)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe.astype(np.float32)


class TokenEmbedding(nn.Module):
    dim_model: int
    vocab_size: int
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        emb = nn.Embed(self.vocab_size, self.dim_model, dtype=self.dtype, name="word_embeddings")(x)
        return nn.Dropout(self.dropout)(emb, deterministic=deterministic)


class SinePositionalEmbedding(nn.Module):
    dim_model: int
    dropout: float = 0.0
    scale: bool = False
    alpha: bool = False  # learnable gain on the positional table
    max_len: int = 8192
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, offset: int | jnp.ndarray = 0, deterministic: bool = True
    ) -> jnp.ndarray:
        pe = jnp.asarray(sinusoidal_table(self.max_len, self.dim_model), dtype=self.dtype)
        x_scale = math.sqrt(self.dim_model) if self.scale else 1.0
        if self.alpha:
            alpha = self.param("alpha", nn.initializers.ones, (1,), jnp.float32)
        else:
            alpha = jnp.ones((1,), dtype=jnp.float32)
        T = x.shape[-2]
        if isinstance(offset, int) and offset == 0:
            pos = pe[:T]
        elif getattr(offset, "ndim", 0) == 1:
            # per-example offsets (B,) — continuous-batching decode where
            # every batch row sits at its own position
            pos = jnp.take(pe, offset[:, None] + jnp.arange(T)[None, :], axis=0)
        else:
            pos = jnp.take(pe, offset + jnp.arange(T), axis=0)
        out = x * jnp.asarray(x_scale, dtype=x.dtype) + alpha.astype(x.dtype) * pos
        return nn.Dropout(self.dropout)(out, deterministic=deterministic)
