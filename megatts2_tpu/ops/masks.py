"""Length / attention mask utilities.

Behavioral parity with the reference's ``utils/utils.py:12-39``
(make_pad_mask / make_attn_mask), but mask construction is boolean and
additive-float conversion happens once, in fp32, with finite large-negative
fill (``-1e9``) instead of ``-inf`` so that bf16 softmax stays NaN-free on
fully-masked rows.
"""
from __future__ import annotations

import jax.numpy as jnp

NEG_INF = -1e9


def make_pad_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """True where padded.  lengths: (B,) int; returns (B, max_len) bool."""
    pos = jnp.arange(max_len, dtype=lengths.dtype)[None, :]
    return pos >= lengths[:, None]


def make_attn_mask(
    lengths: jnp.ndarray,
    max_len: int,
    causal: bool = False,
) -> jnp.ndarray:
    """Additive attention mask, (B, 1, T, T) fp32; 0 keep / NEG_INF drop.

    Mirrors reference ``make_attn_mask`` (padding mask on keys, optionally
    OR'd with an upper-triangular causal mask).  Head axis is broadcast.
    """
    pad = make_pad_mask(lengths, max_len)  # (B, T) True=pad
    mask = pad[:, None, None, :]  # (B, 1, 1, T) — masks keys
    if causal:
        tri = jnp.triu(jnp.ones((max_len, max_len), dtype=bool), k=1)
        mask = jnp.logical_or(mask, tri[None, None, :, :])
    else:
        mask = jnp.broadcast_to(mask, (pad.shape[0], 1, max_len, max_len))
    return jnp.where(mask, jnp.float32(NEG_INF), jnp.float32(0.0))


def causal_mask(max_len: int) -> jnp.ndarray:
    """(1, 1, T, T) additive causal mask."""
    tri = jnp.triu(jnp.ones((max_len, max_len), dtype=bool), k=1)
    return jnp.where(tri, jnp.float32(NEG_INF), jnp.float32(0.0))[None, None]
