"""Transformer encoder stack (pre-LN) with self/cross attention and an
autoregressive KV-cache decode path.

Parity targets: reference ``modules/transformer.py`` —
* MultiHeadAttention: separate q/k/v Linear (bias=True), optional cross-attn
  via ``kv=``, scaled-dot-product attention, out-proj + dropout.
* TransformerEncoderLayer: pre-LN, residual attention, FF either
  Linear-ReLU-(dropout)-Linear or Conv1d(k=5)-ReLU-Conv1d(k=5) (``conv_ff``).
* TransformerEncoder: N independently-parameterized layers, mask built from
  lengths (padding ∥ causal).

TPU-first departures: masks are additive fp32 built once per forward;
attention runs as batched einsums on the MXU in the module compute dtype
(bf16-capable) with fp32 softmax; decoding uses a static-shape KV cache
(``decode=True``) advanced one token per call so the whole AR loop can live
inside ``jax.lax.scan`` — the reference recomputes the full prefix per token
(``models/megatts2.py:165-181``) and has no cache.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.masks import NEG_INF, make_attn_mask

# The flash path is a Pallas TPU kernel; on the CPU backend (tests, virtual
# meshes) it falls back to the einsum path automatically.  Tests that want
# the kernel under ``pltpu.force_tpu_interpret_mode()`` set this True.
FLASH_ON_CPU = False


def _flash_available() -> bool:
    return FLASH_ON_CPU or jax.default_backend() != "cpu"


def _attend(
    q: jnp.ndarray,  # (B, Tq, H, Dh)
    k: jnp.ndarray,  # (B, Tk, H, Dh)
    v: jnp.ndarray,  # (B, Tk, H, Dh)
    mask: Optional[jnp.ndarray],  # additive (B|1, 1|H, Tq, Tk) fp32
) -> jnp.ndarray:
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if mask is not None:
        logits = logits + mask
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


class MultiHeadAttention(nn.Module):
    qkv_dim: int
    n_heads: int = 8
    dropout: float = 0.0
    dtype: Any = jnp.float32
    decode: bool = False  # enable the KV-cache single-token path
    use_flash: bool = False  # Pallas fused attention on the self-attn path
    quant: bool = False  # int8 weight-only Dense kernels (serving decode)
    per_slot: bool = False  # per-row cache positions (continuous batching)

    @nn.compact
    def __call__(
        self,
        q: jnp.ndarray,  # (B, Tq, D)
        kv: Optional[jnp.ndarray] = None,
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        max_decode_len: int = 0,
        k_lens: Optional[jnp.ndarray] = None,  # (B,) for the flash path
        causal: bool = False,
    ) -> jnp.ndarray:
        assert self.qkv_dim % self.n_heads == 0
        head_dim = self.qkv_dim // self.n_heads
        if self.quant:
            from ..quantization.weight_only import QDense

            dense = lambda name: QDense(self.qkv_dim, use_bias=True, dtype=self.dtype, name=name)
        else:
            dense = lambda name: nn.Dense(self.qkv_dim, use_bias=True, dtype=self.dtype, name=name)
        src = q if kv is None else kv
        qh = dense("w_q")(q)
        kh = dense("w_k")(src)
        vh = dense("w_v")(src)
        B, Tq = q.shape[0], q.shape[1]
        qh = qh.reshape(B, Tq, self.n_heads, head_dim)
        kh = kh.reshape(B, src.shape[1], self.n_heads, head_dim)
        vh = vh.reshape(B, src.shape[1], self.n_heads, head_dim)

        if self.decode:
            assert kv is None, "KV-cache decode is for self-attention only"
            assert max_decode_len > 0
            # cache stores heads MERGED — (B, L, H*Dh) — so under the layer
            # nn.scan the carried (num_layers, B, L, H*Dh) stack keeps the
            # plain row-major layout: the per-layer dynamic-slice/update are
            # pure copies, and the (B, L, H, Dh) view for attention is a
            # free bitcast.  With a 4-D (B, L, H, Dh) cache XLA assigned a
            # transposed layout inside the scan body and every step paid a
            # relayout copy of the FULL cache per layer (profiled ~30% of
            # decode wall time on v5e).
            cache_k = self.variable(
                "cache", "k", jnp.zeros, (B, max_decode_len, self.n_heads * head_dim), self.dtype
            )
            cache_v = self.variable(
                "cache", "v", jnp.zeros, (B, max_decode_len, self.n_heads * head_dim), self.dtype
            )
            kh_flat = kh.reshape(B, Tq, self.n_heads * head_dim)
            vh_flat = vh.reshape(B, Tq, self.n_heads * head_dim)
            if self.per_slot:
                # continuous-batching mode: every batch row ("slot") sits at
                # its OWN position — per-row index vector, scattered writes,
                # per-row causal mask.  Single-token steps only.
                assert Tq == 1
                cache_idx = self.variable(
                    "cache", "index", lambda: jnp.zeros((B,), jnp.int32)
                )
                idx = cache_idx.value  # (B,)
                # dense masked write, NOT vmapped dynamic_update_slice: the
                # latter lowers to TPU scatter (serial, ~10x slower here);
                # the one-hot where() is a plain bandwidth-bound pass
                onehot = (
                    jnp.arange(max_decode_len)[None, :] == idx[:, None]
                )[:, :, None]
                cache_k.value = jnp.where(onehot, kh_flat, cache_k.value)
                cache_v.value = jnp.where(onehot, vh_flat, cache_v.value)
                cache_idx.value = idx + 1
                pos = jnp.arange(max_decode_len)
                dec_mask = jnp.where(
                    pos[None, None, None, :] <= idx[:, None, None, None],
                    jnp.float32(0.0),
                    jnp.float32(NEG_INF),
                )
            else:
                cache_idx = self.variable(
                    "cache", "index", lambda: jnp.zeros((), jnp.int32)
                )
                idx = cache_idx.value
                cache_k.value = jax.lax.dynamic_update_slice(cache_k.value, kh_flat, (0, idx, 0))
                cache_v.value = jax.lax.dynamic_update_slice(cache_v.value, vh_flat, (0, idx, 0))
                cache_idx.value = idx + Tq
                # block-causal: query i (absolute position idx+i) sees cache
                # positions <= idx+i — Tq=1 is the AR step, Tq>1 is a prompt
                # prefill writing the whole prefix in one call
                pos = jnp.arange(max_decode_len)
                q_pos = idx + jnp.arange(Tq)
                dec_mask = jnp.where(
                    pos[None, None, None, :] <= q_pos[None, None, :, None],
                    jnp.float32(0.0),
                    jnp.float32(NEG_INF),
                )
            att = _attend(
                qh,
                cache_k.value.reshape(B, max_decode_len, self.n_heads, head_dim),
                cache_v.value.reshape(B, max_decode_len, self.n_heads, head_dim),
                dec_mask,
            )
        elif self.use_flash and kv is None and k_lens is not None:
            from ..ops.attention_pallas import flash_attention_vjp

            att = flash_attention_vjp(qh, kh, vh, k_lens, causal)
        else:
            att = _attend(qh, kh, vh, mask)

        att = att.reshape(B, Tq, self.qkv_dim)
        out = dense("out_proj")(att)
        return nn.Dropout(self.dropout)(out, deterministic=deterministic)


class TransformerEncoderLayer(nn.Module):
    dim: int
    ff_dim: int
    conv_ff: bool = False
    n_heads: int = 8
    dropout: float = 0.0
    dtype: Any = jnp.float32
    decode: bool = False
    use_flash: bool = False
    quant: bool = False
    per_slot: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (B, T, D)
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        max_decode_len: int = 0,
        k_lens: Optional[jnp.ndarray] = None,
        causal: bool = False,
    ) -> jnp.ndarray:
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=name)
        x = x + MultiHeadAttention(
            self.dim, self.n_heads, self.dropout, dtype=self.dtype,
            decode=self.decode, use_flash=self.use_flash, quant=self.quant,
            per_slot=self.per_slot, name="attn",
        )(
            ln("norm1")(x), mask=mask, deterministic=deterministic,
            max_decode_len=max_decode_len, k_lens=k_lens, causal=causal,
        )
        if self.conv_ff:
            # norm -> residual Conv1d(k=5)-ReLU-Conv1d(k=5); note the reference
            # applies norm2 *outside* the residual here (transformer.py:96-99).
            h = ln("norm2")(x)
            y = nn.Conv(self.ff_dim, (5,), padding=[(2, 2)], dtype=self.dtype, name="ff_conv1")(h)
            y = nn.relu(y)
            y = nn.Conv(self.dim, (5,), padding=[(2, 2)], dtype=self.dtype, name="ff_conv2")(y)
            x = h + y
        else:
            if self.quant:
                from ..quantization.weight_only import QDense

                ff = lambda f, name: QDense(f, dtype=self.dtype, name=name)
            else:
                ff = lambda f, name: nn.Dense(f, dtype=self.dtype, name=name)
            h = ln("norm2")(x)
            y = ff(self.ff_dim, "ff_linear1")(h)
            y = nn.relu(y)
            y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
            y = ff(self.dim, "ff_linear2")(y)
            x = x + y
        return x


class TransformerEncoder(nn.Module):
    """N-layer pre-LN encoder.  With ``scan_layers=True`` (default) the
    layers run under ``nn.scan`` — all layers share ONE compiled body with
    parameters stacked on a leading axis.  This is the TPU-first shape:
    compile time is O(1) in depth and the stacked weights feed the MXU as
    one big tensor.  ``scan_layers=False`` keeps per-layer parameters
    (params under ``layers_{i}``) for debugging/ablation."""

    dim: int
    ff_dim: int
    num_layers: int
    conv_ff: bool = False
    n_heads: int = 8
    dropout: float = 0.0
    final_norm: bool = False
    dtype: Any = jnp.float32
    decode: bool = False
    scan_layers: bool = True
    remat: bool = False  # rematerialize layer activations (memory ↓, FLOPs ↑)
    use_flash: bool = False  # Pallas fused attention (self-attn, non-decode)
    quant: bool = False  # int8 weight-only Dense kernels (serving decode)
    per_slot: bool = False  # per-row cache positions (continuous batching)

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (B, T, D)
        x_lens: Optional[jnp.ndarray] = None,  # (B,)
        causal: bool = False,
        deterministic: bool = True,
        max_decode_len: int = 0,
    ) -> jnp.ndarray:
        mask = None
        k_lens = None
        flash = self.use_flash and not self.decode and _flash_available()
        if x_lens is not None and not self.decode:
            if flash:
                k_lens = x_lens  # masks built in-kernel
            else:
                mask = make_attn_mask(x_lens, x.shape[1], causal=causal)
        elif causal and not self.decode:
            if flash:
                k_lens = jnp.full((x.shape[0],), x.shape[1], jnp.int32)
            else:
                from ..ops.masks import causal_mask

                mask = causal_mask(x.shape[1])
        else:
            flash = False  # unmasked non-decode path keeps einsum

        layer_kw = dict(
            conv_ff=self.conv_ff,
            n_heads=self.n_heads,
            dropout=self.dropout,
            dtype=self.dtype,
            decode=self.decode,
            use_flash=flash,
            quant=self.quant,
            per_slot=self.per_slot,
        )
        if self.scan_layers:
            def body(layer: TransformerEncoderLayer, carry: jnp.ndarray):
                y = layer(
                    carry, mask=mask, deterministic=deterministic,
                    max_decode_len=max_decode_len, k_lens=k_lens, causal=causal,
                )
                return y, ()

            if self.remat and not self.decode:
                body = nn.remat(body, prevent_cse=False)
            x, _ = nn.scan(
                body,
                variable_axes={"params": 0, "cache": 0},
                split_rngs={"params": True, "dropout": True},
                length=self.num_layers,
                metadata_params={nn.meta.PARTITION_NAME: None},
            )(
                TransformerEncoderLayer(self.dim, self.ff_dim, name="layers", **layer_kw),
                x,
            )
        else:
            for i in range(self.num_layers):
                x = TransformerEncoderLayer(
                    self.dim, self.ff_dim, name=f"layers_{i}", **layer_kw
                )(
                    x, mask=mask, deterministic=deterministic,
                    max_decode_len=max_decode_len, k_lens=k_lens, causal=causal,
                )
        if self.final_norm:
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return x
