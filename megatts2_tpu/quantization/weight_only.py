"""Int8 weight-only quantization for the AR decode path (serving).

The KV-cached PLM/ADM decodes are weight-HBM-bound: every token step
streams every Dense kernel once (BENCHMARKS.md — PLM decode sits at its
~24 ms weight-traffic floor at bf16).  Storing kernels as int8 with a
per-output-channel fp32 scale halves that traffic; the int8→bf16 convert
happens per layer inside the layer ``nn.scan`` (stacked params are sliced
per iteration, so XLA cannot hoist the dequantized copy out of the token
scan — measured 2.07× on v5e at decode shapes, see BENCHMARKS.md
"Int8 weight-only decode").

This is a deliberate TPU-serving extension with no reference counterpart
(the reference decodes full-precision, ``models/megatts2.py:165-181``);
it is OFF by default everywhere and enabled with ``quant_int8`` at the
``Megatts`` / ``serve.py`` surface.

Only ``nn.Dense`` kernels are quantized (the decode stacks are
Dense-only); embeddings, LayerNorms, and positional tables stay in the
compute dtype.  Accuracy: per-channel symmetric int8 on a (K,N) kernel
gives |Δw| ≤ max|w_col|/254 — logits typically match to ~1e-2 relative
(tested in tests/test_quant.py).
"""
from __future__ import annotations

from typing import Any, Mapping

import flax.linen as nn
import jax
import jax.numpy as jnp


class QDense(nn.Module):
    """Drop-in for ``nn.Dense`` reading int8 ``kernel_q`` + fp32 ``scale``
    (per output channel) produced by :func:`quantize_tree`.

    The matmul runs in the compute dtype with an fp32 accumulator; the
    per-channel scale and bias apply in fp32 after the dot, so no scale
    precision is lost to bf16.
    """

    features: int
    use_bias: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_dim = x.shape[-1]
        kq = self.param(
            "kernel_q", nn.initializers.zeros, (in_dim, self.features), jnp.int8
        )
        scale = self.param(
            "scale", nn.initializers.ones, (self.features,), jnp.float32
        )
        acc = jax.lax.dot_general(
            x.astype(self.dtype),
            kq.astype(self.dtype),
            (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y = acc * scale
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            y = y + bias
        return y.astype(self.dtype)


def quantize_kernel(w: jnp.ndarray, bits: int = 8):
    """(…, K, N) fp kernel → (int kernel_q, fp32 per-N scale).

    The contraction axis is -2 (flax Dense layout), so this handles both
    plain (K, N) kernels and layer-stacked (L, K, N) kernels from
    ``nn.scan`` — scales come out (N,) / (L, N) and slice correctly under
    ``variable_axes={"params": 0}``.

    ``bits=4`` halves decode weight traffic again vs int8: two 4-bit rows
    pack into one ``uint8`` as (row k) low nibble | (row k + K/2) high
    nibble — i.e. the packed array is (…, K/2, N) and unpacks into the
    first/second HALF of the contraction axis.  That split lets the
    consumer run ``x[:, :K/2] @ lo + x[:, K/2:] @ hi`` — two contiguous
    half-K dots, no interleave relayout anywhere (see
    ``models/fast_decode._dense``).  The per-output-channel fp32 scale
    still applies AFTER the fp32-accumulated dot, so the matmul epilogue
    is identical for both widths.  (Storage is uint8, not jnp.int4: S4
    jit arguments crash this jax build with a device_put RecursionError.)
    """
    w = jnp.asarray(w, jnp.float32)
    if bits == 8:
        s = jnp.max(jnp.abs(w), axis=-2, keepdims=True) / 127.0
        s = jnp.maximum(s, 1e-12)
        return jnp.round(w / s).astype(jnp.int8), jnp.squeeze(s, axis=-2)
    if bits != 4:
        raise ValueError(f"bits must be 4 or 8, got {bits}")
    K = w.shape[-2]
    if K % 2:
        raise ValueError(f"int4 packing needs an even contraction dim, got {K}")
    s = jnp.max(jnp.abs(w), axis=-2, keepdims=True) / 7.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(w / s), -7, 7).astype(jnp.int32)
    lo = jnp.take(q, jnp.arange(K // 2), axis=-2)
    hi = jnp.take(q, jnp.arange(K // 2, K), axis=-2)
    packed = ((lo & 0xF) | ((hi & 0xF) << 4)).astype(jnp.uint8)
    return packed, jnp.squeeze(s, axis=-2)


def unpack_int4(packed: jnp.ndarray, dtype=jnp.bfloat16):
    """(…, K/2, N) uint8 → (lo, hi) halves of the (…, K, N) kernel in
    ``dtype`` (sign via the xor-sub trick; no interleave reshapes)."""
    p = packed.astype(jnp.int32)
    lo = ((p & 0xF) ^ 8) - 8
    hi = ((p >> 4) ^ 8) - 8
    return lo.astype(dtype), hi.astype(dtype)


def quantize_tree(params, bits: int = 8) -> dict:
    """Map a Dense-only params tree to the :class:`QDense` layout.

    Every dict holding a ``kernel`` leaf (ndim ≥ 2) becomes
    ``{kernel_q, scale[, bias]}``; everything else passes through
    unchanged.  Intended for the PLM/ADM decode param trees (which contain
    only Dense kernels); do NOT feed Conv-bearing trees (a (k, in, out)
    Conv kernel would silently get a wrong per-``out`` scale axis).
    """

    def rec(node):
        if isinstance(node, Mapping):
            kernel = node.get("kernel")
            if kernel is not None and getattr(kernel, "ndim", 0) >= 2:
                # odd contraction dims (e.g. the ADM's (1, D) dt_linear_emb)
                # can't nibble-pack — those leaves stay int8; consumers
                # dispatch per-leaf on dtype (uint8 = packed int4)
                leaf_bits = bits if kernel.shape[-2] % 2 == 0 else 8
                q, s = quantize_kernel(kernel, leaf_bits)
                out = {"kernel_q": q, "scale": s}
                for k, v in node.items():
                    if k == "kernel":
                        continue
                    if k == "bias":
                        out["bias"] = jnp.asarray(v, jnp.float32)
                    else:
                        out[k] = rec(v)
                return out
            return {k: rec(v) for k, v in node.items()}
        return node

    return rec(params)


def is_int4_tree(params) -> bool:
    """True if any quantized leaf is nibble-packed int4 (uint8 storage).

    int4 trees are consumable ONLY by the fast-decode matmuls
    (models/fast_decode.py dispatches per-leaf on dtype); the flax
    :class:`QDense` layer declares an (K, N) int8 ``kernel_q`` param, so
    every QDense consumer (``plm_infer(fast=False)``, prompt prefill,
    ``continuous.prefill_slots``) must reject int4 up front instead of
    dying in a flax shape error."""

    def rec(node):
        if isinstance(node, Mapping):
            kq = node.get("kernel_q")
            if kq is not None and kq.dtype == jnp.uint8:
                return True
            return any(rec(v) for v in node.values())
        return False

    return rec(params)


def dequantize_tree(params) -> dict:
    """Inverse of :func:`quantize_tree` (fp32 kernels; testing/debug)."""

    def rec(node):
        if isinstance(node, Mapping):
            if "kernel_q" in node:
                kq = node["kernel_q"]
                if kq.dtype == jnp.uint8:  # packed int4 (see quantize_kernel)
                    lo, hi = unpack_int4(kq, jnp.float32)
                    kq = jnp.concatenate([lo, hi], axis=-2)
                out = {
                    "kernel": kq.astype(jnp.float32)
                    * node["scale"][..., None, :]
                }
                for k, v in node.items():
                    if k in ("kernel_q", "scale"):
                        continue
                    out[k] = rec(v) if isinstance(v, Mapping) else v
                return out
            return {k: rec(v) for k, v in node.items()}
        return node

    return rec(params)
