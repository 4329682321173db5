"""Fused attention kernel (Pallas, TPU).

Row-block memory-efficient attention: for each (batch, head, q-block) grid
cell the full K/V panel sits in VMEM, the (BLOCK_Q, Tk) logits never touch
HBM, and padding/causal masks are computed IN-KERNEL from per-batch key
lengths (scalar-prefetched) instead of materializing (B, H, Tq, Tk) mask
tensors.  At this model's sequence lengths (≤ 4k) K/V panels are ≤ ~1 MB,
so a single K loop beats a streaming flash decomposition while keeping the
same O(T) memory property.

Replaces the reference's torch ``F.scaled_dot_product_attention``
(modules/transformer.py:52-53) on the prefill/training path; the AR decode
path keeps its KV-cache scan (one-token attention is matmul-free-ish and
latency-bound).

``flash_attention_vjp`` wraps the kernel in a ``jax.custom_vjp`` whose
backward recomputes the probabilities BLOCKWISE over q (a ``lax.scan``):
per step only a (B, H, BLOCK_Q, Tk) fp32 panel lives, dk/dv accumulate
across steps — O(BLOCK_Q·Tk) memory instead of the O(Tq·Tk) a naive
recompute (or XLA's default attention backward) materializes.
``nn/transformer.py`` uses it when ``use_flash=True``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def flash_attention(
    q: jnp.ndarray,  # (B, Tq, H, Dh)
    k: jnp.ndarray,  # (B, Tk, H, Dh)
    v: jnp.ndarray,  # (B, Tk, H, Dh)
    k_lens: jnp.ndarray | None = None,  # (B,) valid key lengths
    causal: bool = False,
    block_q: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused masked attention; output (B, Tq, H, Dh) in q.dtype."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, Tq, H, Dh = q.shape
    Tk = k.shape[1]
    scale = Dh**-0.5

    Tq_p = _round_up(Tq, block_q)
    if Tq_p != Tq:
        q = jnp.pad(q, ((0, 0), (0, Tq_p - Tq), (0, 0), (0, 0)))
    # (B, H, T, Dh) layout for clean blocking
    qh = jnp.transpose(q, (0, 2, 1, 3))
    kh = jnp.transpose(k, (0, 2, 1, 3))
    vh = jnp.transpose(v, (0, 2, 1, 3))
    if k_lens is None:
        k_lens = jnp.full((B,), Tk, jnp.int32)
    k_lens = k_lens.astype(jnp.int32)

    n_q = Tq_p // block_q

    def kernel(klen_ref, q_ref, k_ref, v_ref, o_ref):
        b = pl.program_id(0)
        iq = pl.program_id(2)
        qb = q_ref[0, 0].astype(jnp.float32)  # (BQ, Dh)
        kb = k_ref[0, 0].astype(jnp.float32)  # (Tk, Dh)
        vb = v_ref[0, 0].astype(jnp.float32)  # (Tk, Dh)
        logits = jax.lax.dot_general(
            qb, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (BQ, Tk)
        kpos = jax.lax.broadcasted_iota(jnp.int32, (block_q, Tk), 1)
        mask = kpos < klen_ref[b]
        if causal:
            qpos = iq * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, Tk), 0
            )
            mask = jnp.logical_and(mask, kpos <= qpos)
        logits = jnp.where(mask, logits, jnp.float32(-1e9))
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        out = jnp.dot(p, vb, preferred_element_type=jnp.float32) / denom
        o_ref[0, 0] = out.astype(o_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, H, n_q),
        in_specs=[
            pl.BlockSpec(
                (1, 1, block_q, Dh), lambda b, h, i, *_: (b, h, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, Tk, Dh), lambda b, h, i, *_: (b, h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, Tk, Dh), lambda b, h, i, *_: (b, h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, Dh), lambda b, h, i, *_: (b, h, i, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, Tq_p, Dh), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Tq_p * Tk * Dh,
            bytes_accessed=(qh.size + kh.size + vh.size) * 4,
            transcendentals=B * H * Tq_p * Tk,
        ),
    )(k_lens, qh, kh, vh)
    out = jnp.transpose(out, (0, 2, 1, 3))[:, :Tq]
    return out


# ---------------------------------------------------------------------------
# Differentiable wrapper: Pallas forward, blockwise-recompute backward.
# ---------------------------------------------------------------------------


def _masked_probs(q, k, k_lens, causal, q_offset=0):
    """Softmax probabilities for a q-block starting at ``q_offset``;
    fp32 (B, H, Tq_block, Tk).  bf16 operands feed the MXU directly with
    an fp32 accumulator — bit-identical to casting up first (bf16→f32 is
    exact) without materializing fp32 copies of K."""
    Dh = q.shape[-1]
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * (Dh**-0.5)
    Tq, Tk = q.shape[1], k.shape[1]
    kpos = jnp.arange(Tk)
    mask = kpos[None, :] < k_lens[:, None]  # (B, Tk)
    mask = mask[:, None, None, :]
    if causal:
        qpos = q_offset + jnp.arange(Tq)
        tri = kpos[None, :] <= qpos[:, None]  # (Tq, Tk)
        mask = jnp.logical_and(mask, tri[None, None])
    logits = jnp.where(mask, logits, jnp.float32(-1e9))
    return jax.nn.softmax(logits, axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def flash_attention_vjp(q, k, v, k_lens, causal=False):
    return flash_attention(q, k, v, k_lens=k_lens, causal=causal)


def _fa_fwd(q, k, v, k_lens, causal):
    return flash_attention(q, k, v, k_lens=k_lens, causal=causal), (q, k, v, k_lens)


def _fa_bwd(causal, res, g, block_q: int = 256):
    """Blockwise backward: scan over q-blocks, recomputing each probability
    panel in VMEM-sized chunks; dk/dv accumulate in fp32.  Padded q rows
    carry zero cotangents, so they contribute nothing.

    Layout discipline (profiled on v5e): q/g blocks are taken with
    ``dynamic_slice`` per step instead of a pre-stacked
    (n_blocks, B, bq, H, Dh) moveaxis (which forced transposed-layout
    copies of the whole tensors into and out of the scan), and K/V stay
    bf16 — the einsums accumulate fp32 via ``preferred_element_type``,
    bit-identical to casting up but without materializing 67 MB fp32
    copies."""
    q, k, v, k_lens = res
    B, Tq, H, Dh = q.shape
    scale = Dh**-0.5

    bq = min(block_q, _round_up(Tq, 128))
    Tq_p = _round_up(Tq, bq)
    if Tq_p != Tq:
        qp = jnp.pad(q, ((0, 0), (0, Tq_p - Tq), (0, 0), (0, 0)))
        gp = jnp.pad(g, ((0, 0), (0, Tq_p - Tq), (0, 0), (0, 0)))
    else:
        qp, gp = q, g
    n_blocks = Tq_p // bq

    def step(carry, i):
        dk_acc, dv_acc = carry
        qb = jax.lax.dynamic_slice_in_dim(qp, i * bq, bq, axis=1)
        gb = jax.lax.dynamic_slice_in_dim(gp, i * bq, bq, axis=1)
        p = _masked_probs(qb, k, k_lens, causal, q_offset=i * bq)
        pc = p.astype(q.dtype)
        dv_acc = dv_acc + jnp.einsum(
            "bhqk,bqhd->bkhd", pc, gb, preferred_element_type=jnp.float32
        )
        dp = jnp.einsum("bqhd,bkhd->bhqk", gb, v, preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dsc = ds.astype(q.dtype)
        dq_b = jnp.einsum(
            "bhqk,bkhd->bqhd", dsc, k, preferred_element_type=jnp.float32
        ) * scale
        dk_acc = dk_acc + jnp.einsum(
            "bhqk,bqhd->bkhd", dsc, qb, preferred_element_type=jnp.float32
        ) * scale
        return (dk_acc, dv_acc), dq_b.astype(q.dtype)

    zeros = jnp.zeros(k.shape, jnp.float32)
    (dk, dv), dq_blocks = jax.lax.scan(step, (zeros, zeros), jnp.arange(n_blocks))
    dq = jnp.moveaxis(dq_blocks, 0, 1).reshape(B, Tq_p, H, Dh)[:, :Tq]
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), None


flash_attention_vjp.defvjp(_fa_fwd, _fa_bwd)
