"""Fused AR decode loops for the PLM/ADM stacks (serving hot path).

Why this exists: the flax ``decode_step`` path runs the 12 layers under
``nn.scan`` with the KV cache as a scanned variable — each layer of each
token step materializes slice-out/slice-in copies of the FULL per-layer
cache (profiled on v5e: ~60% of decode wall is cache/glue traffic, not
the int8 weight streams; tools/profile_decode.py).  Here the decode is a
hand-scheduled ``lax.scan`` over tokens with the 12 layers UNROLLED and
each layer's K/V cache a separate loop carry:

* cache writes are one-token ``dynamic_update_slice`` on a loop-carried
  buffer (in-place inside the XLA while loop — no full-cache copies);
* attention reads the carried cache directly (fuses into the QK product,
  no materialized transposes or fp32 cache copies);
* weights are static per-layer slices of the SAME stacked param trees
  the flax models use (int8 ``quantize_tree`` layout or bf16);
* q/k/v projections run as ONE merged matmul per layer.

Measured on v5e (B=8, 64 steps, dispatch-corrected): PLM int8
25.4 -> 17.1 ms (1.49x), ADM bf16 9.4 -> 4.4 ms (2.15x).  Sweep notes:
``unroll=1`` is best for the PLM (XLA hoists dequantized weight copies
out of the loop at unroll >= 4 without a barrier, and an explicit
``optimization_barrier`` costs ~4 ms by blocking prefetch pipelining —
both knobs kept for re-tuning).

Numerics match ``MegaPLM.decode_step``/``MegaADM.decode_step`` op-for-op
(same flax LayerNorm, same fp32 softmax, same QDense scale placement —
asserted in tests/test_fast_decode.py): exact in fp32 and int8 (fp32
accumulates), while pure-bf16 dots can round differently than the
``nn.scan`` stacked-weight slices (verified per-layer-equal vs unrolled
flax modules; the scan itself is the source), which can flip an ADM
duration sitting exactly on a +0.5 boundary by ±1 frame — within the
model's own noise (val MSE ≈ 1.9 frames²).  Scheduling change, not a
model change.  Reference baseline being replaced: the O(T³) no-cache
loops at ``models/megatts2.py:165-181,257-275``.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import MegaADMConfig, MegaPLMConfig
from ..nn.embedding import sinusoidal_table


def _layer_norm(x, scale, bias, dtype):
    """flax LayerNorm numerics (fp32 stats, fast variance) at ``dtype``."""
    return nn.LayerNorm(epsilon=1e-5, dtype=dtype).apply(
        {"params": {"scale": scale, "bias": bias}}, x
    )


def _dense(x, w, dtype, scale=None, bias=None):
    """QDense/Dense numerics on (B, K) activations.

    int8 path (``scale`` given): bf16×int8→f32 accumulate, fp32 scale and
    bias, output cast to ``dtype`` — exactly ``weight_only.QDense``.
    packed-int4 path (``w`` uint8, (K/2, N)): the two nibble planes are
    the first/second half of K, so the dot is two contiguous half-K
    matmuls summed in fp32 — same epilogue, half the weight HBM traffic.
    float path: plain dtype dot + bias — exactly ``nn.Dense(dtype=...)``.
    """
    if scale is not None:
        if w.dtype == jnp.uint8:  # packed int4 (quantize_tree bits=4)
            from ..quantization.weight_only import unpack_int4

            lo, hi = unpack_int4(w, dtype)
            K2 = w.shape[0]
            xl = x.astype(dtype)
            dn = (((x.ndim - 1,), (0,)), ((), ()))
            acc = jax.lax.dot_general(
                xl[..., :K2], lo, dn, preferred_element_type=jnp.float32
            ) + jax.lax.dot_general(
                xl[..., K2:], hi, dn, preferred_element_type=jnp.float32
            )
        else:
            acc = jax.lax.dot_general(
                x.astype(dtype), w.astype(dtype),
                (((x.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        y = acc * scale
        if bias is not None:
            y = y + bias
        return y.astype(dtype)
    y = jax.lax.dot_general(
        x.astype(dtype), w.astype(dtype),
        (((x.ndim - 1,), (0,)), ((), ())),
    )
    if bias is not None:
        y = y + bias.astype(dtype)
    return y


def _layer_weights(layers: dict, l: int, quant: bool, barrier: bool = False):
    """Static per-layer slice of the stacked ('layers') param tree, with
    q/k/v merged into one (K, 3N) projection.  ``barrier=True`` wraps the
    int8 leaves in an optimization_barrier to pin dequantize inside the
    token loop — an A/B knob only (see module docstring)."""
    att = layers["attn"]
    kkey = "kernel_q" if quant else "kernel"
    # barrier default OFF: measured +4 ms on v5e (blocks the async weight
    # prefetch pipeline); hoisting of dequantized copies only appears at
    # unroll >= 4, which the tuned defaults avoid

    def k(mod):
        w = mod[kkey][l]
        return jax.lax.optimization_barrier(w) if (quant and barrier) else w

    qkv_w = jnp.concatenate([k(att["w_q"]), k(att["w_k"]), k(att["w_v"])], axis=1)
    out = {
        "ln1": (layers["norm1"]["scale"][l], layers["norm1"]["bias"][l]),
        "ln2": (layers["norm2"]["scale"][l], layers["norm2"]["bias"][l]),
        "qkv_w": qkv_w,
        "qkv_b": jnp.concatenate(
            [att["w_q"]["bias"][l], att["w_k"]["bias"][l], att["w_v"]["bias"][l]]
        ),
        "out_w": k(att["out_proj"]),
        "out_b": att["out_proj"]["bias"][l],
        "ff1_w": k(layers["ff_linear1"]),
        "ff1_b": layers["ff_linear1"]["bias"][l],
        "ff2_w": k(layers["ff_linear2"]),
        "ff2_b": layers["ff_linear2"]["bias"][l],
    }
    if quant:
        out["qkv_s"] = jnp.concatenate(
            [att["w_q"]["scale"][l], att["w_k"]["scale"][l], att["w_v"]["scale"][l]]
        )
        out["out_s"] = att["out_proj"]["scale"][l]
        out["ff1_s"] = layers["ff_linear1"]["scale"][l]
        out["ff2_s"] = layers["ff_linear2"]["scale"][l]
    return out


def _attend_cached(q, cache_k, cache_v, t, n_heads, dtype):
    """Single-token attention over a (B, L, H*Dh) cache, positions <= t.

    Same math as transformer._attend at Tq=1: bf16 QK with fp32
    accumulate, fp32 masked softmax, bf16 PV — shaped without the T=1
    axis so no (B, L, H, Dh) cache copies materialize."""
    B, L, HD = cache_k.shape
    dh = HD // n_heads
    # exact einsum/shape mirror of transformer._attend at Tq=1 so the
    # compiler emits the same reductions (a (B,H,d)x(B,L,H,d) formulation
    # measured bit-different in bf16 — enough to flip +0.5 boundaries)
    qh = q.reshape(B, 1, n_heads, dh)
    kh = cache_k.reshape(B, L, n_heads, dh)
    vh = cache_v.reshape(B, L, n_heads, dh)
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", qh, kh, preferred_element_type=jnp.float32
    ) * (dh ** -0.5)
    mask = jnp.where(
        jnp.arange(L)[None, None, None, :] <= t,
        jnp.float32(0.0), jnp.float32(-1e9),
    )
    probs = jax.nn.softmax(
        (logits + mask).astype(jnp.float32), axis=-1
    ).astype(dtype)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, vh)
    return ctx.reshape(B, HD)


def _layer_step(x, w, ckv, t, n_heads, dtype, quant):
    """One pre-LN transformer layer on a (B, D) token; returns the new x
    and the updated (loop-carried) cache buffer.

    The K/V cache is ONE (B, L, 2D) buffer per layer: k and v are
    adjacent in the merged qkv projection output, so the cache write is a
    single one-token ``dynamic_update_slice`` of the contiguous
    ``qkv[:, D:]`` slab (half the update ops and loop carries of separate
    k/v buffers; attention reads lane-slices of the carry, which XLA
    fuses into the QK/PV products)."""
    B, D = x.shape
    h = _layer_norm(x, *w["ln1"], dtype)
    qkv = _dense(h, w["qkv_w"], dtype,
                 w.get("qkv_s") if quant else None, w["qkv_b"])
    q = qkv[:, :D]
    ckv = jax.lax.dynamic_update_slice(ckv, qkv[:, None, D:], (0, t, 0))
    ctx = _attend_cached(q, ckv[..., :D], ckv[..., D:], t, n_heads, dtype)
    x = x + _dense(ctx, w["out_w"], dtype,
                   w.get("out_s") if quant else None, w["out_b"])
    h = _layer_norm(x, *w["ln2"], dtype)
    y = _dense(h, w["ff1_w"], dtype, w.get("ff1_s") if quant else None, w["ff1_b"])
    y = nn.relu(y)
    y = _dense(y, w["ff2_w"], dtype, w.get("ff2_s") if quant else None, w["ff2_b"])
    return x + y, ckv


def plm_fast_decode(
    params: dict,
    cfg: MegaPLMConfig,
    tc_latent: jnp.ndarray,  # (B, T, D_tc)
    dtype: Any = jnp.bfloat16,
    quant: bool = False,
    temperature: float = 0.0,
    top_k: int = 0,
    rng: Optional[jnp.ndarray] = None,
    unroll: int = 1,  # v5e sweep: 17.1 ms @ 1 vs 18.2 @ 2, 36 @ 4 (int8)
    init_cache: Optional[tuple] = None,  # (k_stack, v_stack) (L_layers,B,P+T,HD)
    start_pos: int = 0,  # first decode position (== prompt length)
    prev0: Optional[jnp.ndarray] = None,  # (B,) int32 first input code
    barrier: bool = False,  # measured: the barrier COSTS ~4 ms (v5e sweep)
) -> jnp.ndarray:
    """Drop-in fast twin of ``plm.plm_infer`` → (B, T) int32 codes.

    ``init_cache``/``start_pos``/``prev0`` carry an in-context prosody
    prompt prefilled by the flax path (its cache stack layout
    (num_layers, B, L, H·Dh) is exactly this loop's per-layer buffers)."""
    B, T, _ = tc_latent.shape
    c = cfg
    L_ctx = start_pos + T
    HD = c.d_model
    layers = params["plm"]["layers"]
    n_layers = layers["norm1"]["scale"].shape[0]
    w_layers = [_layer_weights(layers, l, quant, barrier) for l in range(n_layers)]
    embed_tbl = params["pc_embedding"]["embedding"]
    pred = params["predict_layer"]
    pe = jnp.asarray(sinusoidal_table(8192, c.d_model), dtype)[:L_ctx]
    tc = tc_latent.astype(dtype)

    if init_cache is None:
        ckv0 = [jnp.zeros((B, L_ctx, 2 * HD), dtype) for _ in range(n_layers)]
    else:
        k_stack, v_stack = init_cache
        ckv0 = [
            jnp.concatenate(
                [k_stack[l].astype(dtype), v_stack[l].astype(dtype)], axis=-1
            )
            for l in range(n_layers)
        ]
    bos = jnp.full((B,), c.bos_id, jnp.int32)
    if prev0 is None:
        prev0 = bos

    def pick(logits, t):
        if temperature > 0:
            lg = logits / temperature
            if top_k and top_k < c.vq_bins:
                kth = jax.lax.top_k(lg, top_k)[0][..., -1:]
                lg = jnp.where(lg < kth, jnp.float32(-1e9), lg)
            return jax.random.categorical(jax.random.fold_in(rng, t), lg).astype(
                jnp.int32
            )
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    def token_step(carry, t):
        prev, ckvs = carry
        pc_emb = jnp.take(embed_tbl.astype(dtype), prev, axis=0)
        tc_t = jax.lax.dynamic_slice_in_dim(tc, t, 1, axis=1)[:, 0]
        x = jnp.concatenate([tc_t, pc_emb], axis=-1)
        pos = t + start_pos
        x = x + jnp.take(pe, pos, axis=0)
        new_ckv = []
        for l in range(n_layers):
            x, ckv = _layer_step(
                x, w_layers[l], ckvs[l], pos, c.n_heads, dtype, quant
            )
            new_ckv.append(ckv)
        if quant:
            logits = _dense(x, pred["kernel_q"], dtype, pred["scale"], None)
        else:
            logits = _dense(x, pred["kernel"], dtype)
        code = pick(logits.astype(jnp.float32), t)
        return (code, tuple(new_ckv)), code

    (_, _), codes = jax.lax.scan(
        token_step, (prev0, tuple(ckv0)),
        jnp.arange(T, dtype=jnp.int32), unroll=min(unroll, T),
    )
    return jnp.transpose(codes, (1, 0))  # (B, T)


def _attend_cached_slots(q, cache_k, cache_v, p_abs, n_heads, dtype):
    """Per-slot attention: row s attends cache positions <= p_abs[s]."""
    B, L, HD = cache_k.shape
    dh = HD // n_heads
    qh = q.reshape(B, 1, n_heads, dh)
    kh = cache_k.reshape(B, L, n_heads, dh)
    vh = cache_v.reshape(B, L, n_heads, dh)
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", qh, kh, preferred_element_type=jnp.float32
    ) * (dh ** -0.5)
    mask = jnp.where(
        jnp.arange(L)[None, None, None, :] <= p_abs[:, None, None, None],
        jnp.float32(0.0), jnp.float32(-1e9),
    )
    probs = jax.nn.softmax(
        (logits + mask).astype(jnp.float32), axis=-1
    ).astype(dtype)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, vh)
    return ctx.reshape(B, HD)


def _layer_step_slots(x, w, ck, cv, p_abs, n_heads, dtype, quant):
    """Per-slot layer step: cache writes at per-row positions (dense
    one-hot select — TPU scatter avoidance, same trick as the flax
    per_slot path in nn/transformer.py)."""
    h = _layer_norm(x, *w["ln1"], dtype)
    qkv = _dense(h, w["qkv_w"], dtype,
                 w.get("qkv_s") if quant else None, w["qkv_b"])
    q, k, v = jnp.split(qkv, 3, axis=-1)
    L = ck.shape[1]
    onehot = (jnp.arange(L)[None, :] == p_abs[:, None])[:, :, None]
    ck = jnp.where(onehot, k[:, None, :], ck)
    cv = jnp.where(onehot, v[:, None, :], cv)
    ctx = _attend_cached_slots(q, ck, cv, p_abs, n_heads, dtype)
    x = x + _dense(ctx, w["out_w"], dtype,
                   w.get("out_s") if quant else None, w["out_b"])
    h = _layer_norm(x, *w["ln2"], dtype)
    y = _dense(h, w["ff1_w"], dtype, w.get("ff1_s") if quant else None, w["ff1_b"])
    y = nn.relu(y)
    y = _dense(y, w["ff2_w"], dtype, w.get("ff2_s") if quant else None, w["ff2_b"])
    return x + y, ck, cv


def plm_fast_tick(
    params: dict,
    cfg: MegaPLMConfig,
    tc_plm: jnp.ndarray,  # (S, Tc, D_tc)
    cache_k: tuple,  # n_layers × (S, Tc+Pe, HD)
    cache_v: tuple,
    codes: jnp.ndarray,  # (S, Tc) int32
    prev: jnp.ndarray,  # (S,) int32
    pos: jnp.ndarray,  # (S,) int32 generated-code position
    plen: jnp.ndarray,  # (S,) int32 prompt length (cache/pos offset)
    total: jnp.ndarray,  # (S,) int32 codes to generate per slot
    K: int,
    dtype: Any = jnp.bfloat16,
    quant: bool = False,
) -> tuple:
    """Advance every live slot K greedy prosody codes — the fast twin of
    the flax per-slot ``continuous.engine_tick`` body (done slots freeze
    their code buffer; clamped junk writes are never read).  Returns
    ``(cache_k, cache_v, codes, prev, pos)``."""
    S, Tc, _ = tc_plm.shape
    c = cfg
    layers = params["plm"]["layers"]
    n_layers = layers["norm1"]["scale"].shape[0]
    w_layers = [_layer_weights(layers, l, quant) for l in range(n_layers)]
    embed_tbl = params["pc_embedding"]["embedding"]
    pred = params["predict_layer"]
    pe = jnp.asarray(sinusoidal_table(8192, c.d_model), dtype)
    tc = tc_plm.astype(dtype)

    def step(carry, _):
        cks, cvs, codes, prev, pos = carry
        p = jnp.minimum(pos, Tc - 1)
        p_abs = p + plen
        tc_t = jnp.take_along_axis(tc, p[:, None, None], axis=1)[:, 0]
        x = jnp.concatenate(
            [tc_t, jnp.take(embed_tbl.astype(dtype), prev, axis=0)], axis=-1
        )
        x = x + jnp.take(pe, p_abs, axis=0)
        new_ck, new_cv = [], []
        for l in range(n_layers):
            x, ck, cv = _layer_step_slots(
                x, w_layers[l], cks[l], cvs[l], p_abs, c.n_heads, dtype, quant
            )
            new_ck.append(ck)
            new_cv.append(cv)
        if quant:
            logits = _dense(x, pred["kernel_q"], dtype, pred["scale"], None)
        else:
            logits = _dense(x, pred["kernel"], dtype)
        code = jnp.argmax(logits.astype(jnp.float32), axis=-1).astype(jnp.int32)
        live = pos < total
        onehot = jnp.arange(Tc)[None, :] == p[:, None]
        codes = jnp.where(onehot & live[:, None], code[:, None], codes)
        prev = jnp.where(live, code, prev)
        pos = jnp.where(live, pos + 1, pos)
        return (tuple(new_ck), tuple(new_cv), codes, prev, pos), ()

    (cks, cvs, codes, prev, pos), _ = jax.lax.scan(
        step, (tuple(cache_k), tuple(cache_v), codes, prev, pos), None, length=K
    )
    return cks, cvs, codes, prev, pos


def adm_fast_decode(
    params: dict,
    cfg: MegaADMConfig,
    tc_latents: jnp.ndarray,  # (B, T, D)
    dtype: Any = jnp.bfloat16,
    quant: bool = False,
    unroll: int = 4,
) -> jnp.ndarray:
    """Fast twin of ``adm.adm_infer`` → (B, T) int32 durations.

    Same raw-float feedback as the reference loop (megatts2.py:257-275);
    +0.5 round and [1, max_duration_token] clamp applied at the end."""
    B, T, _ = tc_latents.shape
    c = cfg
    layers = params["adm"]["layers"]
    n_layers = layers["norm1"]["scale"].shape[0]
    w_layers = [_layer_weights(layers, l, quant) for l in range(n_layers)]
    dt_w = params["dt_linear_emb"]
    tc_w = params["tc_linear_emb"]
    pred = params["predict_layer"]
    pe = jnp.asarray(sinusoidal_table(8192, c.d_model), dtype)[:T]
    HD = c.d_model
    tc = tc_latents.astype(dtype)

    ckv0 = [jnp.zeros((B, T, 2 * HD), dtype) for _ in range(n_layers)]

    def token_step(carry, t):
        prev, ckvs = carry
        dt_emb = _dense(
            prev[:, None], dt_w.get("kernel_q", dt_w.get("kernel")), dtype,
            dt_w.get("scale") if quant else None, None,
        )
        # per-step tc projection, same (B, D) @ (D, E) shape as the flax
        # decode_step — a batched (B*T) precompute changes bf16 accumulate
        # tiling and flips +0.5-boundary durations
        tc_t = jax.lax.dynamic_slice_in_dim(tc, t, 1, axis=1)[:, 0]
        tc_t = _dense(
            tc_t, tc_w.get("kernel_q", tc_w.get("kernel")), dtype,
            tc_w.get("scale") if quant else None, None,
        )
        x = jnp.concatenate([tc_t, dt_emb], axis=-1)
        x = x + pe[t]
        new_ckv = []
        for l in range(n_layers):
            x, ckv = _layer_step(
                x, w_layers[l], ckvs[l], t, c.n_heads, dtype, quant
            )
            new_ckv.append(ckv)
        if quant:
            d = _dense(x, pred["kernel_q"], dtype, pred["scale"], None)[:, 0]
        else:
            d = _dense(x, pred["kernel"], dtype)[:, 0]
        d = d.astype(jnp.float32)
        return (d, tuple(new_ckv)), d

    (_, _), dts = jax.lax.scan(
        token_step, (jnp.zeros((B,), jnp.float32), tuple(ckv0)),
        jnp.arange(T, dtype=jnp.int32), unroll=min(unroll, T),
    )
    dts = jnp.transpose(dts, (1, 0))
    return jnp.clip((dts + 0.5).astype(jnp.int32), 1, c.max_duration_token)
