"""MegaPLM — prosody-code language model.

Parity target: reference ``models/megatts2.py:120-198``: a 12-layer / 16-head
decoder-only transformer over 1024-way VQ prosody codes, d_model = vq_dim +
tc_latent_dim = 1024; input token t = concat(tc_latent_t, embed(code_{t-1}));
output head Linear(d_model, vq_bins, bias=False); BOS id = vq_bins (1024),
pad/EOS id = vq_bins+1 (embedding table has vq_bins+2 rows).

TPU-first departure: the reference's greedy ``infer`` recomputes the full
prefix per step with no KV cache (O(T³) total work,
``megatts2.py:165-181``).  Here decoding is a ``jax.lax.scan`` over a
static-shape KV cache — one token per step, O(T²) total, fully on-device,
batched over utterances.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import MegaPLMConfig
from ..nn import SinePositionalEmbedding, TransformerEncoder


class MegaPLM(nn.Module):
    cfg: MegaPLMConfig = MegaPLMConfig()
    dtype: Any = jnp.float32
    decode: bool = False
    max_decode_len: int = 0
    quant: bool = False  # int8 weight-only Dense kernels (serving decode)
    per_slot: bool = False  # per-row cache positions (continuous batching)

    def setup(self):
        c = self.cfg
        self.plm = TransformerEncoder(
            dim=c.d_model,
            ff_dim=c.d_model * 4,
            num_layers=c.n_layers,
            conv_ff=False,
            n_heads=c.n_heads,
            dropout=c.dropout,
            dtype=self.dtype,
            decode=self.decode,
            use_flash=c.use_flash,
            quant=self.quant,
            per_slot=self.per_slot,
        )
        if self.quant:
            from ..quantization.weight_only import QDense

            self.predict_layer = QDense(c.vq_bins, use_bias=False, dtype=self.dtype)
        else:
            self.predict_layer = nn.Dense(c.vq_bins, use_bias=False, dtype=self.dtype)
        self.pos = SinePositionalEmbedding(c.d_model, dtype=self.dtype)
        self.pc_embedding = nn.Embed(c.vq_bins + 2, c.vq_dim, dtype=self.dtype)

    def __call__(
        self,
        tc_latent: jnp.ndarray,  # (B, T, D_tc)
        p_codes: jnp.ndarray,  # (B, T+1) with BOS prepended
        lens: jnp.ndarray,  # (B,)
        train: bool = False,
    ):
        pc_emb = self.pc_embedding(p_codes[:, :-1])
        x = jnp.concatenate([tc_latent.astype(self.dtype), pc_emb], axis=-1)
        x = self.pos(x, deterministic=not train)
        x = self.plm(x, x_lens=lens, causal=True, deterministic=not train)
        logits = self.predict_layer(x)
        target = p_codes[:, 1:]
        return logits, target

    def decode_step(
        self,
        tc_t: jnp.ndarray,  # (B, 1, D_tc)
        prev_code: jnp.ndarray,  # (B,) int32
        t: jnp.ndarray,  # scalar position
    ) -> jnp.ndarray:
        """One KV-cached AR step → logits (B, vq_bins)."""
        pc_emb = self.pc_embedding(prev_code[:, None])
        x = jnp.concatenate([tc_t.astype(self.dtype), pc_emb], axis=-1)
        x = self.pos(x, offset=t)
        x = self.plm(x, max_decode_len=self.max_decode_len)
        return self.predict_layer(x)[:, 0].astype(jnp.float32)

    def prefill(
        self,
        tc: jnp.ndarray,  # (B, P, D_tc) prompt content latents (code rate)
        prev_codes: jnp.ndarray,  # (B, P) int32: BOS ++ prompt_codes[:-1]
    ) -> jnp.ndarray:
        """Write a P-token prompt prefix into the KV cache in ONE pass
        (block-causal decode mask) — the in-context prosody conditioning
        the PLM is trained with (PLMBatchBuilder's same-speaker prompt
        prefix, data/datasets.py) but absent from the reference's infer
        (``models/megatts2.py:165-181`` starts from BOS only).  Returns
        the logits after the last prompt token (usually discarded)."""
        pc_emb = self.pc_embedding(prev_codes)
        x = jnp.concatenate([tc.astype(self.dtype), pc_emb], axis=-1)
        x = self.pos(x)  # prompt occupies absolute positions [0, P)
        x = self.plm(x, max_decode_len=self.max_decode_len)
        return self.predict_layer(x)[:, -1].astype(jnp.float32)


def plm_infer(
    params,
    cfg: MegaPLMConfig,
    tc_latent: jnp.ndarray,  # (B, T, D_tc), padded
    dtype: Any = jnp.float32,
    unroll: int = 4,
    quant: bool = False,
    temperature: float = 0.0,
    top_k: int = 0,
    rng: jnp.ndarray | None = None,
    prompt_tc: jnp.ndarray | None = None,  # (B, P, D_tc), code rate
    prompt_codes: jnp.ndarray | None = None,  # (B, P) int32
    fast: bool = True,
) -> jnp.ndarray:
    """Batched decode of prosody codes, (B, T) int32.

    Defaults match reference ``MegaPLM.infer`` numerics (greedy argmax over
    the same logits) but run as a scan with a KV cache.  Extensions beyond
    the reference (each OFF by default):

    * ``quant=True`` — ``params`` is the int8 layout from
      ``quantization.weight_only.quantize_tree`` (≈1.6× decode: weight-HBM
      traffic halves, see BENCHMARKS.md).
    * ``temperature > 0`` — sample from softmax(logits/temperature),
      optionally truncated to the ``top_k`` most likely codes; requires
      ``rng``.  Greedy prosody is often flat — sampling matches how the
      MegaTTS2 paper's P-LLM is used.
    * ``prompt_tc``/``prompt_codes`` — in-context prosody prompt: a
      same-speaker prefix (stage-2 features: tc_latent at code rate +
      VQPE codes) prefilled into the KV cache in one pass, exactly the
      conditioning the PLM sees in training (PLMBatchBuilder).  The prompt
      must share one static length P across the batch (serve.py groups
      requests by prompt, so this holds in production).
    """
    B, T, _ = tc_latent.shape
    P = 0 if prompt_tc is None else prompt_tc.shape[1]
    if temperature > 0 and rng is None:
        raise ValueError("sampling (temperature > 0) requires rng")
    if quant and (not fast or P > 0):
        from ..quantization.weight_only import is_int4_tree

        if is_int4_tree(params):
            raise NotImplementedError(
                "int4-packed params (quantize_tree(bits=4)) run only on "
                "the fast decode path without a prompt prefill; the flax "
                "QDense layers behind fast=False and prompt_tc expect the "
                "int8 layout (quantize_tree(bits=8))"
            )
    model = MegaPLM(cfg, dtype=dtype, decode=True, max_decode_len=P + T, quant=quant)
    bos = jnp.full((B,), cfg.bos_id, jnp.int32)

    if fast:
        # hand-scheduled twin of this loop (models/fast_decode.py): same
        # math, no per-layer cache slice copies — 25.4 -> 17.1 ms (int8,
        # B=8, 64 steps) on v5e; the flax scan below stays as the
        # reference implementation (and the per-slot continuous path).
        # NOTE: fast_decode carries its own tuned unroll default (1); the
        # ``unroll`` arg here tunes only the scan path.
        from .fast_decode import plm_fast_decode

        init_cache, start_pos, prev0 = None, 0, None
        if P > 0:
            prev_prompt = jnp.concatenate([bos[:, None], prompt_codes[:, :-1]], axis=1)
            _, cache = model.apply(
                {"params": params},
                prompt_tc,
                prev_prompt,
                method=MegaPLM.prefill,
                mutable=["cache"],
            )
            att = cache["cache"]["plm"]["layers"]["attn"]
            init_cache = (att["k"], att["v"])
            start_pos, prev0 = P, prompt_codes[:, -1]
        return plm_fast_decode(
            params, cfg, tc_latent, dtype=dtype, quant=quant,
            temperature=temperature, top_k=top_k, rng=rng,
            init_cache=init_cache, start_pos=start_pos, prev0=prev0,
        )

    def pick(logits: jnp.ndarray, t) -> jnp.ndarray:
        if temperature > 0:
            lg = logits / temperature
            if top_k and top_k < cfg.vq_bins:
                kth = jax.lax.top_k(lg, top_k)[0][..., -1:]
                lg = jnp.where(lg < kth, jnp.float32(-1e9), lg)
            return jax.random.categorical(jax.random.fold_in(rng, t), lg).astype(
                jnp.int32
            )
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    if P > 0:
        # one-pass prompt prefill (block-causal cache write)
        prev_prompt = jnp.concatenate([bos[:, None], prompt_codes[:, :-1]], axis=1)
        _, cache = model.apply(
            {"params": params},
            prompt_tc,
            prev_prompt,
            method=MegaPLM.prefill,
            mutable=["cache"],
        )
        prev0 = prompt_codes[:, -1]
        logits0, cache = model.apply(
            {"params": params, **cache},
            tc_latent[:, 0:1],
            prev0,
            jnp.asarray(P, jnp.int32),
            method=MegaPLM.decode_step,
            mutable=["cache"],
        )
    else:
        # Step 0 outside the scan initializes the cache collection.
        logits0, cache = model.apply(
            {"params": params},
            tc_latent[:, 0:1],
            bos,
            jnp.asarray(0, jnp.int32),
            method=MegaPLM.decode_step,
            mutable=["cache"],
        )
    code0 = pick(logits0, 0)

    def step(carry, t):
        cache, prev = carry
        tc_t = jax.lax.dynamic_slice_in_dim(tc_latent, t, 1, axis=1)
        logits, cache = model.apply(
            {"params": params, **cache},
            tc_t,
            prev,
            t + P,  # absolute position (prompt occupies [0, P))
            method=MegaPLM.decode_step,
            mutable=["cache"],
        )
        code = pick(logits, t)
        return (cache, code), code

    if T > 1:
        # unroll: pipelines the per-token weight streams across steps
        # (each step's matmuls are small; measured on v5e in BENCHMARKS.md)
        (_, _), codes_rest = jax.lax.scan(
            step, (cache, code0), jnp.arange(1, T, dtype=jnp.int32),
            unroll=min(unroll, max(T - 1, 1)),
        )
        codes = jnp.concatenate([code0[None], codes_rest], axis=0)  # (T, B)
    else:
        codes = code0[None]
    return jnp.transpose(codes, (1, 0))  # (B, T)
