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


def plm_infer(
    params,
    cfg: MegaPLMConfig,
    tc_latent: jnp.ndarray,  # (B, T, D_tc), padded
    dtype: Any = jnp.float32,
    unroll: int = 4,
    quant: bool = False,
) -> jnp.ndarray:
    """Greedy batched decode of prosody codes, (B, T) int32.

    Matches reference ``MegaPLM.infer`` numerics (greedy argmax over the
    same logits) but runs as a scan with a KV cache.  With ``quant=True``
    ``params`` must be the int8 layout from
    ``quantization.weight_only.quantize_tree`` (≈2× decode: weight-HBM
    traffic halves, see BENCHMARKS.md).
    """
    B, T, _ = tc_latent.shape
    model = MegaPLM(cfg, dtype=dtype, decode=True, max_decode_len=T, quant=quant)
    bos = jnp.full((B,), cfg.bos_id, jnp.int32)

    # Step 0 outside the scan initializes the cache collection.
    logits0, cache = model.apply(
        {"params": params},
        tc_latent[:, 0:1],
        bos,
        jnp.asarray(0, jnp.int32),
        method=MegaPLM.decode_step,
        mutable=["cache"],
    )
    code0 = jnp.argmax(logits0, axis=-1).astype(jnp.int32)

    def step(carry, t):
        cache, prev = carry
        tc_t = jax.lax.dynamic_slice_in_dim(tc_latent, t, 1, axis=1)
        logits, cache = model.apply(
            {"params": params, **cache},
            tc_t,
            prev,
            t,
            method=MegaPLM.decode_step,
            mutable=["cache"],
        )
        code = jnp.argmax(logits, axis=-1).astype(jnp.int32)
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
