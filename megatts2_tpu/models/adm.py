"""MegaADM — autoregressive duration model.

Parity target: reference ``models/megatts2.py:201-292``: an 8-layer causal
transformer regressing per-phone frame counts; the previous duration scalar
is embedded via Linear(1, emb_dim, bias=False), the tc_latent via
Linear(tc_latent_dim, tc_emb_dim, bias=False); a bias-free scalar head
predicts the next duration.  ``infer`` greedy-decodes, rounds (+0.5 → int),
and clamps to [1, 128].

TPU-first departure: KV-cached ``lax.scan`` decode instead of the
reference's full-prefix recompute per step (``megatts2.py:257-275``).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import MegaADMConfig
from ..nn import SinePositionalEmbedding, TransformerEncoder


class MegaADM(nn.Module):
    cfg: MegaADMConfig = MegaADMConfig()
    dtype: Any = jnp.float32
    decode: bool = False
    max_decode_len: int = 0
    quant: bool = False  # int8 weight-only Dense kernels (serving decode)

    def setup(self):
        c = self.cfg
        self.adm = TransformerEncoder(
            dim=c.d_model,
            ff_dim=c.emb_dim * 4,
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

            dense = lambda f: QDense(f, use_bias=False, dtype=self.dtype)
        else:
            dense = lambda f: nn.Dense(f, use_bias=False, dtype=self.dtype)
        self.dt_linear_emb = dense(c.emb_dim)
        self.tc_linear_emb = dense(c.tc_emb_dim)
        self.pos_emb = SinePositionalEmbedding(c.d_model, dtype=self.dtype)
        self.predict_layer = dense(1)

    def __call__(
        self,
        tc_latents: jnp.ndarray,  # (B, T, D)
        duration_tokens: jnp.ndarray,  # (B, T+1, 1) float, leading 0 = BOS
        lens: jnp.ndarray,  # (B,)
        train: bool = False,
    ):
        dt_emb = self.dt_linear_emb(duration_tokens[:, :-1].astype(self.dtype))
        tc_emb = self.tc_linear_emb(tc_latents.astype(self.dtype))
        x = jnp.concatenate([tc_emb, dt_emb], axis=-1)
        x = self.pos_emb(x, deterministic=not train)
        x = self.adm(x, x_lens=lens, causal=True, deterministic=not train)
        predict = self.predict_layer(x)[..., 0]
        target = duration_tokens[:, 1:, 0]
        return predict, target

    def decode_step(
        self,
        tc_t: jnp.ndarray,  # (B, 1, D)
        prev_dt: jnp.ndarray,  # (B,) float
        t: jnp.ndarray,
    ) -> jnp.ndarray:
        dt_emb = self.dt_linear_emb(prev_dt[:, None, None].astype(self.dtype))
        tc_emb = self.tc_linear_emb(tc_t.astype(self.dtype))
        x = jnp.concatenate([tc_emb, dt_emb], axis=-1)
        x = self.pos_emb(x, offset=t)
        x = self.adm(x, max_decode_len=self.max_decode_len)
        return self.predict_layer(x)[:, 0, 0].astype(jnp.float32)


def adm_infer(
    params,
    cfg: MegaADMConfig,
    tc_latents: jnp.ndarray,  # (B, T, D)
    dtype: Any = jnp.float32,
    unroll: int = 4,
    quant: bool = False,
    fast: bool = True,
) -> jnp.ndarray:
    """Greedy batched duration decode → (B, T) int32 in [1, 128].

    ``quant=True`` expects int8 weight-only params from
    ``quantization.weight_only.quantize_tree`` (see plm.py docstring)."""
    if fast:
        # hand-scheduled twin (models/fast_decode.py): 2x on v5e (the ADM
        # decode is cache-copy-bound, not weight-bound)
        from .fast_decode import adm_fast_decode

        return adm_fast_decode(
            params, cfg, tc_latents, dtype=dtype, quant=quant, unroll=unroll
        )
    B, T, _ = tc_latents.shape
    if quant:
        from ..quantization.weight_only import is_int4_tree

        if is_int4_tree(params):
            raise NotImplementedError(
                "int4-packed params run only on the fast decode path; "
                "fast=False uses flax QDense, which expects the int8 "
                "layout (quantize_tree(bits=8))"
            )
    model = MegaADM(cfg, dtype=dtype, decode=True, max_decode_len=T, quant=quant)

    d0, cache = model.apply(
        {"params": params},
        tc_latents[:, 0:1],
        jnp.zeros((B,), jnp.float32),
        jnp.asarray(0, jnp.int32),
        method=MegaADM.decode_step,
        mutable=["cache"],
    )

    def step(carry, t):
        cache, prev = carry
        tc_t = jax.lax.dynamic_slice_in_dim(tc_latents, t, 1, axis=1)
        d, cache = model.apply(
            {"params": params, **cache},
            tc_t,
            prev,
            t,
            method=MegaADM.decode_step,
            mutable=["cache"],
        )
        return (cache, d), d

    if T > 1:
        (_, _), rest = jax.lax.scan(
            step, (cache, d0), jnp.arange(1, T, dtype=jnp.int32),
            unroll=min(unroll, max(T - 1, 1)),
        )
        dts = jnp.concatenate([d0[None], rest], axis=0)  # (T, B)
    else:
        dts = d0[None]
    dts = jnp.transpose(dts, (1, 0))
    # reference hardcodes clamp(1, 128) (megatts2.py:275); here the cap is
    # the (actually wired) max_duration_token knob, defaulting to 128
    return jnp.clip((dts + 0.5).astype(jnp.int32), 1, cfg.max_duration_token)
