"""PLM and ADM training steps.

Parity targets:
* reference ``models/trainer.py:197-294`` (MegaPLMTrainer) — summed CE with
  ignore_index = vq_bins+1 (1025) over code logits, top-10 accuracy metric,
  AdamW + cosine warmup over ``max_steps``;
* reference ``models/trainer.py:296-376`` (MegaADMTrainer) — summed MSE on
  predicted vs target durations (the sum INCLUDES padding zeros, which the
  reference silently keeps — reproduced here; ``mask_padding=True`` fixes it).
"""
from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..config import MegaADMConfig, MegaPLMConfig, TrainConfig
from ..models import MegaADM, MegaPLM
from .schedules import make_adamw


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt: Any
    rng: jax.Array


def _top_k_accuracy(logits, targets, k: int, ignore_index: int):
    """MulticlassAccuracy(top_k=k, average='micro', ignore_index=...)."""
    topk = jax.lax.top_k(logits, k)[1]  # (B, T, k)
    hit = (topk == targets[..., None]).any(-1)
    valid = targets != ignore_index
    return jnp.sum(hit & valid) / jnp.maximum(1, jnp.sum(valid))


def create_plm_state(rng, cfg: MegaPLMConfig, tcfg: TrainConfig, example_batch):
    model = MegaPLM(cfg)
    p_rng, s_rng = jax.random.split(rng)
    variables = jax.jit(model.init)(
        p_rng,
        example_batch["tc_latents"],
        example_batch["p_codes"],
        example_batch["lens"],
    )
    tx = make_adamw(tcfg.initial_learning_rate, tcfg.warmup_steps, tcfg.max_steps)
    return (
        TrainState(jnp.zeros((), jnp.int32), variables["params"], tx.init(variables["params"]), s_rng),
        tx,
    )


def make_plm_train_step(cfg: MegaPLMConfig, tcfg: TrainConfig, tx):
    dtype = jnp.bfloat16 if tcfg.train_dtype == "bfloat16" else jnp.float32
    model = MegaPLM(cfg, dtype=dtype)
    eos = cfg.eos_id

    def loss_fn(params, batch, drop_rng, train):
        logits, target = model.apply(
            {"params": params},
            batch["tc_latents"], batch["p_codes"], batch["lens"],
            train=train,
            rngs={"dropout": drop_rng} if train else {},
        )
        logits = logits.astype(jnp.float32)
        valid = target != eos
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, target[..., None], axis=-1)[..., 0]
        loss = jnp.sum(jnp.where(valid, nll, 0.0))  # reduction='sum', ignore eos
        loss_log = loss / target.shape[0] / target.shape[1]
        ac10 = _top_k_accuracy(logits, target, 10, eos)
        return loss, (loss_log, ac10)

    def train_step(state: TrainState, batch):
        rng, drop_rng = jax.random.split(state.rng)
        (loss, (loss_log, ac10)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, drop_rng, True
        )
        updates, opt = tx.update(grads, state.opt, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            state.replace(step=state.step + 1, params=params, opt=opt, rng=rng),
            # 'loss' is per-token (sum/(B*T)); 'loss_sum' is the reference's
            # raw summed CE scale (trainer.py:253-254) for curve comparison
            {"loss": loss_log, "loss_sum": loss, "ac10": ac10},
        )

    def eval_step(state: TrainState, batch):
        loss, (loss_log, ac10) = loss_fn(state.params, batch, state.rng, False)
        return {"loss": loss_log, "loss_sum": loss, "ac10": ac10}

    return train_step, eval_step


def create_adm_state(rng, cfg: MegaADMConfig, tcfg: TrainConfig, example_batch):
    model = MegaADM(cfg)
    p_rng, s_rng = jax.random.split(rng)
    variables = jax.jit(model.init)(
        p_rng,
        example_batch["tc_latents"],
        example_batch["duration_tokens"],
        example_batch["lens"],
    )
    tx = make_adamw(tcfg.initial_learning_rate, tcfg.warmup_steps, tcfg.max_steps)
    return (
        TrainState(jnp.zeros((), jnp.int32), variables["params"], tx.init(variables["params"]), s_rng),
        tx,
    )


def make_adm_train_step(
    cfg: MegaADMConfig, tcfg: TrainConfig, tx, mask_padding: bool = False
):
    dtype = jnp.bfloat16 if tcfg.train_dtype == "bfloat16" else jnp.float32
    model = MegaADM(cfg, dtype=dtype)

    def loss_fn(params, batch, drop_rng, train):
        pred, target = model.apply(
            {"params": params},
            batch["tc_latents"], batch["duration_tokens"], batch["lens"],
            train=train,
            rngs={"dropout": drop_rng} if train else {},
        )
        pred = pred.astype(jnp.float32)
        sq = (pred - target) ** 2
        if mask_padding:
            pos = jnp.arange(target.shape[1])[None, :]
            sq = jnp.where(pos < batch["lens"][:, None], sq, 0.0)
        loss = jnp.sum(sq)
        loss_log = loss / target.shape[0] / target.shape[1]
        return loss, loss_log

    def train_step(state: TrainState, batch):
        rng, drop_rng = jax.random.split(state.rng)
        (loss, loss_log), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, drop_rng, True
        )
        updates, opt = tx.update(grads, state.opt, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            state.replace(step=state.step + 1, params=params, opt=opt, rng=rng),
            # 'loss_sum' mirrors the reference's raw summed MSE scale
            # (trainer.py:342-343); 'loss' is per-position
            {"loss": loss_log, "loss_sum": loss},
        )

    def eval_step(state: TrainState, batch):
        loss, loss_log = loss_fn(state.params, batch, state.rng, False)
        return {"loss": loss_log, "loss_sum": loss}

    return train_step, eval_step
