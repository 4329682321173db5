"""VQ-GAN training step (generator + multi-window discriminator).

Parity target: reference ``models/trainer.py:22-195`` (MegaGANTrainer):
manual two-optimizer alternation —
* D step first: LSGAN ``0.5·E[(D(y)−1)²] + 0.5·E[D(ŷ_detached)²]``;
* then G step AGAINST THE UPDATED D:
  ``L1(y, ŷ) + 0.15·commit + 0.05·vq + 1.0·0.5·E[(D(ŷ)−1)²]``
  (coefficients from configs/config_gan.yaml:93-95);
* AdamW + cosine-warmup schedules with T = max_steps // 2; bf16 compute.

TPU-first design: the whole alternation is ONE jitted, shardable function.
The generator runs forward once — ``jax.vjp`` captures the pullback, the D
update consumes ``stop_gradient(ŷ)``, and the G gradient is pulled back
through the saved vjp with the post-update D params, reproducing the
reference's ordering without a second G forward.  Discriminator window
starts are sampled from the step RNG (same start across the batch, as the
reference's ``clip``), and VQ EMA state updates ride along functionally.
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..config import DiscriminatorConfig, MegaGConfig, TrainConfig
from ..models import Discriminator, MegaG
from .schedules import make_adamw


def _mels_to_f32(batch: dict) -> dict:
    """Accept fp16-on-the-wire mel batches (GANBatchBuilder halves upload
    bytes because the axon plugin leaks staging buffers — a 30k-step run
    OOM-killed a 129 GB host) by casting back to f32 at step entry; compute
    is bf16 downstream, so the wire dtype never reaches the numerics."""
    return dict(
        batch,
        mel_targets=batch["mel_targets"].astype(jnp.float32),
        mel_timbres=batch["mel_timbres"].astype(jnp.float32),
    )


class GANTrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    g_params: Any
    d_params: Any
    vq_stats: Any
    batch_stats: Any
    g_opt: Any
    d_opt: Any
    rng: jax.Array
    # EMA copy of g_params when TrainConfig.g_ema_decay > 0, else None
    # (None is an empty pytree node, so pre-EMA checkpoints restore
    # unchanged into a g_ema=None state)
    g_ema: Any = None


def create_gan_state(
    rng: jax.Array,
    g_cfg: MegaGConfig,
    d_cfg: DiscriminatorConfig,
    tcfg: TrainConfig,
    example_batch: dict,
) -> Tuple[GANTrainState, optax.GradientTransformation, optax.GradientTransformation]:
    g = MegaG(g_cfg)
    d = Discriminator(d_cfg)
    example_batch = _mels_to_f32(
        {k: jnp.asarray(v) for k, v in example_batch.items()})
    g_rng, d_rng, vq_rng, state_rng = jax.random.split(rng, 4)
    g_vars = jax.jit(g.init)(
        {"params": g_rng, "vq": vq_rng},
        example_batch["duration_tokens"],
        example_batch["phone_tokens"],
        example_batch["tokens_lens"],
        example_batch["mel_timbres"],
        example_batch["mel_targets"],
    )
    d_vars = jax.jit(d.init)(d_rng, example_batch["mel_targets"])
    g_tx = make_adamw(tcfg.initial_learning_rate, tcfg.warmup_steps, tcfg.max_steps // 2)
    d_tx = make_adamw(tcfg.initial_learning_rate, tcfg.warmup_steps, tcfg.max_steps // 2)
    state = GANTrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_vars["params"],
        d_params=d_vars["params"],
        vq_stats=g_vars["vq_stats"],
        batch_stats=d_vars.get("batch_stats", {}),
        g_opt=g_tx.init(g_vars["params"]),
        d_opt=d_tx.init(d_vars["params"]),
        rng=state_rng,
        g_ema=(jax.tree_util.tree_map(jnp.copy, g_vars["params"])
               if tcfg.g_ema_decay > 0 else None),
    )
    return state, g_tx, d_tx


def make_gan_train_step(
    g_cfg: MegaGConfig,
    d_cfg: DiscriminatorConfig,
    tcfg: TrainConfig,
    g_tx: optax.GradientTransformation,
    d_tx: optax.GradientTransformation,
):
    dtype = jnp.bfloat16 if tcfg.train_dtype == "bfloat16" else jnp.float32
    g = MegaG(g_cfg, dtype=dtype)
    d = Discriminator(d_cfg, dtype=dtype)

    def train_step(state: GANTrainState, batch: dict):
        batch = _mels_to_f32(batch)
        rng, drop_rng, vq_rng, win_rng, d_rng1, d_rng2, d_rng3 = jax.random.split(
            state.rng, 7
        )
        T = batch["mel_targets"].shape[1]
        win_rngs = jax.random.split(win_rng, len(d_cfg.time_lengths))
        # window start bounded by the longest TRUE mel length in the batch
        # (reference clips within x_len.max(), dscrm.py:100-109), clamped so
        # every window fits inside the padded buffer
        max_len = jnp.minimum(
            jnp.max(batch["mel_target_lens"]).astype(jnp.int32)
            if "mel_target_lens" in batch
            else jnp.int32(T),
            T,
        )
        starts = [
            jax.random.randint(
                r, (), 0, jnp.maximum(max_len - wl, 0) + 1
            )
            for r, wl in zip(win_rngs, d_cfg.time_lengths)
        ]

        # --- single generator forward, vjp captured ---------------------
        def g_forward(g_params):
            (y_hat, commit, vq_loss), mut = g.apply(
                {"params": g_params, "vq_stats": state.vq_stats},
                batch["duration_tokens"],
                batch["phone_tokens"],
                batch["tokens_lens"],
                batch["mel_timbres"],
                batch["mel_targets"],
                train=True,
                rngs={"dropout": drop_rng, "vq": vq_rng},
                mutable=["vq_stats"],
            )
            return (
                y_hat.astype(jnp.float32),
                commit.astype(jnp.float32),
                vq_loss.astype(jnp.float32),
            ), mut["vq_stats"]

        (y_hat, commit_loss, vq_loss), g_vjp, new_vq_stats = jax.vjp(
            g_forward, state.g_params, has_aux=True
        )
        y = batch["mel_targets"].astype(jnp.float32)

        def d_apply(params, bstats, mel, rng):
            out, mut = d.apply(
                {"params": params, "batch_stats": bstats},
                mel, starts=starts, train=True, max_true_len=max_len,
                rngs={"dropout": rng},
                mutable=["batch_stats"],
            )
            return out["y"].astype(jnp.float32), mut["batch_stats"]

        # --- discriminator update (on detached y_hat) -------------------
        def d_loss_fn(d_params):
            v_real, bs1 = d_apply(d_params, state.batch_stats, y, d_rng1)
            v_fake, bs2 = d_apply(d_params, bs1, jax.lax.stop_gradient(y_hat), d_rng2)
            loss_real = 0.5 * jnp.mean((v_real - 1.0) ** 2)
            loss_fake = 0.5 * jnp.mean(v_fake**2)
            return loss_real + loss_fake, (loss_real, loss_fake, bs2)

        (d_loss, (d_loss_real, d_loss_fake, bstats)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True
        )(state.d_params)
        d_updates, d_opt = d_tx.update(d_grads, state.d_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        # --- generator update against the UPDATED discriminator ---------
        def g_loss_from_outputs(y_hat_f, commit_f, vq_f):
            v_adv, bs = d_apply(d_params, bstats, y_hat_f, d_rng3)
            loss_adv = 0.5 * jnp.mean((v_adv - 1.0) ** 2)
            loss_re = jnp.mean(jnp.abs(y - y_hat_f))
            loss = (
                loss_re
                + commit_f * tcfg.G_commit_loss_coeff
                + vq_f * tcfg.G_vq_loss_coeff
                + loss_adv * tcfg.G_adv_loss_coeff
            )
            return loss, (loss_re, loss_adv, bs)

        (g_loss, (g_loss_re, g_loss_adv, bstats)), out_grads = jax.value_and_grad(
            g_loss_from_outputs, argnums=(0, 1, 2), has_aux=True
        )(y_hat, commit_loss, vq_loss)
        (g_grads,) = g_vjp(out_grads)
        g_updates, g_opt = g_tx.update(g_grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        # EMA generator (validation/selection weights) — trace-time switch
        g_ema = state.g_ema
        if g_ema is not None and tcfg.g_ema_decay > 0:
            d_ = tcfg.g_ema_decay
            g_ema = jax.tree_util.tree_map(
                lambda e, p: e * d_ + p.astype(e.dtype) * (1.0 - d_),
                g_ema, g_params,
            )

        new_state = state.replace(
            g_ema=g_ema,
            step=state.step + 1,
            g_params=g_params,
            d_params=d_params,
            vq_stats=new_vq_stats,
            batch_stats=bstats,
            g_opt=g_opt,
            d_opt=d_opt,
            rng=rng,
        )
        # codebook health: fraction of codes with live EMA mass (the
        # reference has no VQ observability at all)
        cs = new_vq_stats["vqpe"]["vq"]["layers_0"]["_codebook"]["cluster_size"]
        code_usage = jnp.mean((cs > 1.0).astype(jnp.float32))
        metrics = {
            "D_loss_total": d_loss,
            "D_loss_real": d_loss_real,
            "D_loss_fake": d_loss_fake,
            "G_loss_total": g_loss,
            "G_loss_adv": g_loss_adv,
            "G_loss_re": g_loss_re,
            "G_loss_commit": commit_loss,
            "G_loss_vq": vq_loss,
            "vq_code_usage": code_usage,
        }
        return new_state, metrics

    return train_step


def make_gan_val_artifacts(
    g_cfg: MegaGConfig,
    out_dir: str,
    hifi_params=None,
    hifi_cfg=None,
):
    """Validation artifacts, mirroring reference ``trainer.py:154-188``:
    a target-vs-output mel figure per validation, plus vocoded target/output
    audio when HiFi-GAN params are provided — but written to ``out_dir``
    (and picked up by the JSONL/TensorBoard logger) instead of rank-0
    TensorBoard calls, and vocoding on-device instead of CPU."""
    import os

    import numpy as np

    from ..utils.plotting import save_spectrogram_plot

    # jit ONCE at factory time — a fresh jax.jit wrapper per validation
    # would retrace every call (minutes on the remote compiler)
    jit_eval = jax.jit(make_gan_eval_step(g_cfg))
    os.makedirs(out_dir, exist_ok=True)

    vocoder = None
    if hifi_params is not None:
        from ..models import HiFiGAN

        hifi = HiFiGAN(hifi_cfg) if hifi_cfg is not None else HiFiGAN()
        # params passed as an argument (never closed over: baked-constant
        # HLO breaks remote compilation on size)
        voc_jit = jax.jit(lambda p, mel: hifi.apply({"params": p}, mel))
        vocoder = lambda mel: voc_jit(hifi_params, mel)

    def artifact_fn(state: GANTrainState, batch: dict, step: int):
        out = jit_eval(state, batch)
        y = np.asarray(batch["mel_targets"][0], np.float32)
        y_hat = np.asarray(out["y_hat"][0], np.float32)
        save_spectrogram_plot(
            os.path.join(out_dir, f"mel_step{step}"), y.T, y_hat.T
        )
        if vocoder is not None:
            from ..utils.audio import save_wav

            wav_t = np.asarray(vocoder(jnp.asarray(y)[None]))[0]
            wav_o = np.asarray(vocoder(jnp.asarray(y_hat)[None]))[0]
            save_wav(os.path.join(out_dir, f"audio_target_step{step}.wav"), wav_t)
            save_wav(os.path.join(out_dir, f"audio_hat_step{step}.wav"), wav_o)

    return artifact_fn


def make_gan_eval_step(g_cfg: MegaGConfig):
    g = MegaG(g_cfg)

    def eval_step(state: GANTrainState, batch: dict):
        batch = _mels_to_f32(batch)
        # validate the EMA weights when they exist: checkpoint top-k then
        # selects on the smoothed generator, which is also what
        # load_generator_from_orbax exports for inference
        g_params = state.g_params if state.g_ema is None else state.g_ema
        y_hat, _, _ = g.apply(
            {"params": g_params, "vq_stats": state.vq_stats},
            batch["duration_tokens"],
            batch["phone_tokens"],
            batch["tokens_lens"],
            batch["mel_timbres"],
            batch["mel_targets"],
            train=False,
        )
        loss_re = jnp.mean(
            jnp.abs(batch["mel_targets"].astype(jnp.float32) - y_hat.astype(jnp.float32))
        )
        return {"loss_re": loss_re, "y_hat": y_hat}

    return eval_step
