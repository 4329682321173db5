"""Vocoder GAN training (HiFi-GAN or Vocos generator vs MPD+MSD).

No reference counterpart — the reference never trains a vocoder (it loads
pretrained speechbrain weights, ``models/megatts2.py:321-323``); this
trainer closes the loop so the framework's fast Vocos family
(``models/vocos.py``) and the HiFi-GAN generator can be trained from
scratch on the prepared dataset.  Recipe follows HiFi-GAN
(arXiv:2010.05646): LSGAN adversarial terms over every sub-discriminator,
feature-matching L1 (coeff 2), mel-spectrogram L1 (coeff 45), AdamW
(b1=0.8, b2=0.99) with exponential LR decay.

TPU-first: the batch is ONLY raw waveform crops — the target mel (the
generator input) and the mel-reconstruction loss are computed on-device
with the framework's own ``mel_spectrogram`` inside the one jitted,
shardable train step; D-then-G ordering reuses the saved-vjp pattern of
``gan_trainer.py`` (one generator forward per step).
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from .. import HIFIGAN_HOP_LENGTH
from ..config import VocoderTrainConfig, WaveDiscConfig
from ..models.megatts import vocode
from ..models.wave_dscrm import WaveDiscriminator
from ..ops.mel import mel_spectrogram


class VocoderTrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    g_params: Any
    d_params: Any
    g_opt: Any
    d_opt: Any
    rng: jax.Array


def _make_tx(tcfg: VocoderTrainConfig) -> optax.GradientTransformation:
    sched = optax.exponential_decay(
        tcfg.initial_learning_rate,
        transition_steps=tcfg.lr_decay_steps,
        decay_rate=tcfg.lr_decay,
    )
    return optax.adamw(sched, b1=tcfg.adam_b1, b2=tcfg.adam_b2)


def create_vocoder_state(
    rng: jax.Array,
    voc_cfg,  # HiFiGANConfig | VocosConfig
    d_cfg: WaveDiscConfig,
    tcfg: VocoderTrainConfig,
    example_batch: dict,
) -> Tuple[VocoderTrainState, optax.GradientTransformation, optax.GradientTransformation]:
    g_rng, d_rng, state_rng = jax.random.split(rng, 3)
    T = tcfg.segment_frames
    mel0 = jnp.zeros((example_batch["wav"].shape[0], T, 80), jnp.float32)

    def g_init(r):
        return vocode_init(voc_cfg, r, mel0)

    g_params = jax.jit(g_init)(g_rng)
    d = WaveDiscriminator(d_cfg)
    d_params = jax.jit(d.init)(d_rng, jnp.asarray(example_batch["wav"], jnp.float32))[
        "params"
    ]
    g_tx, d_tx = _make_tx(tcfg), _make_tx(tcfg)
    state = VocoderTrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_params,
        d_params=d_params,
        g_opt=g_tx.init(g_params),
        d_opt=d_tx.init(d_params),
        rng=state_rng,
    )
    return state, g_tx, d_tx


def vocode_init(voc_cfg, rng, mel):
    """Init params of whichever vocoder family ``voc_cfg`` selects."""
    from ..config import VocosConfig
    from ..models.hifigan import HiFiGAN
    from ..models.vocos import Vocos

    model = Vocos(voc_cfg) if isinstance(voc_cfg, VocosConfig) else HiFiGAN(voc_cfg)
    return model.init(rng, mel)["params"]


def make_vocoder_train_step(
    voc_cfg,
    d_cfg: WaveDiscConfig,
    tcfg: VocoderTrainConfig,
    g_tx: optax.GradientTransformation,
    d_tx: optax.GradientTransformation,
):
    dtype = jnp.bfloat16 if tcfg.train_dtype == "bfloat16" else jnp.float32
    d = WaveDiscriminator(d_cfg, dtype=dtype)
    T = tcfg.segment_frames

    def train_step(state: VocoderTrainState, batch: dict):
        rng = jax.random.fold_in(state.rng, state.step)
        wav = batch["wav"].astype(jnp.float32)  # (B, T*hop)
        mel = mel_spectrogram(wav)[:, :T]  # on-device target/input mel

        def g_forward(g_params):
            return vocode(g_params, voc_cfg, mel, dtype).astype(jnp.float32)

        y_hat, g_vjp = jax.vjp(g_forward, state.g_params)

        def d_apply(params, w):
            logits, feats = d.apply({"params": params}, w)
            return [l.astype(jnp.float32) for l in logits], feats

        # --- D update on detached fake -----------------------------------
        def d_loss_fn(d_params):
            lr_, _ = d_apply(d_params, wav)
            lf_, _ = d_apply(d_params, jax.lax.stop_gradient(y_hat))
            loss = sum(
                jnp.mean((1.0 - r) ** 2) + jnp.mean(f**2) for r, f in zip(lr_, lf_)
            )
            return loss

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state.d_params)
        d_updates, d_opt = d_tx.update(d_grads, state.d_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        # --- G update against the UPDATED discriminator ------------------
        def g_loss_from_out(y_hat_f):
            _, f_real = d_apply(d_params, wav)
            lf_, f_fake = d_apply(d_params, y_hat_f)
            loss_adv = sum(jnp.mean((1.0 - l) ** 2) for l in lf_)
            loss_fm = sum(
                jnp.mean(jnp.abs(fr.astype(jnp.float32) - ff.astype(jnp.float32)))
                for frs, ffs in zip(f_real, f_fake)
                for fr, ff in zip(frs, ffs)
            )
            mel_hat = mel_spectrogram(y_hat_f)[:, :T]
            loss_mel = jnp.mean(jnp.abs(mel - mel_hat))
            loss = (
                loss_adv
                + tcfg.fm_loss_coeff * loss_fm
                + tcfg.mel_loss_coeff * loss_mel
            )
            return loss, (loss_adv, loss_fm, loss_mel)

        (g_loss, (loss_adv, loss_fm, loss_mel)), out_grad = jax.value_and_grad(
            g_loss_from_out, has_aux=True
        )(y_hat)
        (g_grads,) = g_vjp(out_grad)
        g_updates, g_opt = g_tx.update(g_grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        new_state = state.replace(
            step=state.step + 1,
            g_params=g_params,
            d_params=d_params,
            g_opt=g_opt,
            d_opt=d_opt,
            rng=rng,
        )
        metrics = {
            "D_loss_total": d_loss,
            "G_loss_total": g_loss,
            "G_loss_adv": loss_adv,
            "G_loss_fm": loss_fm,
            "G_loss_mel": loss_mel,
            "loss": loss_mel,  # monitored val-style scalar
        }
        return new_state, metrics

    return train_step


def make_vocoder_eval_step(voc_cfg, tcfg: VocoderTrainConfig):
    T = tcfg.segment_frames

    def eval_step(state: VocoderTrainState, batch: dict):
        wav = batch["wav"].astype(jnp.float32)
        mel = mel_spectrogram(wav)[:, :T]
        y_hat = vocode(state.g_params, voc_cfg, mel, jnp.float32)
        mel_hat = mel_spectrogram(y_hat)[:, :T]
        return {
            "loss": jnp.mean(jnp.abs(mel - mel_hat)),
            "y_hat": y_hat,
        }

    return eval_step
