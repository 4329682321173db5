#!/usr/bin/env python
"""Training-step throughput benchmark (reference-size models).

Prints one JSON line per stage with steps/sec (+ MFU where FLOPs are
modeled) for synthetic batches shaped like the production configs.
Not the driver headline metric (that's bench.py synthesis RTF) — used to
track training perf across rounds.

    python tools/bench_train.py [batch] [--stages gan,plm,adm,vocoder]
"""
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def _timed_steps(step, state, batch, iters=10):
    # commit the batch to device FIRST: on the axon tunnel a numpy batch
    # re-uploads per call (~25 MB at tunnel bandwidth swamps the step);
    # the real train loop overlaps uploads with compute via async dispatch
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    state, m = step(state, batch)  # compile
    jax.block_until_ready(m)
    {k: float(np.asarray(v)) for k, v in m.items()}
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch)
    jax.block_until_ready(m)
    {k: float(np.asarray(v)) for k, v in m.items()}
    return (time.perf_counter() - t0) / iters


def bench_lm(which: str, B: int):
    from megatts2_tpu.config import MegaADMConfig, MegaPLMConfig, TrainConfig
    from megatts2_tpu.training import (
        create_adm_state,
        create_plm_state,
        make_adm_train_step,
        make_plm_train_step,
    )

    tcfg = TrainConfig(train_dtype="bfloat16", max_steps=100_000)
    rng = np.random.RandomState(0)
    if which == "plm":
        cfg = MegaPLMConfig()
        L = 1024  # multi-utterance prompt-prefix scale
        batch = {
            "p_codes": rng.randint(0, cfg.vq_bins, (B, L + 1)).astype(np.int32),
            "tc_latents": rng.randn(B, L, cfg.tc_latent_dim).astype(np.float32),
            "lens": np.full((B,), L, np.int32),
        }
        state, tx = create_plm_state(jax.random.PRNGKey(0), cfg, tcfg, batch)
        step_fn, _ = make_plm_train_step(cfg, tcfg, tx)
        tokens = B * L
    else:
        cfg = MegaADMConfig(tc_emb_dim=512)
        T = 64
        batch = {
            "tc_latents": rng.randn(B, T, cfg.tc_latent_dim).astype(np.float32),
            "duration_tokens": np.concatenate(
                [np.zeros((B, 1, 1), np.float32),
                 rng.randint(1, 9, (B, T, 1)).astype(np.float32)], axis=1),
            "lens": np.full((B,), T, np.int32),
        }
        state, tx = create_adm_state(jax.random.PRNGKey(0), cfg, tcfg, batch)
        step_fn, _ = make_adm_train_step(cfg, tcfg, tx)
        tokens = B * T
    step = jax.jit(step_fn, donate_argnums=(0,))
    dt = _timed_steps(step, state, batch)
    print(json.dumps({
        "metric": f"{which}_train_steps_per_sec", "value": round(1.0 / dt, 3),
        "unit": "steps/s",
        "detail": {"batch": B, "tokens_per_sec": round(tokens / dt, 1),
                   "step_ms": round(dt * 1000, 2),
                   "device": str(jax.devices()[0])},
    }), flush=True)


def bench_vocoder(B: int):
    from megatts2_tpu.config import VocoderTrainConfig, VocosConfig, WaveDiscConfig
    from megatts2_tpu.training import create_vocoder_state, make_vocoder_train_step

    tcfg = VocoderTrainConfig(train_dtype="bfloat16")
    voc_cfg, d_cfg = VocosConfig(), WaveDiscConfig()
    rng = np.random.RandomState(0)
    batch = {"wav": rng.randn(B, tcfg.segment_frames * 256).astype(np.float32)}
    state, g_tx, d_tx = create_vocoder_state(
        jax.random.PRNGKey(0), voc_cfg, d_cfg, tcfg, batch
    )
    step = jax.jit(
        make_vocoder_train_step(voc_cfg, d_cfg, tcfg, g_tx, d_tx),
        donate_argnums=(0,),
    )
    dt = _timed_steps(step, state, batch)
    print(json.dumps({
        "metric": "vocoder_train_steps_per_sec", "value": round(1.0 / dt, 3),
        "unit": "steps/s",
        "detail": {"batch": B,
                   "audio_sec_per_sec": round(B * tcfg.segment_frames * 256 / 16000 / dt, 1),
                   "step_ms": round(dt * 1000, 2),
                   "device": str(jax.devices()[0])},
    }), flush=True)


def main():
    from megatts2_tpu import enable_compilation_cache

    enable_compilation_cache()
    from megatts2_tpu.config import DiscriminatorConfig, MegaGConfig, TrainConfig
    from megatts2_tpu.training import create_gan_state, make_gan_train_step

    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("batch", type=int, nargs="?", default=8)
    ap.add_argument("--stages", default="gan",
                    help="comma list from {gan,plm,adm,vocoder}")
    args = ap.parse_args()
    stages = args.stages.split(",")
    B = args.batch
    for s in stages:
        if s == "plm" or s == "adm":
            bench_lm(s, B)
        elif s == "vocoder":
            bench_vocoder(B)
    if "gan" not in stages:
        return
    Tm = 512  # mel frames (~8 s utterances)
    Tp = 64
    Tt = 512  # timbre prompt frames

    g_cfg = MegaGConfig()
    d_cfg = DiscriminatorConfig()
    tcfg = TrainConfig(train_dtype="bfloat16", max_steps=600_000)

    rng = np.random.RandomState(0)
    batch = {
        "duration_tokens": rng.randint(1, 9, (B, Tp)).astype(np.int32),
        "phone_tokens": rng.randint(0, 320, (B, Tp)).astype(np.int32),
        "tokens_lens": np.full((B,), Tp, np.int32),
        "mel_timbres": rng.randn(B, Tt, 80).astype(np.float32),
        "mel_targets": rng.randn(B, Tm, 80).astype(np.float32),
        "mel_target_lens": np.full((B,), Tm, np.int32),
    }
    state, g_tx, d_tx = create_gan_state(jax.random.PRNGKey(0), g_cfg, d_cfg, tcfg, batch)
    step = jax.jit(make_gan_train_step(g_cfg, d_cfg, tcfg, g_tx, d_tx), donate_argnums=(0,))

    # device-committed batch (see _timed_steps: numpy re-uploads per call)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    state, m = step(state, batch)  # compile
    jax.block_until_ready(m["G_loss_total"])
    float(m["G_loss_total"])
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch)
    jax.block_until_ready(m["G_loss_total"])
    float(m["G_loss_total"])
    dt = (time.perf_counter() - t0) / iters

    from megatts2_tpu.utils.flops import PEAK_FLOPS, gan_step_flops

    fl = gan_step_flops(g_cfg, B, Tp, Tm, Tt)
    print(
        json.dumps(
            {
                "metric": "gan_train_steps_per_sec",
                "value": round(1.0 / dt, 3),
                "unit": "steps/s",
                "detail": {
                    "batch": B,
                    "mel_frames_per_sec": round(B * Tm / dt, 1),
                    "step_ms": round(dt * 1000, 2),
                    "gflop_per_step": round(fl / 1e9, 1),
                    "mfu": round(fl / dt / PEAK_FLOPS["bf16"], 4),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
