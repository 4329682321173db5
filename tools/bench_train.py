#!/usr/bin/env python
"""Training-step throughput benchmark (GAN stage, reference-size models).

Prints one JSON line with steps/sec and mel-frames/sec for a synthetic
batch shaped like the production config (B utterances, bucketed lengths).
Not the driver headline metric (that's bench.py synthesis RTF) — used to
track training perf across rounds.
"""
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from megatts2_tpu import enable_compilation_cache

    enable_compilation_cache()
    from megatts2_tpu.config import DiscriminatorConfig, MegaGConfig, TrainConfig
    from megatts2_tpu.training import create_gan_state, make_gan_train_step

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
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
