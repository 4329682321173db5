#!/usr/bin/env python
"""Per-op device profile of the TRAINING steps (round-3 verdict #7: the
GAN 48.4 ms and vocoder 128 ms steps never got the per-op treatment the
decode path did in tools/profile_decode.py).

Builds the same reference-size synthetic steps as tools/bench_train.py,
captures a jax.profiler trace of a few warm steps, and prints the top
device ops by total self time — identifies the top wall items so each can
be fixed or measured-and-declined with numbers.

    python tools/profile_train.py gan [trace_dir]
    python tools/profile_train.py vocoder
"""
import collections
import glob
import json
import os
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from megatts2_tpu import enable_compilation_cache

enable_compilation_cache()


def build_gan_step(B=8, Tm=512, Tp=64, Tt=512):
    from megatts2_tpu.config import DiscriminatorConfig, MegaGConfig, TrainConfig
    from megatts2_tpu.training import create_gan_state, make_gan_train_step

    g_cfg, d_cfg = MegaGConfig(), DiscriminatorConfig()
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
    step = jax.jit(make_gan_train_step(g_cfg, d_cfg, tcfg, g_tx, d_tx),
                   donate_argnums=(0,))
    return step, state, batch, "G_loss_total"


def build_vocoder_step(B=8):
    from megatts2_tpu.config import VocoderTrainConfig, VocosConfig, WaveDiscConfig
    from megatts2_tpu.training import create_vocoder_state, make_vocoder_train_step

    tcfg = VocoderTrainConfig(train_dtype="bfloat16")
    voc_cfg, d_cfg = VocosConfig(), WaveDiscConfig()
    rng = np.random.RandomState(0)
    batch = {"wav": rng.randn(B, tcfg.segment_frames * 256).astype(np.float32)}
    state, g_tx, d_tx = create_vocoder_state(
        jax.random.PRNGKey(0), voc_cfg, d_cfg, tcfg, batch
    )
    step = jax.jit(make_vocoder_train_step(voc_cfg, d_cfg, tcfg, g_tx, d_tx),
                   donate_argnums=(0,))
    return step, state, batch, "G_loss_total"


def build_plm_step(B=8, L=1024):
    from megatts2_tpu.config import MegaPLMConfig, TrainConfig
    from megatts2_tpu.training import create_plm_state, make_plm_train_step

    cfg = MegaPLMConfig()
    tcfg = TrainConfig(train_dtype="bfloat16", max_steps=100_000)
    rng = np.random.RandomState(0)
    batch = {
        "p_codes": rng.randint(0, cfg.vq_bins, (B, L + 1)).astype(np.int32),
        "tc_latents": rng.randn(B, L, cfg.tc_latent_dim).astype(np.float32),
        "lens": np.full((B,), L, np.int32),
    }
    state, tx = create_plm_state(jax.random.PRNGKey(0), cfg, tcfg, batch)
    step_fn, _ = make_plm_train_step(cfg, tcfg, tx)
    return jax.jit(step_fn, donate_argnums=(0,)), state, batch, "loss"


def summarize(trace_dir: str, top: int = 40) -> None:
    from jax.profiler import ProfileData

    files = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                             recursive=True))
    assert files, f"no xplane under {trace_dir}"
    pd = ProfileData.from_serialized_xspace(open(files[-1], "rb").read())
    for plane in pd.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        tot = collections.Counter()
        cnt = collections.Counter()
        for line in plane.lines:
            for ev in line.events:
                tot[ev.name] += ev.duration_ns
                cnt[ev.name] += 1
        total = sum(tot.values())
        print(json.dumps({"plane": plane.name, "total_ms": round(total / 1e6, 3)}))
        for name, ns in tot.most_common(top):
            print(json.dumps({
                "op": name[:140], "ms": round(ns / 1e6, 3),
                "count": cnt[name],
                "pct": round(100 * ns / max(total, 1), 1),
            }))


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "gan"
    trace_dir = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/train_trace_{stage}"
    step, state, batch, key = {
        "gan": build_gan_step,
        "vocoder": build_vocoder_step,
        "plm": build_plm_step,
    }[stage]()
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    state, m = step(state, batch)  # compile
    jax.block_until_ready(m[key])
    state, m = step(state, batch)  # warm
    jax.block_until_ready(m[key])

    jax.profiler.start_trace(trace_dir)
    for _ in range(3):
        state, m = step(state, batch)
    jax.block_until_ready(m[key])
    jax.profiler.stop_trace()
    summarize(trace_dir)


if __name__ == "__main__":
    main()
