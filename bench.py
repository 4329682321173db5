"""Benchmark: zero-shot synthesis RTF / throughput on the available device.

Runs the full-size (reference-config) synthesis cascade — MRTE tc_latent,
KV-cached ADM + PLM scan decodes, VQ decode, ConvNet mel decoder, HiFi-GAN
vocoder — batched, with random weights (perf is weight-independent), and
reports the realtime factor per utterance.

Prints ONE JSON line:
  {"metric": "synthesis_rtf", "value": <rtf>, "unit": "rtf(s_compute/s_audio)",
   "vs_baseline": <target_rtf / measured_rtf>}   (>1 = beating the 0.05 target)
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from megatts2_tpu import HIFIGAN_HOP_LENGTH, HIFIGAN_SR
from megatts2_tpu.config import (
    HiFiGANConfig,
    MegaADMConfig,
    MegaGConfig,
    MegaPLMConfig,
)
from megatts2_tpu.models import HiFiGAN, MegaADM, MegaG, MegaPLM
from megatts2_tpu.models.megatts import synthesize

TARGET_RTF = 0.05  # BASELINE.json north-star (v5e-8)


def main():
    from megatts2_tpu import enable_compilation_cache

    enable_compilation_cache()
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    max_frames = 512  # ~8.2 s of audio per utterance
    Tp = 64  # phones
    Tm = 512  # prompt mel frames (~8 s prompt)

    g_cfg = MegaGConfig()
    plm_cfg = MegaPLMConfig()
    adm_cfg = MegaADMConfig(tc_emb_dim=512)  # reference config_adm.yaml
    hifi_cfg = HiFiGANConfig()

    key = jax.random.PRNGKey(0)
    g = MegaG(g_cfg)
    g_vars = jax.jit(g.init)(
        {"params": key, "vq": key},
        jnp.ones((1, Tp), jnp.int32), jnp.zeros((1, Tp), jnp.int32),
        jnp.asarray([Tp]), jnp.zeros((1, 128, 80)), jnp.zeros((1, 128, 80)),
    )
    plm_vars = jax.jit(MegaPLM(plm_cfg).init)(
        key, jnp.zeros((1, 4, plm_cfg.tc_latent_dim)), jnp.zeros((1, 5), jnp.int32),
        jnp.asarray([4]),
    )
    adm_vars = jax.jit(MegaADM(adm_cfg).init)(
        key, jnp.zeros((1, 4, adm_cfg.tc_latent_dim)), jnp.zeros((1, 5, 1)),
        jnp.asarray([4]),
    )
    hifi_vars = jax.jit(HiFiGAN(hifi_cfg).init)(key, jnp.zeros((1, 16, 80)))

    # bf16 param storage: the AR decodes are weight-HBM-bound.  The PLM
    # goes one further — int8 weight-only kernels (production serving mode,
    # 53→33 ms standalone; BENCHMARKS.md "Int8 weight-only decode").
    from megatts2_tpu.quantization.weight_only import quantize_tree

    cast = lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t
    )
    g_vars = {"params": cast(g_vars["params"]), "vq_stats": g_vars["vq_stats"]}
    plm_vars = {"params": quantize_tree(plm_vars["params"])}
    adm_vars = {"params": cast(adm_vars["params"])}
    hifi_vars = {"params": cast(hifi_vars["params"])}

    rng = np.random.RandomState(0)
    phones = jnp.asarray(rng.randint(1, 320, (B, Tp)), jnp.int32)
    lens = jnp.full((B,), Tp, jnp.int32)
    mels = jnp.asarray(rng.randn(B, Tm, 80).astype(np.float32))

    def run():
        wav, mel_hat, n_frames = synthesize(
            {"params": g_vars["params"], "vq_stats": g_vars["vq_stats"]},
            plm_vars["params"], adm_vars["params"], hifi_vars["params"],
            g_cfg, plm_cfg, adm_cfg, hifi_cfg,
            phones, lens, mels, max_frames=max_frames, dtype=jnp.bfloat16,
            quant=True,
        )
        jax.block_until_ready(wav)
        # force completion via a tiny host transfer — block_until_ready alone
        # has proven unreliable on the experimental axon platform
        np.asarray(wav[:, -1])
        return wav, n_frames

    # compile + warmup
    wav, n_frames = run()
    # timed runs
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        wav, n_frames = run()
    dt = (time.perf_counter() - t0) / iters

    gen_audio_s = float(np.asarray(n_frames).sum()) * HIFIGAN_HOP_LENGTH / HIFIGAN_SR
    budget_audio_s = B * max_frames * HIFIGAN_HOP_LENGTH / HIFIGAN_SR
    # conservative accounting (unchanged since r1 for comparability): if the
    # random-weight duration model collapses, count only HALF the padded
    # budget as audio even though the device computes ALL of it.  detail
    # carries the transparent alternates: rtf_padded_budget (compute per
    # padded audio-second actually computed) and rtf_generated_raw.
    audio_seconds = max(gen_audio_s, budget_audio_s * 0.5)
    rtf = dt / (audio_seconds / B)  # compute seconds per second of ONE utt

    from megatts2_tpu.utils.flops import PEAK_FLOPS, synthesis_flops

    fl = synthesis_flops(g_cfg, plm_cfg, adm_cfg, hifi_cfg, B, Tp, Tm, max_frames)
    print(
        json.dumps(
            {
                "metric": "synthesis_rtf",
                "value": round(rtf, 5),
                "unit": "rtf(s_compute/s_audio)",
                "vs_baseline": round(TARGET_RTF / rtf, 3),
                "detail": {
                    "batch": B,
                    "batch_wall_s": round(dt, 4),
                    "audio_s_total": round(audio_seconds, 2),
                    "utt_per_sec_single_chip": round(B / dt, 3),
                    "rtf_padded_budget": round(dt / (budget_audio_s / B), 5),
                    "rtf_generated_raw": round(dt / max(gen_audio_s / B, 1e-9), 5),
                    "gflop_per_batch": round(fl["total"] / 1e9, 1),
                    "mfu": round(fl["total"] / dt / PEAK_FLOPS["bf16"], 4),
                    "plm_quant_int8": True,
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
