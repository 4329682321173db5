"""Benchmark: zero-shot synthesis RTF / throughput on the available device.

Runs the full-size (reference-config) synthesis cascade — MRTE tc_latent,
KV-cached ADM + PLM scan decodes, VQ decode, ConvNet mel decoder, vocoder —
batched, with random weights (perf is weight-independent), and reports the
realtime factor per utterance.

The headline is the fastest PRODUCTION configuration of the framework:
int8 weight-only PLM decode + the Vocos iSTFT vocoder (models/vocos.py,
~23x fewer vocoder FLOPs; trainable in-repo via the cli 'vocoder' stage).
The detail block also carries the HiFi-GAN-vocoder cascade RTF
(``rtf_hifigan_int8`` — the reference-parity vocoder, comparable with
round-1 numbers) and the transparent accounting alternates.

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
    VocosConfig,
)
from megatts2_tpu.models import HiFiGAN, MegaADM, MegaG, MegaPLM, Vocos
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
    vocos_cfg = VocosConfig()

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
    vocos_vars = jax.jit(Vocos(vocos_cfg).init)(key, jnp.zeros((1, 16, 80)))

    # bf16 param storage: the AR decodes are weight-HBM-bound.  The PLM
    # goes one further — int8 weight-only kernels (production serving mode,
    # 53→33 ms standalone; BENCHMARKS.md "Int8 weight-only decode").
    from megatts2_tpu.quantization.weight_only import quantize_tree

    cast = lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t
    )
    g_params = cast(g_vars["params"])
    vq_stats = g_vars["vq_stats"]
    plm_params = quantize_tree(plm_vars["params"])
    adm_params = cast(adm_vars["params"])
    hifi_params = cast(hifi_vars["params"])
    vocos_params = cast(vocos_vars["params"])

    rng = np.random.RandomState(0)
    phones = jnp.asarray(rng.randint(1, 320, (B, Tp)), jnp.int32)
    lens = jnp.full((B,), Tp, jnp.int32)
    mels = jnp.asarray(rng.randn(B, Tm, 80).astype(np.float32))

    def make_run(voc_cfg, voc_params):
        def run():
            wav, mel_hat, n_frames = synthesize(
                {"params": g_params, "vq_stats": vq_stats},
                plm_params, adm_params, voc_params,
                g_cfg, plm_cfg, adm_cfg, voc_cfg,
                phones, lens, mels, max_frames=max_frames, dtype=jnp.bfloat16,
                quant=True,
            )
            jax.block_until_ready(wav)
            # force completion via a tiny host transfer — block_until_ready
            # alone has proven unreliable on the experimental axon platform
            np.asarray(wav[:, -1])
            return wav, n_frames

        return run

    def timed(run, iters=5):
        """Per-iteration MIN (plus mean for round-1 comparability): each
        sequential batch pays a tunnel round trip whose latency jitters by
        tens of ms run-to-run on this target; min-of-N is the standard
        latency-benchmark answer (the pipelined measurement below is
        jitter-free by construction and tracks device compute)."""
        wav, n_frames = run()  # compile + warmup
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            wav, n_frames = run()
            times.append(time.perf_counter() - t0)
        return min(times), sum(times) / len(times), n_frames

    def timed_pipelined(voc_cfg, voc_params, iters=5, b=None, warm=False):
        """Throughput accounting: dispatch every batch before syncing —
        device batches execute back-to-back and the ~75 ms tunnel round
        trip on this target is paid once, not per batch (what a pipelined
        server, e.g. the continuous engine, actually achieves).  ``b``
        overrides the batch size (the AR decodes are weight-HBM-bound, so
        larger offline batches amortize the same per-step weight stream —
        measured B=8 → 270, B=32 → 376 utt/s on one v5e chip)."""
        if b is None:
            ph, ln, ml = phones, lens, mels
        else:
            ph = jnp.asarray(rng.randint(1, 320, (b, Tp)), jnp.int32)
            ln = jnp.full((b,), Tp, jnp.int32)
            ml = jnp.asarray(rng.randn(b, Tm, 80).astype(np.float32))
        outs = []
        for it in range(iters + (1 if warm else 0)):
            if warm and it == 1:
                np.asarray(outs[-1][:, -1])  # compile barrier before timing
                outs = []
                t0 = time.perf_counter()
            elif it == 0 and not warm:
                t0 = time.perf_counter()
            wav, _, _ = synthesize(
                {"params": g_params, "vq_stats": vq_stats},
                plm_params, adm_params, voc_params,
                g_cfg, plm_cfg, adm_cfg, voc_cfg,
                ph, ln, ml, max_frames=max_frames, dtype=jnp.bfloat16,
                quant=True,
            )
            outs.append(wav)
        np.asarray(outs[-1][:, -1])  # one sync for the whole chain
        return (time.perf_counter() - t0) / iters

    dt_hifi, dt_hifi_mean, _ = timed(make_run(hifi_cfg, hifi_params))
    dt, dt_mean, n_frames = timed(make_run(vocos_cfg, vocos_params))
    dt_pipe = timed_pipelined(vocos_cfg, vocos_params)
    B_BULK = 32  # offline bulk-serving batch (same per-step weight stream)
    dt_pipe_bulk = timed_pipelined(vocos_cfg, vocos_params, b=B_BULK, warm=True)

    gen_audio_s = float(np.asarray(n_frames).sum()) * HIFIGAN_HOP_LENGTH / HIFIGAN_SR
    budget_audio_s = B * max_frames * HIFIGAN_HOP_LENGTH / HIFIGAN_SR
    # conservative accounting (unchanged since r1 for comparability): if the
    # random-weight duration model collapses, count only HALF the padded
    # budget as audio even though the device computes ALL of it.  detail
    # carries the transparent alternates: rtf_padded_budget (compute per
    # padded audio-second actually computed) and rtf_generated_raw.
    audio_seconds = max(gen_audio_s, budget_audio_s * 0.5)
    rtf = dt / (audio_seconds / B)  # compute seconds per second of ONE utt
    rtf_hifi = dt_hifi / (audio_seconds / B)

    from megatts2_tpu.utils.flops import PEAK_FLOPS, synthesis_flops

    fl = synthesis_flops(g_cfg, plm_cfg, adm_cfg, vocos_cfg, B, Tp, Tm, max_frames)
    print(
        json.dumps(
            {
                "metric": "synthesis_rtf",
                "value": round(rtf, 5),
                "unit": "rtf(s_compute/s_audio)",
                "vs_baseline": round(TARGET_RTF / rtf, 3),
                # the headline config/statistic changed in round 2 (advisor
                # note): round 1 measured mean-of-5 with the HiFi-GAN
                # vocoder; cross-round-comparable figure is
                # detail.rtf_r1_method (same config+statistic as round 1).
                "methodology": "min-of-5 sequential batches, int8 PLM, "
                "Vocos vocoder (fastest production config)",
                "detail": {
                    "batch": B,
                    "batch_wall_s": round(dt, 4),
                    "audio_s_total": round(audio_seconds, 2),
                    "utt_per_sec_single_chip": round(B / dt, 3),
                    "utt_per_sec_pipelined": round(B / dt_pipe, 3),
                    "rtf_pipelined": round(dt_pipe / (audio_seconds / B), 5),
                    "utt_per_sec_pipelined_b32": round(B_BULK / dt_pipe_bulk, 3),
                    "rtf_pipelined_b32": round(
                        dt_pipe_bulk / B_BULK / (audio_seconds / B), 5
                    ),
                    "rtf_padded_budget": round(dt / (budget_audio_s / B), 5),
                    "rtf_generated_raw": round(dt / max(gen_audio_s / B, 1e-9), 5),
                    "rtf_hifigan_int8": round(rtf_hifi, 5),
                    "rtf_r1_method": round(dt_hifi_mean / (audio_seconds / B), 5),
                    "rtf_mean5": round(dt_mean / (audio_seconds / B), 5),
                    "gflop_per_batch": round(fl["total"] / 1e9, 1),
                    "mfu": round(fl["total"] / dt / PEAK_FLOPS["bf16"], 4),
                    "plm_quant_int8": True,
                    "vocoder": "vocos",
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
