#!/usr/bin/env python
"""Input-pipeline benchmark at corpus scale (round-2 verdict item 4).

Generates a synthetic corpus of ``--n_speakers × --n_per_spk`` utterances
(default 50×200 = 10k utts, ~8.9 h of audio), drives the REAL offline
pipeline (``prepare_ds`` stages 0+1) through its public API, then
benchmarks the training-side input path:

* stage-0/1 throughput (files/s) at each ``--workers`` setting;
* ``GANBatchBuilder`` batches/s — native C++ prefetch ring vs pure numpy;
* (``--gan_steps N``) loader-fed FULL-SIZE GAN train steps/s on the
  device, i.e. whether this host can keep the measured device-bound
  step rate fed.

Prints one JSON line per measurement.  Reference counterpart:
``prepare_ds.py:211-217`` + ``modules/datamodule.py:346-376`` (lhotse
DynamicBucketingSampler + HDF5 workers — never benchmarked there).

    python tools/bench_input_pipeline.py --root /tmp/pipe10k \\
        --n_speakers 50 --n_per_spk 200 --workers 1,2,4 --gan_steps 60
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def build_corpus(root: str, n_speakers: int, n_per_spk: int, seed: int = 0,
                 dur_s: float = 3.2) -> tuple:
    """Harmonic-stack corpus (train_curve.build_corpus at scale): speaker
    f0s spread over 85–300 Hz, constant duration (one jit shape)."""
    from megatts2_tpu.utils.audio import save_wav

    wavs = os.path.join(root, "wavs")
    tgs = os.path.join(root, "textgrids")
    ds = os.path.join(root, "ds")
    os.makedirs(ds, exist_ok=True)
    words = ["hello", "world", "nice", "day", "of", "speech"]
    rng = np.random.RandomState(seed)
    sr = 16000
    n = int(dur_s * sr)
    t = np.arange(n) / sr
    t0 = time.time()
    total = 0
    for spk_i in range(n_speakers):
        spk = f"spk{spk_i:03d}"
        os.makedirs(os.path.join(wavs, spk), exist_ok=True)
        os.makedirs(os.path.join(tgs, spk), exist_ok=True)
        f0_base = 85.0 * (300.0 / 85.0) ** (spk_i / max(n_speakers - 1, 1))
        seg = dur_s / len(words)
        iv = "".join(
            f"""        intervals [{j+1}]:
            xmin = {j*seg}
            xmax = {(j+1)*seg}
            text = "{w}"
"""
            for j, w in enumerate(words)
        )
        tg_body = (
            'File type = "ooTextFile"\nObject class = "TextGrid"\n'
            f"xmin = 0\nxmax = {dur_s}\ntiers? <exists>\nsize = 1\nitem []:\n"
            "    item [1]:\n"
            '        class = "IntervalTier"\n        name = "phones"\n'
            f"        xmin = 0\n        xmax = {dur_s}\n"
            f"        intervals: size = {len(words)}\n" + iv
        )
        # Per-speaker FORMANT envelope (two resonance peaks, positions
        # deterministic and low-discrepancy-spread over speakers): in the
        # Mega-TTS2 factorization pitch is PROSODY (carried by the VQ
        # codes / PLM), while timbre is the SPECTRAL ENVELOPE (carried by
        # MRTE) — speakers that differ only by f0 cannot demonstrate
        # timbre transfer (arXiv:2307.07218 §2; learned the hard way in
        # the round-3 8-speaker drive, BENCHMARKS.md).  Formants give
        # each speaker a pitch-independent spectral identity.
        F1 = 300.0 + 550.0 * ((spk_i * 0.6180339887) % 1.0)
        F2 = 1200.0 + 1800.0 * ((spk_i * 0.3819660113 + 0.25) % 1.0)

        def env(f):
            return (0.08 + np.exp(-((f - F1) ** 2) / (2 * 140.0 ** 2))
                    + 0.8 * np.exp(-((f - F2) ** 2) / (2 * 260.0 ** 2)))

        for i in range(n_per_spk):
            f0 = f0_base * (1 + 0.05 * rng.rand())
            n_harm = max(3, int(3800.0 / f0))
            y = sum(
                (env(h * f0) / np.sqrt(h))
                * np.sin(2 * np.pi * f0 * h * t + rng.rand() * 6.28)
                for h in range(1, n_harm + 1)
            )
            y *= 0.5 + 0.5 * np.sin(2 * np.pi * (2 + rng.rand()) * t) ** 2
            y = (y + 0.01 * rng.randn(n)).astype(np.float32)
            y /= np.abs(y).max() + 1e-6
            uid = f"{spk}_u{i}"
            save_wav(os.path.join(wavs, spk, uid + ".wav"), y)
            open(os.path.join(wavs, spk, uid + ".txt"), "w").write(" ".join(words))
            open(os.path.join(tgs, spk, uid + ".TextGrid"), "w").write(tg_body)
            total += 1
    dt = time.time() - t0
    print(json.dumps({
        "bench": "corpus_gen", "utterances": total,
        "audio_hours": round(total * dur_s / 3600, 2),
        "wall_s": round(dt, 1), "files_per_s": round(total / dt, 1),
    }), flush=True)
    return wavs, tgs, ds


def run_stage(stage: int, wavs: str, tgs: str, ds: str, workers: int,
              n_files: int, generator_ckpt: str = "") -> None:
    from megatts2_tpu.prepare_ds import main as prep_main

    argv = [
        "--stage", str(stage), "--wavtxt_path", wavs, "--text_grid_path", tgs,
        "--ds_path", ds, "--num_workers", str(workers),
    ]
    if generator_ckpt:
        argv += ["--generator_ckpt", generator_ckpt,
                 "--generator_config", "configs/config_gan.yaml"]
    t0 = time.time()
    prep_main(argv)
    dt = time.time() - t0
    print(json.dumps({
        "bench": f"prepare_ds_stage{stage}", "workers": workers,
        "files": n_files, "wall_s": round(dt, 1),
        "files_per_s": round(n_files / dt, 1),
    }), flush=True)


def bench_loader(ds: str, n_batches: int = 50) -> None:
    """GANBatchBuilder batches/s: native prefetch ring vs pure numpy."""
    from megatts2_tpu.data import CutManifest, DataLoader, DurationBucketSampler
    from megatts2_tpu.data.datasets import GANBatchBuilder

    manifest = CutManifest.load(os.path.join(ds, "cuts_train.jsonl.gz"))
    for use_native in (True, False):
        builder = GANBatchBuilder(manifest, ds, use_native=use_native)
        native_ok = builder.native is not None
        sampler = DurationBucketSampler(
            manifest, max_duration_batch=8 * 3.2 + 0.1, num_buckets=1, seed=0
        )
        loader = DataLoader(sampler, builder, prefetch=2)
        it = iter(loader)
        batch = next(it)  # warm (mmap open, ring alloc)
        nbytes = sum(v.nbytes for v in batch.values())
        t0 = time.time()
        got = 0
        for batch in it:
            got += 1
            if got >= n_batches:
                break
        dt = time.time() - t0
        print(json.dumps({
            "bench": "gan_batch_builder",
            "native_ring": bool(use_native and native_ok),
            "batches": got, "batch_mb": round(nbytes / 1e6, 2),
            "batches_per_s": round(got / dt, 2),
            "mb_per_s": round(got * nbytes / 1e6 / dt, 1),
        }), flush=True)


def bench_gan_steps(ds: str, steps: int) -> None:
    """Loader-fed FULL-SIZE GAN train steps/s on the device: does the
    1-core host keep the device-bound rate (~20 steps/s on v5e) fed?"""
    import jax
    import jax.numpy as jnp

    from megatts2_tpu.config import DiscriminatorConfig, MegaGConfig, TrainConfig
    from megatts2_tpu.data import CutManifest, DataLoader, DurationBucketSampler
    from megatts2_tpu.data.datasets import GANBatchBuilder
    from megatts2_tpu.training import create_gan_state, make_gan_train_step

    manifest = CutManifest.load(os.path.join(ds, "cuts_train.jsonl.gz"))
    builder = GANBatchBuilder(manifest, ds, use_native=True)
    # max_duration_batch=40 (B=12) mirrors the tools/train_curve.py drive
    # geometry, which is known to compile — some nearby shape combos trip
    # an int32-overflow CHECK (llo::CouldLeS32) inside the remote TPU
    # compiler (compiler bug, reported via BENCHMARKS.md note)
    sampler = DurationBucketSampler(
        manifest, max_duration_batch=40.0, num_buckets=1, seed=0
    )
    g_cfg = MegaGConfig()
    d_cfg = DiscriminatorConfig()
    tcfg = TrainConfig(train_dtype="bfloat16", max_steps=600_000)
    loader = DataLoader(sampler, builder, prefetch=4)
    it = iter(loader)
    first = next(it)
    state, g_tx, d_tx = create_gan_state(
        jax.random.PRNGKey(0), g_cfg, d_cfg, tcfg, first
    )
    step = jax.jit(make_gan_train_step(g_cfg, d_cfg, tcfg, g_tx, d_tx),
                   donate_argnums=(0,))
    state, m = step(state, {k: jnp.asarray(v) for k, v in first.items()})
    jax.block_until_ready(m["G_loss_total"])

    def run(n, it):
        done = 0
        while done < n:
            for batch in it:
                yield batch
                done += 1
                if done >= n:
                    return
            it = iter(loader)  # re-run epochs

    # warmup: the timbre-concat bucket varies per batch (pow2 of the
    # random same-speaker sample count), so several shapes compile; time
    # only after the shape set is warm
    warmup = min(40, steps)
    for batch in run(warmup, it):
        state, m = step(state, {k: jnp.asarray(v) for k, v in batch.items()})
    jax.block_until_ready(m["G_loss_total"])
    t0 = time.time()
    done = 0
    for batch in run(steps, iter(loader)):
        state, m = step(state, {k: jnp.asarray(v) for k, v in batch.items()})
        done += 1
    jax.block_until_ready(m["G_loss_total"])
    dt = time.time() - t0
    print(json.dumps({
        "bench": "gan_loader_fed_steps", "steps": done,
        "steps_per_s": round(done / dt, 2),
        "wall_s": round(dt, 1),
        "note": "full-size config, loader + upload + device step",
    }), flush=True)


def bench_stage2(ds: str, generator_ckpt: str, generator_config: str) -> None:
    """Stage-2 latent extraction throughput (latents/s) through the real
    ``prepare_ds --stage 2`` path: jitted batched ``s2_latent`` (B=8,
    length-sorted buckets) + per-cut .npy writes.  Reference counterpart
    extracts ONE cut per CUDA call (``prepare_ds.py:224-258``)."""
    from megatts2_tpu.data import CutManifest
    from megatts2_tpu.prepare_ds import main as prep_main

    n = len(CutManifest.load(os.path.join(ds, "cuts_train.jsonl.gz"))) + len(
        CutManifest.load(os.path.join(ds, "cuts_valid.jsonl.gz"))
    )
    t0 = time.time()
    prep_main([
        "--stage", "2", "--ds_path", ds,
        "--generator_ckpt", generator_ckpt,
        "--generator_config", generator_config,
    ])
    dt = time.time() - t0
    print(json.dumps({
        "bench": "prepare_ds_stage2", "latents": n,
        "wall_s": round(dt, 1), "latents_per_s": round(n / dt, 1),
    }), flush=True)


def _bench_lm_steps(stage: str, ds: str, steps: int, config: str) -> None:
    """Loader-fed PLM/ADM train steps/s from real stage-2 latents — the
    PLM prompt-prefix assembly (≤10 same-speaker latent concat,
    ``PLMBatchBuilder``) is the host path most likely to collapse at
    50 speakers × 200 utterances on a 1-core host (round-3 VERDICT #3)."""
    import jax
    import jax.numpy as jnp

    from megatts2_tpu.config import load_adm_config, load_plm_config
    from megatts2_tpu.data import CutManifest, DataLoader, DurationBucketSampler
    from megatts2_tpu.data.datasets import ADMBatchBuilder, PLMBatchBuilder
    from megatts2_tpu.training import (
        create_adm_state,
        create_plm_state,
        make_adm_train_step,
        make_plm_train_step,
    )

    manifest = CutManifest.load(os.path.join(ds, "cuts_train.jsonl.gz"))
    if stage == "plm":
        cfg, tcfg = load_plm_config(config)
        builder = PLMBatchBuilder(manifest, ds, vq_bins=cfg.vq_bins)
        sampler = DurationBucketSampler(
            manifest, max_duration_batch=None, max_cuts=8, num_buckets=1, seed=0
        )
    else:
        cfg, tcfg = load_adm_config(config)
        builder = ADMBatchBuilder(
            manifest, ds, max_duration_token=cfg.max_duration_token
        )
        sampler = DurationBucketSampler(
            manifest, max_duration_batch=200.0, num_buckets=1, seed=0
        )
    loader = DataLoader(sampler, builder, prefetch=4)
    it = iter(loader)
    first = next(it)
    rng = jax.random.PRNGKey(0)
    if stage == "plm":
        state, tx = create_plm_state(rng, cfg, tcfg, first)
        step_fn, _ = make_plm_train_step(cfg, tcfg, tx)
    else:
        state, tx = create_adm_state(rng, cfg, tcfg, first)
        step_fn, _ = make_adm_train_step(cfg, tcfg, tx)
    step = jax.jit(step_fn, donate_argnums=(0,))
    state, m = step(state, {k: jnp.asarray(v) for k, v in first.items()})
    jax.block_until_ready(m["loss"])

    def run(n, it):
        done = 0
        while done < n:
            for batch in it:
                yield batch
                done += 1
                if done >= n:
                    return
            it = iter(loader)

    warmup = min(30, steps)
    for batch in run(warmup, it):
        state, m = step(state, {k: jnp.asarray(v) for k, v in batch.items()})
    jax.block_until_ready(m["loss"])
    t0 = time.time()
    done = 0
    for batch in run(steps, iter(loader)):
        state, m = step(state, {k: jnp.asarray(v) for k, v in batch.items()})
        done += 1
    jax.block_until_ready(m["loss"])
    dt = time.time() - t0
    print(json.dumps({
        "bench": f"{stage}_loader_fed_steps", "steps": done,
        "steps_per_s": round(done / dt, 2), "wall_s": round(dt, 1),
        "note": "full-size config, real stage-2 latents, loader + upload + device step",
    }), flush=True)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", required=True)
    ap.add_argument("--n_speakers", type=int, default=50)
    ap.add_argument("--n_per_spk", type=int, default=200)
    ap.add_argument("--workers", default="1,4",
                    help="stage-1 worker counts to sweep (each is a full "
                         "re-run of the stage — keep the list short)")
    ap.add_argument("--skip_gen", action="store_true",
                    help="corpus already generated under --root")
    ap.add_argument("--skip_prep", action="store_true")
    ap.add_argument("--loader_batches", type=int, default=50)
    ap.add_argument("--gan_steps", type=int, default=0,
                    help=">0: loader-fed full-size GAN steps on the device")
    ap.add_argument("--skip_loader", action="store_true")
    ap.add_argument("--stage2_ckpt", default="",
                    help="orbax GAN checkpoint dir (or torch .ckpt): run + "
                         "time stage-2 latent extraction over the corpus")
    ap.add_argument("--stage2_config", default="configs/config_gan.yaml")
    ap.add_argument("--plm_steps", type=int, default=0,
                    help=">0: loader-fed full-size PLM steps from the "
                         "stage-2 latents (needs --stage2_ckpt or a prior run)")
    ap.add_argument("--adm_steps", type=int, default=0)
    args = ap.parse_args()

    from megatts2_tpu import enable_compilation_cache

    enable_compilation_cache()
    wavs = os.path.join(args.root, "wavs")
    tgs = os.path.join(args.root, "textgrids")
    ds = os.path.join(args.root, "ds")
    n_files = args.n_speakers * args.n_per_spk
    if not args.skip_gen:
        wavs, tgs, ds = build_corpus(args.root, args.n_speakers, args.n_per_spk)
    if not args.skip_prep:
        run_stage(0, wavs, tgs, ds, 1, n_files)
        worker_list = [int(w) for w in args.workers.split(",")]
        for w in worker_list:
            run_stage(1, wavs, tgs, ds, w, n_files)
    if not args.skip_loader:
        bench_loader(ds, args.loader_batches)
    if args.gan_steps:
        bench_gan_steps(ds, args.gan_steps)
    if args.stage2_ckpt:
        bench_stage2(ds, args.stage2_ckpt, args.stage2_config)
    if args.plm_steps:
        _bench_lm_steps("plm", ds, args.plm_steps, "configs/config_plm.yaml")
    if args.adm_steps:
        _bench_lm_steps("adm", ds, args.adm_steps, "configs/config_adm.yaml")


if __name__ == "__main__":
    main()
