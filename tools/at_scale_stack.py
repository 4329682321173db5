#!/usr/bin/env python
"""Full-stack at-scale training driver (VERDICT r4 #2 + #6 in one run).

Regenerates the 10k-utterance / 50-speaker corpus
(tools/bench_input_pipeline.py, seed 0 => byte-identical audio to the
round-4 corpus), preps stages 0+1 on host CPU, then fits every stage
through the REAL ``cli.py fit`` path as subprocesses, in the exact layout
``tools/heldout_eval.py`` consumes:

    {root}/gan50k.yaml {root}/plm.yaml {root}/adm.yaml {root}/vocoder.yaml
    {root}/ckpts50k/{gan,plm,adm,vocoder}   (orbax top-k + scores.json)
    {root}/logs50k/{stage}_metrics.jsonl

The GAN arm runs with ``g_ema_decay`` ON (VERDICT r4 #6): validation /
top-k selection / ``load_generator_from_orbax`` all use the smoothed
weights, so the published round-4 non-EMA 50k curve (BENCHMARKS.md, best
0.2550@28k then 0.277@50k) is the baseline this curve is compared against
on the SAME corpus.  Reference counterpart: the 600k-step budget of
/root/reference/configs/config_gan.yaml:22-26 with no stability mechanism
beyond checkpoint selection.

Stages are idempotent: a stage whose metrics log already reached its step
budget is skipped, so the driver can be relaunched after any interruption
(cli.py fit itself resumes from latest_checkpoint).

    python tools/at_scale_stack.py --root /tmp/pipe10k
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, ".")


def log(**kw):
    print(json.dumps(kw), flush=True)


def metrics_last_step(path: str) -> int:
    if not os.path.exists(path):
        return 0
    last = 0
    with open(path) as f:
        for line in f:
            try:
                last = max(last, json.loads(line)["step"])
            except Exception:
                pass
    return last


def write_stage_config(root: str, stage: str, out_name: str, steps: int,
                       val_every: int, data_overrides: dict,
                       trainer_overrides: dict) -> str:
    import yaml

    with open(f"configs/config_{stage}.yaml") as f:
        cfg = yaml.safe_load(f)
    cfg["trainer"] = {
        "max_steps": steps,
        "log_every_n_steps": 100,
        "val_check_interval": val_every,
        **trainer_overrides,
    }
    cfg.setdefault("data", {}).update(
        {"ds_path": os.path.join(root, "ds") + "/", **data_overrides})
    path = os.path.join(root, out_name)
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return path


def fit(root: str, stage: str, cfg_path: str, steps: int,
        extra_args: list | None = None) -> None:
    log_dir = os.path.join(root, "logs50k")
    ckpt_dir = os.path.join(root, "ckpts50k", stage)
    mpath = os.path.join(log_dir, f"{stage}_metrics.jsonl")
    if metrics_last_step(mpath) >= steps:
        log(phase=f"{stage}_skip", reason="metrics already at budget")
        return
    cmd = [sys.executable, "cli.py", "fit", "-c", cfg_path, "--stage", stage,
           "--log_dir", log_dir, "--ckpt_dir", ckpt_dir] + (extra_args or [])
    t0 = time.time()
    attempts = 0
    # relaunch on crash (cli resumes from latest_checkpoint) a bounded
    # number of times so a transient tunnel failure doesn't end the run
    while metrics_last_step(mpath) < steps and attempts < 4:
        attempts += 1
        with open(os.path.join(root, f"fit_{stage}_{attempts}.log"), "wb") as lf:
            rc = subprocess.call(cmd, stdout=lf, stderr=subprocess.STDOUT)
        log(phase=f"{stage}_launch", attempt=attempts, rc=rc,
            reached=metrics_last_step(mpath),
            wall_s=round(time.time() - t0, 1))
        if rc == 0:
            break
    assert metrics_last_step(mpath) >= steps * 0.99, (
        f"{stage} did not reach its budget; see fit_{stage}_*.log")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", default="/tmp/pipe10k")
    ap.add_argument("--n_speakers", type=int, default=50)
    ap.add_argument("--n_per_spk", type=int, default=200)
    ap.add_argument("--gan_steps", type=int, default=30_000)
    ap.add_argument("--plm_steps", type=int, default=14_000)
    ap.add_argument("--adm_steps", type=int, default=24_000)
    ap.add_argument("--voc_steps", type=int, default=10_000)
    ap.add_argument("--g_ema_decay", type=float, default=0.999)
    ap.add_argument("--stages", default="gan,stage2,plm,adm,vocoder")
    args = ap.parse_args()
    stages = args.stages.split(",")
    root = args.root
    ds = os.path.join(root, "ds")
    t_all = time.time()

    # ---- corpus + prep stages 0/1 on host CPU (keeps the TPU free) ----
    if not os.path.exists(os.path.join(ds, "cuts_train.jsonl.gz")):
        import jax

        jax.config.update("jax_platforms", "cpu")
        from tools.bench_input_pipeline import build_corpus

        t0 = time.time()
        wavs, tgs, _ = build_corpus(root, args.n_speakers, args.n_per_spk)
        log(phase="corpus", wall_s=round(time.time() - t0, 1))
        from megatts2_tpu.prepare_ds import main as prep_main

        t0 = time.time()
        prep_main(["--stage", "0", "--wavtxt_path", wavs, "--num_workers", "4"])
        prep_main(["--stage", "1", "--wavtxt_path", wavs, "--text_grid_path",
                   tgs, "--ds_path", ds, "--num_workers", "4"])
        log(phase="prep01", wall_s=round(time.time() - t0, 1))

    # ---- GAN with EMA (known-good device geometry, see long_train.py) ----
    gan_cfg = write_stage_config(
        root, "gan", "gan50k.yaml", args.gan_steps, 2000,
        {"min_duration": 1.0, "max_duration_batch": 40,
         "max_timbre_frames": 512},
        {"g_ema_decay": args.g_ema_decay})
    if "gan" in stages:
        fit(root, "gan", gan_cfg, args.gan_steps)

    # ---- stage 2: latents from the BEST (EMA) generator checkpoint ----
    if "stage2" in stages and not os.path.isdir(os.path.join(ds, "latents")):
        from megatts2_tpu.training.checkpoints import best_checkpoint

        ck = best_checkpoint(os.path.join(root, "ckpts50k", "gan"))
        assert ck, "stage 2 needs a trained GAN checkpoint"
        t0 = time.time()
        with open(os.path.join(root, "fit_stage2.log"), "wb") as lf:
            rc = subprocess.call(
                [sys.executable, "prepare_ds.py", "--stage", "2",
                 "--ds_path", ds, "--generator_ckpt", ck,
                 "--generator_config", gan_cfg],
                stdout=lf, stderr=subprocess.STDOUT)
        log(phase="stage2", rc=rc, ckpt=ck, wall_s=round(time.time() - t0, 1))
        assert rc == 0, "stage 2 failed; see fit_stage2.log"

    # ---- PLM / ADM / vocoder at the published at-scale geometries ----
    if "plm" in stages:
        cfg = write_stage_config(root, "plm", "plm.yaml", args.plm_steps,
                                 1000, {"max_n_cuts": 8}, {})
        fit(root, "plm", cfg, args.plm_steps)
    if "adm" in stages:
        cfg = write_stage_config(root, "adm", "adm.yaml", args.adm_steps,
                                 2000, {"max_duration_batch": 200}, {})
        fit(root, "adm", cfg, args.adm_steps)
    if "vocoder" in stages:
        cfg = write_stage_config(root, "vocoder", "vocoder.yaml",
                                 args.voc_steps, 1000, {"batch_size": 16}, {})
        fit(root, "vocoder", cfg, args.voc_steps)

    # ---- curve summary for BENCHMARKS ----
    out = {"phase": "summary", "total_wall_s": round(time.time() - t_all, 1)}
    for stage, keys in (
        ("gan", ("val/loss_re",)),
        ("plm", ("val/loss", "val/ac10")),
        ("adm", ("val/loss",)),
        ("vocoder", ("val/loss",)),
    ):
        mpath = os.path.join(root, "logs50k", f"{stage}_metrics.jsonl")
        if not os.path.exists(mpath):
            continue
        rows = [json.loads(l) for l in open(mpath)]
        out[stage] = {
            k: [(r["step"], round(r[k], 4)) for r in rows if k in r]
            for k in keys
        }
        sps = [r["train/steps_per_sec"] for r in rows
               if "train/steps_per_sec" in r]
        if sps:
            out[stage]["steps_per_sec_median"] = round(
                float(sorted(sps)[len(sps) // 2]), 2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
