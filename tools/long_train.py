#!/usr/bin/env python
"""Long GAN training run at corpus scale, with a mid-run kill + resume
(round-3 verdict #2: "a training run that means something").

Drives the REAL product path end to end on the 10k-utterance corpus from
tools/bench_input_pipeline.py: prepare_ds stages 0+1, then ``cli.py fit``
as a SUBPROCESS for ``--steps`` steps with top-k checkpoint retention on.
If ``--kill_at`` is set, the trainer process is SIGKILLed the first time
the metrics log crosses that step, then relaunched with the same command —
``cli.py`` restores ``latest_checkpoint(ckpt_dir)`` automatically, so the
curve (append-mode jsonl) shows continuity across the kill.

Reference counterpart: the 400k-step LibriTTS run behind
``examples/mel_step_400k_re_loss_0.4771.png`` (configs/config_gan.yaml:22-26)
— which has no resume evidence and no published curve at all.

    python tools/long_train.py --root /tmp/pipe10k --steps 50000 --kill_at 20000
"""
from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time

sys.path.insert(0, ".")


def prep(root: str) -> str:
    import jax

    jax.config.update("jax_platforms", "cpu")  # keep the TPU free; stage 0/1
    # mel extraction is jitted XLA and runs fine on host for a one-off prep
    from megatts2_tpu.prepare_ds import main as prep_main

    wavs, tgs, ds = (os.path.join(root, d) for d in ("wavs", "textgrids", "ds"))
    prep_main(["--stage", "0", "--wavtxt_path", wavs, "--num_workers", "4"])
    prep_main(["--stage", "1", "--wavtxt_path", wavs, "--text_grid_path", tgs,
               "--ds_path", ds, "--num_workers", "4"])
    return ds


def write_config(root: str, ds: str, steps: int, val_every: int) -> str:
    import yaml

    with open("configs/config_gan.yaml") as f:
        cfg = yaml.safe_load(f)
    cfg["trainer"] = {
        "max_steps": steps,
        "log_every_n_steps": 100,
        "val_check_interval": val_every,
    }
    # max_duration_batch=40 (B=12) + 512-frame timbre cap: the known-good
    # device geometry (remote-compiler int32-overflow CHECK guard zone —
    # BENCHMARKS.md "input pipeline" caveat; data/shape_guard.py)
    cfg.setdefault("data", {}).update({
        "ds_path": ds + "/", "min_duration": 1.0,
        "max_duration_batch": 40, "max_timbre_frames": 512,
    })
    path = os.path.join(root, "gan50k.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return path


def metrics_step(path: str) -> int:
    """Last logged step in a metrics jsonl (0 if absent/empty)."""
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


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", required=True)
    ap.add_argument("--steps", type=int, default=50_000)
    ap.add_argument("--val_every", type=int, default=2_000)
    ap.add_argument("--kill_at", type=int, default=0,
                    help=">0: SIGKILL the trainer once the log crosses this "
                         "step, then relaunch (resume evidence)")
    ap.add_argument("--skip_prep", action="store_true")
    args = ap.parse_args()

    root = args.root
    ds = os.path.join(root, "ds")
    if not args.skip_prep:
        t0 = time.time()
        ds = prep(root)
        print(json.dumps({"phase": "prep01", "wall_s": round(time.time() - t0, 1)}),
              flush=True)
    cfg_path = write_config(root, ds, args.steps, args.val_every)
    log_dir = os.path.join(root, "logs50k")
    ckpt_dir = os.path.join(root, "ckpts50k", "gan")
    mpath = os.path.join(log_dir, "gan_metrics.jsonl")
    cmd = [sys.executable, "cli.py", "fit", "-c", cfg_path, "--stage", "gan",
           "--log_dir", log_dir, "--ckpt_dir", ckpt_dir]

    launches = []
    killed_at = None
    t_start = time.time()
    while metrics_step(mpath) < args.steps:
        t0 = time.time()
        with open(os.path.join(root, f"fit_{len(launches)}.log"), "wb") as lf:
            proc = subprocess.Popen(cmd, stdout=lf, stderr=subprocess.STDOUT)
            try:
                while proc.poll() is None:
                    time.sleep(20)
                    step = metrics_step(mpath)
                    if (args.kill_at and killed_at is None
                            and step >= args.kill_at):
                        proc.send_signal(signal.SIGKILL)
                        proc.wait()
                        killed_at = step
                        print(json.dumps({"phase": "killed", "at_step": step}),
                              flush=True)
                        break
            finally:
                if proc.poll() is None:
                    proc.kill()
        launches.append({"rc": proc.returncode,
                         "wall_s": round(time.time() - t0, 1),
                         "reached_step": metrics_step(mpath)})
        print(json.dumps({"phase": "launch_done", **launches[-1]}), flush=True)
        if proc.returncode == 0:
            break  # normal completion (max_steps reached)
        if proc.returncode != -9:
            print(json.dumps({"phase": "abort", "rc": proc.returncode}), flush=True)
            break

    # summarize the curve
    rows = [json.loads(l) for l in open(mpath)] if os.path.exists(mpath) else []
    val = [(r["step"], round(r["val/loss_re"], 4)) for r in rows if "val/loss_re" in r]
    tr = [(r["step"], round(r["train/G_loss_re"], 4)) for r in rows
          if "train/G_loss_re" in r]
    sps = [r["train/steps_per_sec"] for r in rows if "train/steps_per_sec" in r]
    best = min(val, key=lambda x: x[1]) if val else None
    print(json.dumps({
        "phase": "summary", "total_wall_s": round(time.time() - t_start, 1),
        "launches": launches, "killed_at_step": killed_at,
        "val_curve": val, "train_curve_every_1k": tr[9::10],
        "best_val_loss_re": best,
        "steps_per_sec_median": round(float(sorted(sps)[len(sps) // 2], ), 2) if sps else None,
    }), flush=True)


if __name__ == "__main__":
    main()
