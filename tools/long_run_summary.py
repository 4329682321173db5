#!/usr/bin/env python
"""Summarize a long-run GAN metrics jsonl (tools/long_train.py) into the
BENCHMARKS.md publication: val curve, best val mel-L1, steps/s, and the
RESUME EVIDENCE — every point where the append-mode log's step sequence
jumps backwards is a kill+restore (cli.py restored the latest checkpoint
and re-logged the steps since it), so curve continuity across those
points is exactly the round-3 verdict #2 ask.

    python tools/long_run_summary.py /tmp/pipe10k/logs50k/gan_metrics.jsonl
"""
import json
import sys


def main():
    path = sys.argv[1]
    rows = [json.loads(l) for l in open(path)]
    # logging cadence inferred from the data (NOT assumed): the modal
    # positive step delta between consecutive rows of the same metric
    deltas = {}
    prev_s = None
    for r in rows:
        if "train/steps_per_sec" in r:
            if prev_s is not None and r["step"] > prev_s:
                d = r["step"] - prev_s
                deltas[d] = deltas.get(d, 0) + 1
            prev_s = r["step"]
    cadence = max(deltas, key=deltas.get) if deltas else 0
    resumes = []  # fire once per backwards jump in the append-only log
    last = 0
    prev = 0
    for r in rows:
        s = r["step"]
        if s < prev and "train/steps_per_sec" in r:
            # first re-logged row sits one cadence past the restore point
            resumes.append({"restored_to": s - cadence, "killed_after": last})
        prev = s
        last = max(last, s)

    # effective curve: last value logged per step (post-resume overwrites)
    by_step = {}
    for r in rows:
        by_step.setdefault(r["step"], {}).update(r)
    val = [(s, round(d["val/loss_re"], 4)) for s, d in sorted(by_step.items())
           if "val/loss_re" in d]
    tr = [(s, round(d["train/G_loss_re"], 4)) for s, d in sorted(by_step.items())
          if "train/G_loss_re" in d]
    sps = sorted(d["train/steps_per_sec"] for d in by_step.values()
                 if "train/steps_per_sec" in d)
    wall = rows[-1]["time"] - rows[0]["time"]
    best = min(val, key=lambda x: x[1]) if val else None
    print(json.dumps({
        "max_step": last,
        "resume_events": resumes,
        "best_val_loss_re": best,
        "val_curve": val,
        "train_loss_re_every_2k": tr[19::20],
        "steps_per_sec_median": round(sps[len(sps) // 2], 1) if sps else None,
        "total_wall_s": round(wall, 1),
    }))


if __name__ == "__main__":
    main()
