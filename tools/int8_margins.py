#!/usr/bin/env python
"""int8 decode-cliff risk measurement on TRAINED PLM weights (VERDICT r4 #4).

The round-4 2x-budget rerun showed one speaker's greedy argmax flipping
under int8's <2% logit perturbation and the decode diverging (MCD
33.8 -> 58.8).  That observation was on a barely-trained stack; this tool
quantifies the risk on REAL trained weights:

* **teacher-forced logit margins** — one fp32 forward over real
  PLMBatchBuilder batches; margin_t = logit(top1) - logit(top2) at every
  valid position; reported as percentiles.
* **int8 perturbation** — the same forward with the int8 weight-only tree
  (QDense); reports |logits_q - logits| percentiles (absolute and
  relative to the margin).
* **teacher-forced argmax agreement** — fraction of positions where fp32
  and int8 pick the same top-1 (on the same trajectory, so no error
  compounding — the pure per-step flip probability).
* **at-risk fraction** — positions whose fp32 margin is smaller than the
  p99 int8 perturbation: the upper bound on per-step flip exposure.

The full e2e fp32-vs-int8 comparison (error compounding through AR
decode + vocoder) lives in tools/heldout_eval.py --quant_int8; this tool
isolates the per-step statistics the serving-default decision needs.

    python tools/int8_margins.py --train_root /tmp/r5train [--cpu]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--train_root", default="/tmp/r5train")
    ap.add_argument("--ds", default=None, help="default: <train_root>/ds")
    ap.add_argument("--ckpt_root", default=None,
                    help="default: <train_root>/ckpts (at_scale_stack.py "
                         "writes ckpts50k)")
    ap.add_argument("--n_batches", type=int, default=8)
    ap.add_argument("--batch_cuts", type=int, default=8)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (leave the TPU to training)")
    ap.add_argument("--report", default=None)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        from megatts2_tpu import enable_compilation_cache

        enable_compilation_cache()

    import jax.numpy as jnp

    from megatts2_tpu.config import load_plm_config
    from megatts2_tpu.data import CutManifest, DurationBucketSampler
    from megatts2_tpu.data.datasets import PLMBatchBuilder
    from megatts2_tpu.models.plm import MegaPLM
    from megatts2_tpu.quantization.weight_only import quantize_tree
    from megatts2_tpu.training.checkpoints import best_checkpoint, restore_pytree

    ds = args.ds or os.path.join(args.train_root, "ds")
    cfg, _ = load_plm_config(os.path.join(args.train_root, "plm.yaml"))
    ck = best_checkpoint(
        os.path.join(args.ckpt_root or os.path.join(args.train_root, "ckpts"),
                     "plm"))
    params = restore_pytree(ck)["params"]
    params_q = quantize_tree(params)
    params, params_q = jax.device_put((params, params_q))

    manifest = CutManifest.load(os.path.join(ds, "cuts_valid.jsonl.gz"))
    builder = PLMBatchBuilder(manifest, ds, vq_bins=cfg.vq_bins, seed=7)
    sampler = DurationBucketSampler(
        manifest, max_duration_batch=None, max_cuts=args.batch_cuts,
        num_buckets=1, seed=7)

    # bf16 forward in both cases — the serving decode computes bf16; the
    # margin/perturbation comparison must be apples-to-apples with it
    model = MegaPLM(cfg, dtype=jnp.bfloat16)
    model_q = MegaPLM(cfg, dtype=jnp.bfloat16, quant=True)

    @jax.jit
    def fwd(p, tc, codes, lens):
        logits, target = model.apply({"params": p}, tc, codes, lens)
        return logits.astype(jnp.float32), target

    @jax.jit
    def fwd_q(p, tc, codes, lens):
        logits, target = model_q.apply({"params": p}, tc, codes, lens)
        return logits.astype(jnp.float32), target

    margins, perturbs, agrees, valid_n = [], [], 0, 0
    eos = cfg.eos_id
    batches = 0
    for idx in sampler:
        if batches >= args.n_batches:
            break
        batch = builder(idx)
        tc = jnp.asarray(batch["tc_latents"])
        codes = jnp.asarray(batch["p_codes"])
        lens = jnp.asarray(batch["lens"])
        logits, target = fwd(params, tc, codes, lens)
        logits_q, _ = fwd_q(params_q, tc, codes, lens)
        logits, logits_q, target = map(np.asarray, (logits, logits_q, target))
        valid = target != eos  # (B, T)
        top2 = np.partition(logits, -2, axis=-1)[..., -2:]
        margin = top2[..., 1] - top2[..., 0]  # (B, T) top1 - top2
        pert = np.abs(logits_q - logits).max(axis=-1)  # (B, T) worst coord
        agree = logits.argmax(-1) == logits_q.argmax(-1)
        margins.append(margin[valid])
        perturbs.append(pert[valid])
        agrees += int(agree[valid].sum())
        valid_n += int(valid.sum())
        batches += 1

    margins = np.concatenate(margins)
    perturbs = np.concatenate(perturbs)
    pert_p99 = float(np.percentile(perturbs, 99))
    out = {
        "ckpt": ck,
        "positions": int(valid_n),
        "batches": batches,
        "margin_logits": {
            "p1": round(float(np.percentile(margins, 1)), 3),
            "p5": round(float(np.percentile(margins, 5)), 3),
            "p50": round(float(np.percentile(margins, 50)), 3),
            "p95": round(float(np.percentile(margins, 95)), 3),
        },
        "int8_perturbation_logits": {
            "p50": round(float(np.percentile(perturbs, 50)), 4),
            "p99": round(pert_p99, 4),
            "max": round(float(perturbs.max()), 4),
        },
        "teacher_forced_argmax_agreement": round(agrees / max(valid_n, 1), 5),
        # fp32 margin below the p99 perturbation => a flip is plausible
        "at_risk_fraction_p99": round(float((margins < pert_p99).mean()), 5),
        "at_risk_fraction_2x_p99": round(
            float((margins < 2 * pert_p99).mean()), 5),
    }
    line = json.dumps(out)
    print(line, flush=True)
    if args.report:
        with open(args.report, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
