#!/usr/bin/env python
"""Measure checkpoint-save cost: per-leaf device_get (orbax default) vs
the packed single-transfer fetch (training/packed_fetch.py).

The 50k-step GAN run exposed the problem: each 2.1 GB / 663-leaf save
took ~95 s on the remote-tunnel TPU — per-leaf round trips, not
bandwidth (BENCHMARKS.md "Checkpoint save cost").  This benchmarks both
paths on the REAL full-size GAN train state, plus the raw transfer
(no disk) to factor transfer from write.

    python tools/bench_ckpt_save.py [--ckpt /tmp/pipe10k/ckpts50k/gan]
"""
import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="/tmp/pipe10k/ckpts50k/gan",
                    help="GAN ckpt dir (step_* inside); used to restore a "
                         "full-size state onto the device")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from megatts2_tpu import enable_compilation_cache

    enable_compilation_cache()

    import jax

    from megatts2_tpu.training.checkpoints import (
        latest_checkpoint,
        restore_pytree,
        save_checkpoint,
    )
    from megatts2_tpu.training.packed_fetch import fetch_pytree

    path = latest_checkpoint(args.ckpt) or args.ckpt
    t0 = time.time()
    host_tree = restore_pytree(path)
    print(json.dumps({"phase": "restore_to_host", "s": round(time.time() - t0, 1)}),
          flush=True)
    t0 = time.time()
    dev_tree = jax.tree_util.tree_map(jax.numpy.asarray, host_tree)
    jax.block_until_ready(jax.tree_util.tree_leaves(dev_tree)[0])
    leaves = jax.tree_util.tree_leaves(dev_tree)
    nbytes = sum(l.size * l.dtype.itemsize for l in leaves)
    print(json.dumps({"phase": "upload", "s": round(time.time() - t0, 1),
                      "leaves": len(leaves), "gb": round(nbytes / 1e9, 2)}),
          flush=True)

    # CRITICAL: arrays uploaded from numpy keep their HOST buffer, so
    # fetching them is a no-op (the round-4 run measured device_get at
    # 0.0 s — fake).  A real training state is DEVICE-BORN (produced by
    # jitted steps); reproduce that by passing the tree through a jitted
    # identity+0 so every leaf is a fresh device-only array, as during
    # training, and every fetch pays the real tunnel transfer.
    dev_tree = jax.jit(
        lambda t: jax.tree_util.tree_map(lambda x: x + 0, t)
    )(dev_tree)
    jax.block_until_ready(jax.tree_util.tree_leaves(dev_tree)[0])

    out = {"leaves": len(leaves), "gb": round(nbytes / 1e9, 2),
           "state": "device-born (jitted copy; fetches pay the tunnel)"}

    # raw transfer: per-leaf device_get vs packed variants
    variants = (
        ("device_get", jax.device_get),
        ("packed1", lambda t: fetch_pytree(t, n_chunks=1, n_streams=1)),
        ("packed16x8", lambda t: fetch_pytree(t, n_chunks=16, n_streams=8)),
        ("packed32x16", lambda t: fetch_pytree(t, n_chunks=32, n_streams=16)),
    )
    for name, fetch in variants:
        times = []
        for _ in range(args.reps):
            t0 = time.time()
            fetch(dev_tree)
            times.append(time.time() - t0)
        out[f"fetch_{name}_s"] = round(min(times), 1)

    # full save (fetch + orbax write)
    for name, env in (("orbax_default", "0"), ("packed", "1")):
        os.environ["MEGATTS2_PACKED_CKPT"] = env
        times = []
        for _ in range(args.reps):
            d = tempfile.mkdtemp(prefix="ckbench_")
            t0 = time.time()
            save_checkpoint(d, dev_tree, 1, keep=1)
            times.append(time.time() - t0)
            shutil.rmtree(d, ignore_errors=True)
        out[f"save_{name}_s"] = round(min(times), 1)
    out["speedup_fetch"] = round(out["fetch_device_get_s"] / max(out["fetch_packed16x8_s"], 1e-9), 1)
    out["speedup_save"] = round(out["save_orbax_default_s"] / max(out["save_packed_s"], 1e-9), 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
