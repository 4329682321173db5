"""Characterize the remote-TPU-compiler int32-overflow crash geometry.

Certain GAN train-step batch shapes abort the axon remote compiler with
``Check failed: llo::CouldLeS32`` (HTTP 500 / SIGABRT) — e.g. B=8 ×
256-frame mel targets × 512-frame timbres, while B=12 at the same frame
shapes and B=8 × 512-frame targets both compile fine (BENCHMARKS.md
"Input pipeline" caveat, round 3).  This tool AOT-compiles the REAL GAN
train step (``training/gan_trainer.py::make_gan_train_step``) over a
(B, T_target, T_timbre) grid — compile only, nothing executed — and
appends one JSON line per probe to ``--out`` so the known-bad predicate
in ``data/shape_guard.py`` is built on measured facts, not folklore.

Resume-friendly: shapes already present in ``--out`` are skipped, so a
client killed by a compiler abort can simply be re-run.

    python tools/probe_crash_geometry.py --out /tmp/crash_grid.jsonl
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np

# (B, T_target, T_timbre) probes; Tp (phones) rides --tp.  Expectations
# from the round-3 observations are in the trailing comment.
DEFAULT_GRID = [
    (12, 256, 512),   # known good (bench_input_pipeline drive geometry)
    (8, 256, 512),    # known bad
    (8, 512, 512),    # known good (bench_train geometry)
    (8, 256, 2048),   # known bad
    (8, 384, 512),    # does padding the target bucket fix it?
    (8, 256, 256),    # does a smaller timbre bucket fix it?
    (8, 256, 1024),
    (12, 256, 2048),  # does B=12 survive the 2048 timbre bucket?
    (16, 256, 512),
    (8, 128, 512),
    (10, 256, 512),
]


def emit_artifact(jsonl_path: str, artifact_path: str) -> dict:
    """Fold probe results (+ the executed-at-scale anchors) into the
    artifact ``data/shape_guard.py`` loads: {bad: [[B,T,Tm]...],
    good_compiled: [[B,T,Tm]...], good_executed: [[B,T]...]}."""
    bad, good = [], []
    seen = set()
    if os.path.exists(jsonl_path):
        for line in open(jsonl_path):
            r = json.loads(line)
            key = (r["B"], r["T"], r["Tm"])
            if key in seen:
                continue
            seen.add(key)
            (good if r["ok"] else bad).append(list(key))
    artifact = {
        "source": os.path.basename(jsonl_path),
        "bad": sorted(bad),
        "good_compiled": sorted(good),
        # shapes EXECUTED at scale on the real chip (stronger than a
        # clean compile): see data/shape_guard.py fallback docstring
        "good_executed": [[8, 320], [12, 256], [8, 512]],
    }
    with open(artifact_path, "w") as f:
        json.dump(artifact, f, indent=1)
    return artifact


def lattice_grid():
    """The systematic (B, T_target, T_timbre) lattice (round-4 verdict #7):
    every reachable corner of B x target-bucket x timbre-bucket space a
    user config can hit, ordered cheap-compiles-first."""
    out = list(DEFAULT_GRID)
    for B in (4, 8, 12, 16):
        for T in (128, 256, 320, 384, 512, 768, 1024):
            for Tm in (512, 2048):
                if (B, T, Tm) not in out:
                    out.append((B, T, Tm))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/crash_grid.jsonl")
    ap.add_argument("--tp", type=int, default=16, help="phone bucket")
    ap.add_argument("--grid", default=None,
                    help="semicolon list of B,T,Tm triples (overrides the "
                         "default grid)")
    ap.add_argument("--lattice", action="store_true",
                    help="probe the full systematic lattice "
                         "(B in {4,8,12,16} x T<=1024 x Tm in {512,2048})")
    ap.add_argument("--emit", default=None,
                    help="after probing, fold --out into this shape_guard "
                         "artifact (data/crash_grid.json)")
    ap.add_argument("--emit_only", action="store_true",
                    help="just fold an existing --out into --emit")
    ap.add_argument("--max_probes", type=int, default=0,
                    help=">0: stop after this many new probes (budgeting)")
    args = ap.parse_args()

    if args.emit_only:
        art = emit_artifact(args.out, args.emit)
        print(json.dumps({"bad": len(art["bad"]),
                          "good_compiled": len(art["good_compiled"])}))
        return

    grid = lattice_grid() if args.lattice else DEFAULT_GRID
    if args.grid:
        grid = [tuple(int(x) for x in g.split(",")) for g in args.grid.split(";")]

    done = set()
    if os.path.exists(args.out):
        for line in open(args.out):
            r = json.loads(line)
            done.add((r["B"], r["T"], r["Tm"]))

    from megatts2_tpu import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from megatts2_tpu.config import DiscriminatorConfig, MegaGConfig, TrainConfig
    from megatts2_tpu.training import create_gan_state, make_gan_train_step

    g_cfg = MegaGConfig()
    d_cfg = DiscriminatorConfig()
    tcfg = TrainConfig(train_dtype="bfloat16", max_steps=600_000)
    Tp = args.tp
    rng = np.random.RandomState(0)

    # params/state once (shape-independent); tiny example batch
    example = {
        "phone_tokens": rng.randint(1, 40, (2, Tp)).astype(np.int32),
        "duration_tokens": np.full((2, Tp), 8, np.int32),
        "tokens_lens": np.full((2,), Tp, np.int32),
        "mel_targets": rng.randn(2, 128, 80).astype(np.float32),
        "mel_target_lens": np.full((2,), 128, np.int32),
        "mel_timbres": rng.randn(2, 128, 80).astype(np.float32),
    }
    state, g_tx, d_tx = create_gan_state(
        jax.random.PRNGKey(0), g_cfg, d_cfg, tcfg, example
    )
    step = jax.jit(make_gan_train_step(g_cfg, d_cfg, tcfg, g_tx, d_tx),
                   donate_argnums=(0,))

    def sds(shape, dt):
        return jax.ShapeDtypeStruct(shape, dt)

    n_new = 0
    for B, T, Tm in grid:
        if (B, T, Tm) in done:
            print(f"skip {(B, T, Tm)} (already probed)", flush=True)
            continue
        if args.max_probes and n_new >= args.max_probes:
            print(f"stopping at --max_probes={args.max_probes}", flush=True)
            break
        n_new += 1
        batch = {
            "phone_tokens": sds((B, Tp), jnp.int32),
            "duration_tokens": sds((B, Tp), jnp.int32),
            "tokens_lens": sds((B,), jnp.int32),
            "mel_targets": sds((B, T, 80), jnp.float32),
            "mel_target_lens": sds((B,), jnp.int32),
            "mel_timbres": sds((B, Tm, 80), jnp.float32),
        }
        t0 = time.time()
        row = {"B": B, "T": T, "Tm": Tm, "Tp": Tp}
        print(f"probing {(B, T, Tm)} ...", flush=True)
        try:
            step.lower(state, batch).compile()
            row.update(ok=True, seconds=round(time.time() - t0, 1))
        except Exception as e:  # remote-compiler abort surfaces here
            msg = str(e).replace("\n", " ")[:300]
            row.update(ok=False, seconds=round(time.time() - t0, 1), error=msg)
        with open(args.out, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps(row), flush=True)

    if args.emit:
        art = emit_artifact(args.out, args.emit)
        print(json.dumps({"emitted": args.emit, "bad": len(art["bad"]),
                          "good_compiled": len(art["good_compiled"])}))


if __name__ == "__main__":
    main()
