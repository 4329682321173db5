#!/usr/bin/env python
"""Per-op device profile of the int8 PLM decode scan (the round-3 perf
frontier: 30 ms/64 steps measured vs ~12 ms int8 weight-traffic floor).

Captures a jax.profiler trace of plm_infer at bench geometry and prints
the top device ops by total self time, grouped by fusion category —
tells us whether the gap is weight streams, cache traffic, or VPU glue.

    python tools/profile_decode.py [trace_dir]
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

from megatts2_tpu.config import MegaPLMConfig
from megatts2_tpu.models import MegaPLM
from megatts2_tpu.models.plm import plm_infer
from megatts2_tpu.quantization.weight_only import quantize_tree


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/decode_trace"
    fast = "--fast" in sys.argv
    B, T = 8, 64
    cfg = MegaPLMConfig()
    key = jax.random.PRNGKey(0)
    params = quantize_tree(jax.jit(MegaPLM(cfg).init)(
        key, jnp.zeros((1, 4, 512)), jnp.zeros((1, 5), jnp.int32), jnp.asarray([4])
    )["params"])
    rng = np.random.RandomState(0)
    tc = jnp.asarray(rng.randn(B, T, 512).astype(np.float32))

    if fast:
        from megatts2_tpu.models.fast_decode import plm_fast_decode

        def run(p, tc_in):
            return jnp.sum(plm_fast_decode(p, cfg, tc_in, dtype=jnp.bfloat16, quant=True))
    else:
        def run(p, tc_in):
            # fast=False: plm_infer defaults to the fast path now, and
            # this branch exists to profile the nn.scan baseline
            return jnp.sum(plm_infer(p, cfg, tc_in, dtype=jnp.bfloat16,
                                     quant=True, fast=False))

    jitted = jax.jit(run)
    np.asarray(jitted(params, tc))  # compile + warm
    np.asarray(jitted(params, tc))

    jax.profiler.start_trace(trace_dir)
    for _ in range(3):
        out = jitted(params, tc)
    np.asarray(out)
    jax.profiler.stop_trace()

    # parse with ProfileData
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
                name = ev.name
                dur = ev.duration_ns
                tot[name] += dur
                cnt[name] += 1
        total = sum(tot.values())
        print(json.dumps({"plane": plane.name, "total_ms": round(total / 1e6, 3)}))
        for name, ns in tot.most_common(40):
            print(json.dumps({
                "op": name[:120], "ms": round(ns / 1e6, 3),
                "count": cnt[name],
                "pct": round(100 * ns / max(total, 1), 1),
            }))


if __name__ == "__main__":
    main()
