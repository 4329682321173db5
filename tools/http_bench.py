"""Online-serving latency benchmark: live HTTP server (serve.py --http,
continuous engine underneath) under concurrent load, full-size models
(random weights — latency is weight-independent).

Spins the server in-process (single-TPU-process constraint), fires
``--requests`` POST /synthesize calls from ``--clients`` threads with
~Poisson arrivals at ``--rps``, and reports per-request latency
percentiles + achieved throughput — the metric that matters for online
traffic (the offline bucketed path is measured in bench.py/perf_probe).

    python tools/http_bench.py --requests 32 --clients 8 --rps 8
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import threading
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=32)
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--rps", type=float, default=8.0, help="offered load")
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--max_frames", type=int, default=512)
    ap.add_argument("--chunk_frames", type=int, default=128)
    ap.add_argument("--n_phones", type=int, default=48)
    args = ap.parse_args()

    from megatts2_tpu import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    import megatts2_tpu.serve as serve_mod
    from megatts2_tpu.config import (
        HiFiGANConfig, MegaADMConfig, MegaGConfig, MegaPLMConfig, VocosConfig,
    )
    from megatts2_tpu.models import MegaADM, MegaG, MegaPLM, Megatts, Vocos
    from megatts2_tpu.utils.audio import save_wav

    # full-size random-weight stack, Vocos vocoder, int8 PLM
    g_cfg = MegaGConfig()
    plm_cfg = MegaPLMConfig()
    adm_cfg = MegaADMConfig(tc_emb_dim=512)
    voc_cfg = VocosConfig()
    key = jax.random.PRNGKey(0)
    g_vars = jax.jit(MegaG(g_cfg).init)(
        {"params": key, "vq": key},
        jnp.ones((1, 8), jnp.int32), jnp.zeros((1, 8), jnp.int32),
        jnp.asarray([8]), jnp.zeros((1, 64, 80)), jnp.zeros((1, 64, 80)),
    )
    plm_params = jax.jit(MegaPLM(plm_cfg).init)(
        key, jnp.zeros((1, 4, 512)), jnp.zeros((1, 5), jnp.int32), jnp.asarray([4])
    )["params"]
    adm_params = jax.jit(MegaADM(adm_cfg).init)(
        key, jnp.zeros((1, 4, 512)), jnp.zeros((1, 5, 1)), jnp.asarray([4])
    )["params"]
    voc_params = jax.jit(Vocos(voc_cfg).init)(key, jnp.zeros((1, 16, 80)))["params"]

    d = tempfile.mkdtemp(prefix="httpbench_")
    sym = os.path.join(d, "sym")
    words = ["w%d" % i for i in range(40)]
    with open(sym, "w") as f:
        f.write("<eps> 0\n")
        for i, w in enumerate(words):
            f.write(f"{w} {i + 1}\n")
    prompts = os.path.join(d, "prompts")
    os.makedirs(prompts)
    t = np.arange(16000 * 3) / 16000
    save_wav(os.path.join(prompts, "p.wav"),
             (0.2 * np.sin(2 * np.pi * 220 * t)).astype(np.float32))

    tts = Megatts(
        g_vars, plm_params, adm_params, voc_params, sym,
        g_cfg=g_cfg, plm_cfg=plm_cfg, adm_cfg=adm_cfg, hifi_cfg=voc_cfg,
        max_frames=args.max_frames, dtype=jnp.bfloat16, quant_int8=True,
    )
    rng = np.random.RandomState(0)
    texts = [
        " ".join(rng.choice(words, size=args.n_phones))
        for _ in range(args.requests)
    ]
    lat: list = []
    done = threading.Event()
    report = {}

    def drive(server):
        import urllib.request
        from concurrent.futures import ThreadPoolExecutor

        port = server.server_address[1]

        def post(txt, timeout=600):
            body = json.dumps({"text": txt, "wavs_dir": prompts}).encode()
            t0 = time.perf_counter()
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/synthesize", data=body,
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=timeout) as r:
                n = len(r.read())
            return time.perf_counter() - t0, n

        try:
            post(texts[0], timeout=3600)  # warm: first call pays compiles
            t_start = time.perf_counter()
            with ThreadPoolExecutor(args.clients) as ex:
                futs = []
                for txt in texts:
                    futs.append(ex.submit(post, txt))
                    time.sleep(rng.exponential(1.0 / args.rps))
                for f in futs:
                    lat.append(f.result()[0])
            wall = time.perf_counter() - t_start
            ls = np.sort(lat)
            report.update({
                "requests": len(lat), "clients": args.clients,
                "offered_rps": args.rps, "slots": args.slots,
                "achieved_rps": round(len(lat) / wall, 2),
                "p50_ms": round(float(np.percentile(ls, 50)) * 1e3, 1),
                "p90_ms": round(float(np.percentile(ls, 90)) * 1e3, 1),
                "p99_ms": round(float(np.percentile(ls, 99)) * 1e3, 1),
                "max_ms": round(float(ls[-1]) * 1e3, 1),
            })
        finally:
            done.set()
            server.shutdown()

    # start from serve.py's OWN argparse defaults so new server knobs can
    # never desynchronize this namespace again
    ns = serve_mod.parse_args([])
    ns.http = 0
    ns.slots = args.slots
    ns.max_frames = args.max_frames
    ns.chunk_frames = args.chunk_frames
    ns.quant_int8 = True
    serve_mod.run_http(ns, tts, _ready_cb=drive)
    assert done.is_set()
    print(json.dumps({"metric": "http_serving_latency", **report}))


if __name__ == "__main__":
    main()
