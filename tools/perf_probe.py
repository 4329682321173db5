"""TPU perf probe: vocoder lowering A/B, flash-vs-einsum attention A/B,
and cascade MFU.  Feeds BENCHMARKS.md (run on the real chip, in background;
~10 min cold, ~2 min warm cache).

    python tools/perf_probe.py [section ...]   # sections: hifigan attn cascade
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from megatts2_tpu import enable_compilation_cache
from megatts2_tpu.config import (
    HiFiGANConfig,
    MegaADMConfig,
    MegaGConfig,
    MegaPLMConfig,
)
from megatts2_tpu.utils.flops import PEAK_FLOPS, hifigan_flops, synthesis_flops

enable_compilation_cache()


_NOOP = None


def dispatch_overhead() -> float:
    global _NOOP
    if _NOOP is None:
        f = jax.jit(lambda x: x + 1.0)
        x = jnp.zeros(())
        np.asarray(f(x))
        t0 = time.perf_counter()
        for _ in range(10):
            np.asarray(f(x))
        _NOOP = (time.perf_counter() - t0) / 10
    return _NOOP


def scalarize(fn):
    """Wrap fn so only a scalar crosses the device→host tunnel."""
    return jax.jit(
        lambda *a: sum(
            jnp.sum(l.astype(jnp.float32))
            for l in jax.tree_util.tree_leaves(fn(*a))
        )
    )


def timeit(fn, *args, iters=10):
    """fn must return a SCALAR (use scalarize); dispatch overhead is
    subtracted."""
    np.asarray(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(fn(*args))
    return max((time.perf_counter() - t0) / iters - dispatch_overhead(), 1e-6)


def section_hifigan():
    import dataclasses

    from megatts2_tpu.models.hifigan import HiFiGAN

    B, T = 8, 512
    rng = np.random.RandomState(0)
    mel = jnp.asarray(rng.randn(B, T, 80).astype(np.float32))
    flops = hifigan_flops(HiFiGANConfig(), B, T)
    for name, s2d in (("s2d_ch32(default)", 32), ("s2d_ch64", 64), ("plain", 0)):
        cfg = dataclasses.replace(HiFiGANConfig(), space_to_depth_ch=s2d)
        model = HiFiGAN(cfg, dtype=jnp.bfloat16)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), mel[:1, :8])["params"]
        params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)
        f = scalarize(lambda p, m: model.apply({"params": p}, m))
        dt = timeit(f, params, mel)
        print(json.dumps({
            "section": "hifigan", "variant": name, "ms": round(dt * 1e3, 2),
            "gflop": round(flops / 1e9, 1),
            "mfu": round(flops / dt / PEAK_FLOPS["bf16"], 4),
        }), flush=True)


def section_vocos():
    """Vocos vs HiFi-GAN generator at bench geometry (B=8 x 512 frames)."""
    from megatts2_tpu.config import VocosConfig
    from megatts2_tpu.models.hifigan import HiFiGAN
    from megatts2_tpu.models.vocos import Vocos
    from megatts2_tpu.utils.flops import vocos_flops

    B, T = 8, 512
    rng = np.random.RandomState(0)
    mel = jnp.asarray(rng.randn(B, T, 80).astype(np.float32))
    for name, cfg, model_cls, fl in (
        ("vocos", VocosConfig(), Vocos, vocos_flops(VocosConfig(), B, T)),
        ("hifigan", HiFiGANConfig(), HiFiGAN, hifigan_flops(HiFiGANConfig(), B, T)),
    ):
        model = model_cls(cfg, dtype=jnp.bfloat16)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), mel[:1, :8])["params"]
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params
        )
        f = scalarize(lambda p, m: model.apply({"params": p}, m))
        dt = timeit(f, params, mel)
        print(json.dumps({
            "section": "vocos", "variant": name, "ms": round(dt * 1e3, 2),
            "gflop": round(fl / 1e9, 1),
            "mfu": round(fl / dt / PEAK_FLOPS["bf16"], 4),
        }), flush=True)


def section_attn(reps: int = 20):
    """Flash vs einsum attention at PLM-layer shapes.  Sub-10ms kernels are
    far below the ~75ms tunnel dispatch jitter, so each measurement runs
    ``reps`` dependency-chained iterations inside ONE jitted scan."""
    from megatts2_tpu.nn.transformer import _attend
    from megatts2_tpu.ops.attention_pallas import flash_attention_vjp
    from megatts2_tpu.ops.masks import make_attn_mask

    H, Dh = 16, 64
    for B, T in [(8, 512), (4, 1024), (2, 2048), (1, 4096)]:
        rng = np.random.RandomState(1)
        q = jnp.asarray(rng.randn(B, T, H, Dh).astype(np.float32), jnp.bfloat16)
        k = jnp.asarray(rng.randn(B, T, H, Dh).astype(np.float32), jnp.bfloat16)
        v = jnp.asarray(rng.randn(B, T, H, Dh).astype(np.float32), jnp.bfloat16)
        lens = jnp.full((B,), T, jnp.int32)
        flops_fwd = 4 * B * H * T * T * Dh / 2  # causal halves useful work

        def einsum_fwd(q, k, v, lens):
            mask = make_attn_mask(lens, T, causal=True)
            return _attend(q, k, v, mask)

        def flash_fwd(q, k, v, lens):
            return flash_attention_vjp(q, k, v, lens, True)

        def rep_fwd(fwd):
            def run(q, k, v, lens):
                def body(qc, _):
                    o = fwd(qc, k, v, lens)
                    return qc + jnp.bfloat16(1e-3) * o, ()
                qf, _ = jax.lax.scan(body, q, None, length=reps)
                return jnp.sum(qf.astype(jnp.float32))
            return jax.jit(run)

        def rep_train(fwd):
            def loss(q, k, v, lens):
                def body(qc, _):
                    o = fwd(qc, k, v, lens)
                    return qc + jnp.bfloat16(1e-3) * o, jnp.sum(o.astype(jnp.float32))
                _, ls = jax.lax.scan(body, q, None, length=reps)
                return jnp.sum(ls)
            g = jax.grad(loss, argnums=(0, 1, 2))
            return scalarize(lambda q, k, v, lens: g(q, k, v, lens))

        res = {"section": "attn", "B": B, "T": T, "reps": reps}
        for name, fwd in (("einsum", einsum_fwd), ("flash", flash_fwd)):
            try:
                dt_f = timeit(rep_fwd(fwd), q, k, v, lens, iters=3) / reps
                dt_t = timeit(rep_train(fwd), q, k, v, lens, iters=3) / reps
            except Exception as e:  # einsum-train OOMs at 4k (the flash
                res[f"{name}_fwdbwd_ms"] = "OOM"  # path is WHY 4k works)
                print(json.dumps(res), flush=True)
                print(f"# {name} at {B}x{T}: {type(e).__name__}", flush=True)
                continue
            res[f"{name}_fwd_ms"] = round(dt_f * 1e3, 3)
            res[f"{name}_fwdbwd_ms"] = round(dt_t * 1e3, 3)
            res[f"{name}_fwd_mfu"] = round(flops_fwd / dt_f / PEAK_FLOPS["bf16"], 4)
        print(json.dumps(res), flush=True)


def section_ar(reps: int = 5):
    """AR decode stage timings at bench geometry (B=8, 64 steps), with
    scan-unroll A/B.  Rep-chained inside one jit (see section_attn)."""
    from megatts2_tpu.models import MegaADM, MegaPLM
    from megatts2_tpu.models.adm import adm_infer
    from megatts2_tpu.models.plm import plm_infer

    B, T = 8, 64
    plm_cfg = MegaPLMConfig()
    adm_cfg = MegaADMConfig(tc_emb_dim=512)
    key = jax.random.PRNGKey(0)
    cast = lambda t: jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), t)
    plm_params = cast(jax.jit(MegaPLM(plm_cfg).init)(
        key, jnp.zeros((1, 4, 512)), jnp.zeros((1, 5), jnp.int32), jnp.asarray([4])
    )["params"])
    adm_params = cast(jax.jit(MegaADM(adm_cfg).init)(
        key, jnp.zeros((1, 4, 512)), jnp.zeros((1, 5, 1)), jnp.asarray([4])
    )["params"])
    rng = np.random.RandomState(0)
    tc = jnp.asarray(rng.randn(B, T, 512).astype(np.float32))

    unrolls = [int(u) for u in (sys.argv[2:] or [1, 4])]
    for name, infer, params, cfg in (
        ("plm_infer", plm_infer, plm_params, plm_cfg),
        ("adm_infer", adm_infer, adm_params, adm_cfg),
    ):
        for unroll in unrolls:
            # params ride as a jit ARGUMENT (closed-over params bake into
            # the HLO as constants → HTTP 413 on the remote compiler)
            def run(p, tc_in, u=unroll, infer=infer, cfg=cfg):
                def body(c, _):
                    out = infer(p, cfg, c, dtype=jnp.bfloat16, unroll=u)
                    return c + 1e-6 * jnp.sum(out).astype(c.dtype), ()
                cf, _ = jax.lax.scan(body, tc_in, None, length=reps)
                return jnp.sum(cf.astype(jnp.float32))

            dt = timeit(jax.jit(run), params, tc, iters=3) / reps
            print(json.dumps({
                "section": "ar", "stage": name, "B": B, "steps": T,
                "unroll": unroll, "ms": round(dt * 1e3, 2),
            }), flush=True)


def section_int8(reps: int = 5):
    """Int8 weight-only AR decode A/B at bench geometry (B=8, 64 steps):
    bf16 params vs quantize_tree'd int8 params (quant=True path)."""
    from megatts2_tpu.models import MegaADM, MegaPLM
    from megatts2_tpu.models.adm import adm_infer
    from megatts2_tpu.models.plm import plm_infer
    from megatts2_tpu.quantization.weight_only import quantize_tree

    B, T = 8, 64
    plm_cfg = MegaPLMConfig()
    adm_cfg = MegaADMConfig(tc_emb_dim=512)
    key = jax.random.PRNGKey(0)
    cast = lambda t: jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), t)
    plm_fp = jax.jit(MegaPLM(plm_cfg).init)(
        key, jnp.zeros((1, 4, 512)), jnp.zeros((1, 5), jnp.int32), jnp.asarray([4])
    )["params"]
    adm_fp = jax.jit(MegaADM(adm_cfg).init)(
        key, jnp.zeros((1, 4, 512)), jnp.zeros((1, 5, 1)), jnp.asarray([4])
    )["params"]
    variants = {
        "plm": [("bf16", cast(plm_fp), False), ("int8", quantize_tree(plm_fp), True)],
        "adm": [("bf16", cast(adm_fp), False), ("int8", quantize_tree(adm_fp), True)],
    }
    rng = np.random.RandomState(0)
    tc = jnp.asarray(rng.randn(B, T, 512).astype(np.float32))

    for stage, infer, cfg in (("plm", plm_infer, plm_cfg), ("adm", adm_infer, adm_cfg)):
        for name, params, quant in variants[stage]:
            def run(p, tc_in, infer=infer, cfg=cfg, quant=quant):
                def body(c, _):
                    out = infer(p, cfg, c, dtype=jnp.bfloat16, quant=quant)
                    return c + 1e-6 * jnp.sum(out).astype(c.dtype), ()
                cf, _ = jax.lax.scan(body, tc_in, None, length=reps)
                return jnp.sum(cf.astype(jnp.float32))

            dt = timeit(jax.jit(run), params, tc, iters=3) / reps
            print(json.dumps({
                "section": "int8", "stage": stage, "variant": name,
                "B": B, "steps": T, "ms": round(dt * 1e3, 2),
            }), flush=True)


def section_fastdecode(reps: int = 5):
    """fast_decode vs the flax decode scans at bench geometry (B=8, 64
    steps): the hand-scheduled loop removes the per-layer cache
    slice-in/out copies (see models/fast_decode.py)."""
    from megatts2_tpu.models import MegaADM, MegaPLM
    from megatts2_tpu.models.adm import adm_infer
    from megatts2_tpu.models.fast_decode import adm_fast_decode, plm_fast_decode
    from megatts2_tpu.models.plm import plm_infer
    from megatts2_tpu.quantization.weight_only import quantize_tree

    B, T = 8, 64
    plm_cfg = MegaPLMConfig()
    adm_cfg = MegaADMConfig(tc_emb_dim=512)
    key = jax.random.PRNGKey(0)
    cast = lambda t: jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), t)
    plm_fp = jax.jit(MegaPLM(plm_cfg).init)(
        key, jnp.zeros((1, 4, 512)), jnp.zeros((1, 5), jnp.int32), jnp.asarray([4])
    )["params"]
    adm_fp = jax.jit(MegaADM(adm_cfg).init)(
        key, jnp.zeros((1, 4, 512)), jnp.zeros((1, 5, 1)), jnp.asarray([4])
    )["params"]
    rng = np.random.RandomState(0)
    tc = jnp.asarray(rng.randn(B, T, 512).astype(np.float32))

    cases = [
        ("plm_scan_int8", plm_infer, quantize_tree(plm_fp), plm_cfg, True, {"fast": False}),
        ("plm_fast_int8", plm_fast_decode, quantize_tree(plm_fp), plm_cfg, True, {}),
        ("plm_scan_bf16", plm_infer, cast(plm_fp), plm_cfg, False, {"fast": False}),
        ("plm_fast_bf16", plm_fast_decode, cast(plm_fp), plm_cfg, False, {}),
        ("adm_scan_bf16", adm_infer, cast(adm_fp), adm_cfg, False, {"fast": False}),
        ("adm_fast_bf16", adm_fast_decode, cast(adm_fp), adm_cfg, False, {}),
        ("adm_fast_int8", adm_fast_decode, quantize_tree(adm_fp), adm_cfg, True, {}),
    ]
    for name, infer, params, cfg, quant, kw in cases:
        def run(p, tc_in, infer=infer, cfg=cfg, quant=quant, kw=kw):
            def body(c, _):
                out = infer(p, cfg, c, dtype=jnp.bfloat16, quant=quant, **kw)
                return c + 1e-6 * jnp.sum(out).astype(c.dtype), ()
            cf, _ = jax.lax.scan(body, tc_in, None, length=reps)
            return jnp.sum(cf.astype(jnp.float32))

        dt = timeit(jax.jit(run), params, tc, iters=3) / reps
        print(json.dumps({
            "section": "fastdecode", "case": name, "B": B, "steps": T,
            "ms": round(dt * 1e3, 2),
        }), flush=True)


def _full_models(quant: bool = True):
    """Full-size (reference-config) cascade params; PLM int8 when quant."""
    from megatts2_tpu.models import HiFiGAN, MegaADM, MegaG, MegaPLM
    from megatts2_tpu.quantization.weight_only import quantize_tree

    g_cfg = MegaGConfig()
    plm_cfg = MegaPLMConfig()
    adm_cfg = MegaADMConfig(tc_emb_dim=512)
    hifi_cfg = HiFiGANConfig()
    key = jax.random.PRNGKey(0)
    g_vars = jax.jit(MegaG(g_cfg).init)(
        {"params": key, "vq": key},
        jnp.ones((1, 64), jnp.int32), jnp.zeros((1, 64), jnp.int32),
        jnp.asarray([64]), jnp.zeros((1, 128, 80)), jnp.zeros((1, 128, 80)),
    )
    plm_params = jax.jit(MegaPLM(plm_cfg).init)(
        key, jnp.zeros((1, 4, 512)), jnp.zeros((1, 5), jnp.int32), jnp.asarray([4])
    )["params"]
    adm_params = jax.jit(MegaADM(adm_cfg).init)(
        key, jnp.zeros((1, 4, 512)), jnp.zeros((1, 5, 1)), jnp.asarray([4])
    )["params"]
    hifi_params = jax.jit(HiFiGAN(hifi_cfg).init)(key, jnp.zeros((1, 16, 80)))["params"]
    cast = lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t
    )
    g_vars = {"params": cast(g_vars["params"]), "vq_stats": g_vars["vq_stats"]}
    plm_params = quantize_tree(plm_params) if quant else cast(plm_params)
    adm_params, hifi_params = cast(adm_params), cast(hifi_params)
    return (g_vars, plm_params, adm_params, hifi_params), (
        g_cfg, plm_cfg, adm_cfg, hifi_cfg,
    )


def section_stream():
    """Streaming synthesis: time-to-first-audio vs one-shot latency for a
    long utterance (B=1, 2048-frame budget ≈ 33 s of audio)."""
    from megatts2_tpu.models.megatts import synthesize
    from megatts2_tpu.models.streaming import stream_synthesize

    Tp, Tm, max_frames, F = 256, 512, 2048, 256
    (g_vars, plm_params, adm_params, hifi_params), (
        g_cfg, plm_cfg, adm_cfg, hifi_cfg,
    ) = _full_models(quant=True)

    rng = np.random.RandomState(0)
    phones = rng.randint(1, 320, (1, Tp)).astype(np.int32)
    lens = np.full((1,), Tp, np.int32)
    mels = rng.randn(1, Tm, 80).astype(np.float32)

    def stream_once():
        t0 = time.perf_counter()
        ttfa = None
        n = 0
        for chunk in stream_synthesize(
            g_vars, plm_params, adm_params, hifi_params,
            g_cfg, plm_cfg, adm_cfg, hifi_cfg,
            phones, lens, mels, max_frames=max_frames, chunk_frames=F,
            dtype=jnp.bfloat16, quant=True,
        ):
            if ttfa is None:
                ttfa = time.perf_counter() - t0
            n += chunk.shape[0]
        return ttfa, time.perf_counter() - t0, n

    stream_once()  # compile
    ttfa, total_stream, n = stream_once()

    def full_once():
        t0 = time.perf_counter()
        wav, _, nf = synthesize(
            g_vars, plm_params, adm_params, hifi_params,
            g_cfg, plm_cfg, adm_cfg, hifi_cfg,
            jnp.asarray(phones), jnp.asarray(lens), jnp.asarray(mels),
            max_frames=max_frames, dtype=jnp.bfloat16, quant=True,
        )
        np.asarray(wav[:, -1])
        return time.perf_counter() - t0

    full_once()
    t_full = min(full_once() for _ in range(3))
    print(json.dumps({
        "section": "stream", "B": 1, "max_frames": max_frames,
        "chunk_frames": F, "ttfa_ms": round(ttfa * 1e3, 1),
        "stream_total_ms": round(total_stream * 1e3, 1),
        "full_latency_ms": round(t_full * 1e3, 1),
        "audio_samples": n,
        "ttfa_speedup_vs_full": round(t_full / ttfa, 2),
    }), flush=True)


def section_mel(reps: int = 20):
    """Plain-XLA vs fused-Pallas mel at the two production shapes:
    prepare_ds stage-1 batches (8 × 3.2 s) and vocoder-trainer segments
    (8 × 64 frames).  Decides whether the fused kernel earns a call site
    (round-2 verdict Weak #3)."""
    from megatts2_tpu.ops.mel import mel_spectrogram, mel_spectrogram_fused

    rng = np.random.RandomState(0)
    for name, B, n in (("prepare_ds", 8, 51200), ("vocoder_seg", 8, 64 * 256)):
        sig = jnp.asarray(rng.randn(B, n).astype(np.float32) * 0.1)
        for variant, fn in (("xla", mel_spectrogram), ("pallas_fused", mel_spectrogram_fused)):
            def run(s, fn=fn):
                def body(c, _):
                    m = fn(s)
                    return c + jnp.sum(m) * 1e-6, ()
                cf, _ = jax.lax.scan(body, jnp.float32(0), None, length=reps)
                return cf
            try:
                dt = timeit(jax.jit(run), sig, iters=3) / reps
            except Exception as e:
                print(json.dumps({"section": "mel", "shape": name,
                                  "variant": variant, "error": type(e).__name__}),
                      flush=True)
                continue
            print(json.dumps({
                "section": "mel", "shape": name, "B": B, "samples": n,
                "variant": variant, "ms": round(dt * 1e3, 3),
            }), flush=True)


def section_continuous():
    """Continuous-batching engine vs bucketed batch serving on mixed
    traffic (60% short ~128fr / 30% medium ~256fr / 10% long ~512fr —
    random-weight ADM ≈ 1 frame per phone, so phone counts set lengths)."""
    from megatts2_tpu.continuous import ContinuousEngine
    from megatts2_tpu.models.megatts import synthesize

    (g_vars, plm_params, adm_params, hifi_params), (
        g_cfg, plm_cfg, adm_cfg, hifi_cfg,
    ) = _full_models(quant=True)

    rng = np.random.RandomState(0)
    N = 32
    lengths = ([128] * 19 + [256] * 10 + [512] * 3)
    rng.shuffle(lengths)
    reqs = [
        {
            "id": i,
            "phone": rng.randint(1, 320, (1, L)).astype(np.int32),
            "lens": np.full((1,), L, np.int32),
            "mels_prompt": rng.randn(1, 512, 80).astype(np.float32),
        }
        for i, L in enumerate(lengths)
    ]

    def run_engine():
        eng = ContinuousEngine(
            g_vars, plm_params, adm_params, hifi_params,
            g_cfg, plm_cfg, adm_cfg, hifi_cfg,
            slots=8, max_frames=512, chunk_frames=256,
            dtype=jnp.bfloat16, quant=True,
        )
        t0 = time.perf_counter()
        audio = sum(w.shape[0] for _, w in eng.run(list(reqs)))
        return time.perf_counter() - t0, audio, eng.n_ticks

    run_engine()  # compile
    dt_eng, audio, ticks = run_engine()

    # bucketed baseline: group by frame bucket, B=8 batches, pad partials
    def run_bucketed():
        groups = {}
        for r in reqs:
            b = min(b for b in (128, 256, 512) if r["lens"][0] <= b)
            groups.setdefault(b, []).append(r)
        t0 = time.perf_counter()
        for b, rs in sorted(groups.items()):
            for i in range(0, len(rs), 8):
                chunk = rs[i : i + 8]
                chunk = chunk + [chunk[-1]] * (8 - len(chunk))  # pad batch
                Tp = max(r["phone"].shape[1] for r in chunk)
                Tp = -(-Tp // 16) * 16
                phone = np.zeros((8, Tp), np.int32)
                lens = np.zeros((8,), np.int32)
                for k, r in enumerate(chunk):
                    phone[k, : r["phone"].shape[1]] = r["phone"][0]
                    lens[k] = r["lens"][0]
                mels = np.stack([r["mels_prompt"][0] for r in chunk])
                wav, _, nf = synthesize(
                    g_vars, plm_params, adm_params, hifi_params,
                    g_cfg, plm_cfg, adm_cfg, hifi_cfg,
                    jnp.asarray(phone), jnp.asarray(lens), jnp.asarray(mels),
                    max_frames=b, dtype=jnp.bfloat16, quant=True,
                )
                np.asarray(wav[:, -1])
        return time.perf_counter() - t0

    run_bucketed()  # compile
    dt_bkt = run_bucketed()
    print(json.dumps({
        "section": "continuous", "requests": N,
        "workload": "60/30/10 short/med/long",
        "engine_s": round(dt_eng, 2), "engine_utt_per_s": round(N / dt_eng, 2),
        "engine_ticks": ticks,
        "bucketed_s": round(dt_bkt, 2), "bucketed_utt_per_s": round(N / dt_bkt, 2),
        "speedup": round(dt_bkt / dt_eng, 2),
        "audio_samples": audio,
    }), flush=True)


def section_buckets():
    """Cascade wall time per frame-bucket (the serve.py grouping): evidence
    for length-bucketed serving vs one worst-case budget."""
    times = {}
    for mf in (128, 256, 512):
        times[mf] = _time_cascade(max_frames=mf)
        print(json.dumps({
            "section": "buckets", "max_frames": mf,
            "ms": round(times[mf] * 1e3, 1),
        }), flush=True)
    # mixed traffic: 60% short (<=128 fr), 30% medium (<=256), 10% long
    mix = 0.6 * times[128] + 0.3 * times[256] + 0.1 * times[512]
    print(json.dumps({
        "section": "buckets", "workload": "60/30/10 short/med/long, B=8",
        "bucketed_ms_per_batch": round(mix * 1e3, 1),
        "single_bucket512_ms": round(times[512] * 1e3, 1),
        "speedup": round(times[512] / mix, 2),
    }), flush=True)


def _time_cascade(max_frames: int = 512, quant: bool = False, vocoder: str = "hifigan"):
    from megatts2_tpu.config import VocosConfig
    from megatts2_tpu.models import HiFiGAN, MegaADM, MegaG, MegaPLM, Vocos
    from megatts2_tpu.models.megatts import synthesize

    B, Tp, Tm = 8, 64, 512
    g_cfg = MegaGConfig()
    plm_cfg = MegaPLMConfig()
    adm_cfg = MegaADMConfig(tc_emb_dim=512)
    hifi_cfg = HiFiGANConfig() if vocoder == "hifigan" else VocosConfig()
    key = jax.random.PRNGKey(0)
    g_vars = jax.jit(MegaG(g_cfg).init)(
        {"params": key, "vq": key},
        jnp.ones((1, Tp), jnp.int32), jnp.zeros((1, Tp), jnp.int32),
        jnp.asarray([Tp]), jnp.zeros((1, 128, 80)), jnp.zeros((1, 128, 80)),
    )
    plm_params = jax.jit(MegaPLM(plm_cfg).init)(
        key, jnp.zeros((1, 4, 512)), jnp.zeros((1, 5), jnp.int32), jnp.asarray([4])
    )["params"]
    adm_params = jax.jit(MegaADM(adm_cfg).init)(
        key, jnp.zeros((1, 4, 512)), jnp.zeros((1, 5, 1)), jnp.asarray([4])
    )["params"]
    voc_cls = HiFiGAN if vocoder == "hifigan" else Vocos
    hifi_params = jax.jit(voc_cls(hifi_cfg).init)(key, jnp.zeros((1, 16, 80)))["params"]
    cast = lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t
    )
    g_vars = {"params": cast(g_vars["params"]), "vq_stats": g_vars["vq_stats"]}
    if quant:
        from megatts2_tpu.quantization.weight_only import quantize_tree

        plm_params = quantize_tree(plm_params)
    else:
        plm_params = cast(plm_params)
    adm_params, hifi_params = cast(adm_params), cast(hifi_params)

    rng = np.random.RandomState(0)
    phones = jnp.asarray(rng.randint(1, 320, (B, Tp)), jnp.int32)
    lens = jnp.full((B,), Tp, jnp.int32)
    mels = jnp.asarray(rng.randn(B, Tm, 80).astype(np.float32))

    def run():
        wav, _, nf = synthesize(
            g_vars, plm_params, adm_params, hifi_params,
            g_cfg, plm_cfg, adm_cfg, hifi_cfg,
            phones, lens, mels, max_frames=max_frames, dtype=jnp.bfloat16,
            quant=quant,
        )
        np.asarray(wav[:, -1])
        return wav

    run()
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        run()
    return (time.perf_counter() - t0) / iters


def section_cascade():
    B, Tp, Tm, max_frames = 8, 64, 512, 512
    fl = synthesis_flops(
        MegaGConfig(), MegaPLMConfig(), MegaADMConfig(tc_emb_dim=512),
        HiFiGANConfig(), B, Tp, Tm, max_frames,
    )
    from megatts2_tpu.config import VocosConfig

    fl_vocos = synthesis_flops(
        MegaGConfig(), MegaPLMConfig(), MegaADMConfig(tc_emb_dim=512),
        VocosConfig(), B, Tp, Tm, max_frames,
    )
    for quant, vocoder in ((False, "hifigan"), (True, "hifigan"), (True, "vocos")):
        f = fl_vocos if vocoder == "vocos" else fl
        dt = _time_cascade(max_frames, quant=quant, vocoder=vocoder)
        print(json.dumps({
            "section": "cascade", "B": B, "quant_int8": quant, "vocoder": vocoder,
            "ms": round(dt * 1e3, 1),
            "gflop_total": round(f["total"] / 1e9, 1),
            "stage_gflop": {k: round(v / 1e9, 1) for k, v in f.items() if k != "total"},
            "mfu": round(f["total"] / dt / PEAK_FLOPS["bf16"], 4),
        }), flush=True)


if __name__ == "__main__":
    sections = [s for s in sys.argv[1:] if not s.isdigit()] or [
        "hifigan", "attn", "cascade"
    ]
    for s in sections:
        globals()[f"section_{s}"]()
