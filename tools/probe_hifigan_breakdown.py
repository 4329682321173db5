"""Where does HiFi-GAN time go on the v5e?  Times each sub-graph in
isolation (conv_pre, each transposed-conv upsample, each stage's MRF
resblock bank, conv_post) plus candidate optimizations for the dominant
piece.  Run on TPU: python tools/probe_hifigan_breakdown.py
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from megatts2_tpu import enable_compilation_cache
from megatts2_tpu.config import HiFiGANConfig
from megatts2_tpu.models.hifigan import ResBlock1, TransposedConv1d
from megatts2_tpu.utils.flops import PEAK_FLOPS

enable_compilation_cache()
DT = jnp.bfloat16


_NOOP = None


def dispatch_overhead() -> float:
    """Per-call cost of dispatch + scalar device→host on this target
    (~75 ms through the axon tunnel); subtracted from all measurements."""
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


def timeit(fn, *args, iters=10):
    """fn must be jitted and return a SCALAR (only a scalar crosses the
    tunnel; transferring real outputs would swamp the measurement)."""
    np.asarray(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(fn(*args))
    return max((time.perf_counter() - t0) / iters - dispatch_overhead(), 1e-6)


RESULTS = "/tmp/probe_hifigan_results.jsonl"


def bench_module(tag, mod, x, flops):
    params = jax.jit(mod.init)(jax.random.PRNGKey(0), x[:1, :256])["params"]
    params = jax.tree_util.tree_map(lambda a: a.astype(DT), params)
    f = jax.jit(
        lambda p, y: jnp.sum(mod.apply({"params": p}, y).astype(jnp.float32))
    )
    dt = timeit(f, params, x, iters=5)
    line = json.dumps({
        "tag": tag, "ms": round(dt * 1e3, 2), "gflop": round(flops / 1e9, 1),
        "mfu": round(flops / dt / PEAK_FLOPS["bf16"], 4),
        "shape": list(x.shape),
    })
    print(line, flush=True)
    with open(RESULTS, "a") as fh:
        fh.write(line + "\n")
    return dt


class ResBank(nn.Module):
    """The 3-kernel MRF bank of one stage (sum/3)."""

    ch: int
    cfg: HiFiGANConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        acc = None
        for j, (rk, rd) in enumerate(
            zip(c.resblock_kernel_sizes, c.resblock_dilation_sizes)
        ):
            y = ResBlock1(self.ch, rk, tuple(rd), c.lrelu_slope, dtype=DT,
                          name=f"rb_{j}")(x)
            acc = y if acc is None else acc + y
        return acc / len(c.resblock_kernel_sizes)


class BlockedResBlock(nn.Module):
    """ResBlock1 with time blocked into channels (space-to-depth by ``blk``):
    (B, T, ch) -> (B, T/blk, blk*ch), convs carried out on the blocked
    layout with equivalent Toeplitz kernels — bigger K/N for the MXU."""

    ch: int
    kernel_size: int
    dilations: tuple
    blk: int = 4

    @nn.compact
    def __call__(self, x):  # x (B, T, ch)
        B, T, ch = x.shape
        blk = self.blk
        xb = x.reshape(B, T // blk, blk * ch)
        for i, d in enumerate(self.dilations):
            k = self.kernel_size
            span = (k - 1) * d  # one-sided span in samples = span/2 each way
            half = span // 2
            taps = -(-(half) // blk)  # blocked taps on each side
            y = nn.leaky_relu(xb, 0.1)
            y = nn.Conv(blk * ch, (2 * taps + 1,), padding=[(taps, taps)],
                        dtype=DT, name=f"c1_{i}")(y)
            y = nn.leaky_relu(y, 0.1)
            half2 = (k - 1) // 2
            taps2 = -(-half2 // blk)
            y = nn.Conv(blk * ch, (2 * taps2 + 1,), padding=[(taps2, taps2)],
                        dtype=DT, name=f"c2_{i}")(y)
            xb = xb + y
        return xb.reshape(B, T, ch)


def sec_stages01():
    cfg = HiFiGANConfig()
    B, T0 = 8, 512
    rng = np.random.RandomState(0)
    x80 = jnp.asarray(rng.randn(B, T0, 80).astype(np.float32), DT)
    bench_module("conv_pre", nn.Conv(512, (7,), padding=[(3, 3)], dtype=DT),
                 x80, B * T0 * 7 * 80 * 512 * 2)
    t = T0
    ch_in = 512
    for i in (0, 1):
        r, k = cfg.upsample_rates[i], cfg.upsample_kernel_sizes[i]
        ch = 512 // (2 ** (i + 1))
        x = jnp.asarray(rng.randn(B, t, ch_in).astype(np.float32), DT)
        bench_module(f"ups_{i}(k{k},s{r},{ch_in}->{ch})",
                     TransposedConv1d(ch, k, r, dtype=DT), x,
                     B * t * k * ch_in * ch * 2)
        t *= r
        xr = jnp.asarray(rng.randn(B, t, ch).astype(np.float32), DT)
        fl = sum(len(rd) * 2 * B * t * rk * ch * ch * 2
                 for rk, rd in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes))
        bench_module(f"resbank_{i}(T{t},ch{ch})", ResBank(ch, cfg), xr, fl)
        ch_in = ch


def sec_stages23():
    cfg = HiFiGANConfig()
    B = 8
    rng = np.random.RandomState(0)
    t, ch_in = 32768, 128
    for i in (2, 3):
        r, k = cfg.upsample_rates[i], cfg.upsample_kernel_sizes[i]
        ch = 512 // (2 ** (i + 1))
        x = jnp.asarray(rng.randn(B, t, ch_in).astype(np.float32), DT)
        bench_module(f"ups_{i}(k{k},s{r},{ch_in}->{ch})",
                     TransposedConv1d(ch, k, r, dtype=DT), x,
                     B * t * k * ch_in * ch * 2)
        t *= r
        xr = jnp.asarray(rng.randn(B, t, ch).astype(np.float32), DT)
        fl = sum(len(rd) * 2 * B * t * rk * ch * ch * 2
                 for rk, rd in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes))
        bench_module(f"resbank_{i}(T{t},ch{ch})", ResBank(ch, cfg), xr, fl)
        ch_in = ch
    xl = jnp.asarray(rng.randn(B, t, 32).astype(np.float32), DT)
    bench_module("conv_post", nn.Conv(1, (7,), padding=[(3, 3)], dtype=DT),
                 xl, B * t * 7 * 32 * 2)


def sec_blocked():
    B = 8
    rng = np.random.RandomState(0)
    for t_s, ch in [(65536, 64), (131072, 32)]:
        xr = jnp.asarray(rng.randn(B, t_s, ch).astype(np.float32), DT)
        fl = 3 * 2 * B * t_s * 11 * ch * ch * 2
        bench_module(f"rb_plain(T{t_s},ch{ch},k11)",
                     ResBlock1(ch, 11, (1, 3, 5), dtype=DT), xr, fl)
        bench_module(f"rb_blocked(T{t_s},ch{ch},k11,blk4)",
                     BlockedResBlock(ch, 11, (1, 3, 5), blk=4), xr, fl)


if __name__ == "__main__":
    for sec in sys.argv[1:] or ["stages01", "stages23", "blocked"]:
        globals()[f"sec_{sec}"]()
