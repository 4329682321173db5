"""Int8 weight-only decode quantization (quantization/weight_only.py).

A TPU-serving extension with no reference counterpart (the reference
decodes full precision, models/megatts2.py:165-181); these tests pin the
numerics: per-channel round-trip error bounds, QDense == dequantized
matmul, and quantized PLM/ADM decodes staying close to (and usually
exactly matching) the full-precision greedy paths.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from megatts2_tpu.config import MegaADMConfig, MegaPLMConfig
from megatts2_tpu.models import MegaADM, MegaPLM
from megatts2_tpu.models.adm import adm_infer
from megatts2_tpu.models.plm import plm_infer
from megatts2_tpu.quantization.weight_only import (
    QDense,
    dequantize_tree,
    quantize_kernel,
    quantize_tree,
)


class TestQuantizeKernel:
    def test_roundtrip_error_bound(self):
        rng = np.random.RandomState(0)
        w = jnp.asarray(rng.randn(64, 48).astype(np.float32))
        q, s = quantize_kernel(w)
        assert q.dtype == jnp.int8 and s.shape == (48,)
        back = q.astype(jnp.float32) * s[None, :]
        # symmetric round-to-nearest: |err| <= scale/2 = max|col|/254
        bound = np.abs(np.asarray(w)).max(axis=0) / 254.0 + 1e-7
        err = np.abs(np.asarray(back - w))
        assert (err <= bound[None, :]).all()

    def test_stacked_kernel_per_layer_scales(self):
        rng = np.random.RandomState(1)
        w = rng.randn(3, 16, 8).astype(np.float32)
        w[1] *= 10.0  # layer 1 has 10x dynamic range
        q, s = quantize_kernel(jnp.asarray(w))
        assert q.shape == (3, 16, 8) and s.shape == (3, 8)
        # each layer saturates its own scale
        assert np.abs(np.asarray(q)).max(axis=(1,)).min() == 127

    def test_tree_walk_and_dequantize(self):
        rng = np.random.RandomState(2)
        tree = {
            "layer": {
                "kernel": jnp.asarray(rng.randn(8, 4), jnp.float32),
                "bias": jnp.asarray(rng.randn(4), jnp.float32),
            },
            "norm": {"scale": jnp.ones((8,)), "bias": jnp.zeros((8,))},
        }
        qt = quantize_tree(tree)
        assert set(qt["layer"]) == {"kernel_q", "scale", "bias"}
        assert qt["norm"] == tree["norm"]  # untouched (no "kernel" leaf)
        back = dequantize_tree(qt)
        np.testing.assert_allclose(
            np.asarray(back["layer"]["kernel"]),
            np.asarray(tree["layer"]["kernel"]),
            atol=float(np.abs(tree["layer"]["kernel"]).max()) / 200,
        )


class TestInt4Packed:
    """Packed-nibble int4 (quantize_tree bits=4): measured SLOWER than
    int8 for decode on v5e (unpack is VPU-bound — BENCHMARKS.md), kept as
    a memory-halving serving option.  These tests pin the pack/unpack
    layout and the two-half-dot consumer."""

    def test_pack_unpack_roundtrip(self):
        from megatts2_tpu.quantization.weight_only import unpack_int4

        rng = np.random.RandomState(3)
        w = jnp.asarray(rng.randn(64, 48).astype(np.float32)) * 0.3
        p, s = quantize_kernel(w, bits=4)
        assert p.dtype == jnp.uint8 and p.shape == (32, 48) and s.shape == (48,)
        lo, hi = unpack_int4(p, jnp.float32)
        back = jnp.concatenate([lo, hi], axis=0) * s[None, :]
        # |err| <= scale/2 = max|col|/14
        bound = np.abs(np.asarray(w)).max(axis=0) / 14.0 + 1e-7
        assert (np.abs(np.asarray(back - w)) <= bound[None, :]).all()

    def test_dense_two_half_dots_match_dequant(self):
        from megatts2_tpu.models.fast_decode import _dense

        rng = np.random.RandomState(4)
        w = jnp.asarray(rng.randn(64, 48).astype(np.float32)) * 0.2
        x = jnp.asarray(rng.randn(4, 64).astype(np.float32))
        b = jnp.asarray(rng.randn(48).astype(np.float32))
        p, s = quantize_kernel(w, bits=4)
        qt = dequantize_tree({"m": {"kernel_q": p, "scale": s}})
        y_ref = x @ qt["m"]["kernel"] + b
        y = _dense(x, p, jnp.float32, scale=s, bias=b)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-4)

    def test_tree_mixed_leaves_odd_k_stays_int8(self):
        rng = np.random.RandomState(5)
        tree = {
            "even": {"kernel": jnp.asarray(rng.randn(8, 4), jnp.float32)},
            "odd": {"kernel": jnp.asarray(rng.randn(1, 4), jnp.float32)},
        }
        qt = quantize_tree(tree, bits=4)
        assert qt["even"]["kernel_q"].dtype == jnp.uint8
        assert qt["odd"]["kernel_q"].dtype == jnp.int8  # (1, D) can't pack

    def test_plm_fast_decode_int4_runs(self):
        from megatts2_tpu.models.fast_decode import plm_fast_decode

        cfg, params = _tiny_plm()
        rng = np.random.RandomState(6)
        tc = jnp.asarray(
            rng.randn(2, 6, cfg.d_model - cfg.vq_dim), jnp.float32
        )
        q4 = quantize_tree(params, bits=4)
        codes = np.asarray(
            jax.jit(
                lambda p, t: plm_fast_decode(p, cfg, t, dtype=jnp.float32,
                                             quant=True)
            )(q4, tc)
        )
        assert codes.shape == (2, 6)
        assert ((codes >= 0) & (codes < cfg.vq_bins + 2)).all()

    def test_int4_rejected_by_qdense_paths(self):
        """int4 trees only work on the fast-decode matmuls; every flax
        QDense consumer must reject them with a clear error instead of a
        flax shape error (regression: the guard in plm_infer/adm_infer)."""
        from megatts2_tpu.quantization.weight_only import is_int4_tree

        cfg, params = _tiny_plm()
        q4 = quantize_tree(params, bits=4)
        q8 = quantize_tree(params, bits=8)
        assert is_int4_tree(q4) and not is_int4_tree(q8)
        rng = np.random.RandomState(7)
        tc = jnp.asarray(rng.randn(2, 6, cfg.tc_latent_dim), jnp.float32)
        with pytest.raises(NotImplementedError, match="int4"):
            plm_infer(q4, cfg, tc, quant=True, fast=False)
        ptc = jnp.asarray(rng.randn(2, 4, cfg.tc_latent_dim), jnp.float32)
        pcodes = jnp.zeros((2, 4), jnp.int32)
        with pytest.raises(NotImplementedError, match="int4"):
            plm_infer(q4, cfg, tc, quant=True, fast=True,
                      prompt_tc=ptc, prompt_codes=pcodes)
        # int8 + prompt prefill stays allowed (no raise at trace entry)
        plm_infer(q8, cfg, tc, quant=True, prompt_tc=ptc,
                  prompt_codes=pcodes)


class TestQDense:
    def test_matches_dequantized_dense(self):
        rng = np.random.RandomState(3)
        w = jnp.asarray(rng.randn(32, 16).astype(np.float32) * 0.1)
        b = jnp.asarray(rng.randn(16).astype(np.float32) * 0.1)
        x = jnp.asarray(rng.randn(4, 32).astype(np.float32))
        qp = quantize_tree({"kernel": w, "bias": b})
        y = QDense(16, dtype=jnp.float32).apply({"params": qp}, x)
        w_back = qp["kernel_q"].astype(jnp.float32) * qp["scale"][None, :]
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(x @ w_back + b), rtol=1e-5, atol=1e-5
        )


def _tiny_plm():
    cfg = MegaPLMConfig(
        n_layers=2, n_heads=4, vq_dim=32, tc_latent_dim=32, vq_bins=40,
        dropout=0.0, use_flash=False,
    )
    key = jax.random.PRNGKey(0)
    params = jax.jit(MegaPLM(cfg).init)(
        key,
        jnp.zeros((1, 4, cfg.tc_latent_dim)),
        jnp.zeros((1, 5), jnp.int32),
        jnp.asarray([4]),
    )["params"]
    return cfg, params


def _tiny_adm():
    cfg = MegaADMConfig(
        n_layers=2, n_heads=4, emb_dim=32, tc_emb_dim=32, tc_latent_dim=48,
        dropout=0.0,
    )
    key = jax.random.PRNGKey(1)
    params = jax.jit(MegaADM(cfg).init)(
        key,
        jnp.zeros((1, 4, cfg.tc_latent_dim)),
        jnp.zeros((1, 5, 1)),
        jnp.asarray([4]),
    )["params"]
    return cfg, params


class TestQuantizedDecode:
    def test_plm_quant_close_to_fp32(self):
        cfg, params = _tiny_plm()
        rng = np.random.RandomState(4)
        tc = jnp.asarray(rng.randn(2, 12, cfg.d_model - cfg.vq_dim), jnp.float32)
        codes_fp = plm_infer(params, cfg, tc)
        qp = quantize_tree(params)
        codes_q = jax.jit(
            lambda p, t: plm_infer(p, cfg, t, quant=True)
        )(qp, tc)
        assert codes_q.shape == codes_fp.shape
        # greedy argmax under <1% logit perturbation: the vast majority of
        # steps pick the identical code on random weights
        agree = float((codes_q == codes_fp).mean())
        assert agree >= 0.9, agree

    def test_plm_quant_logits_close(self):
        """First-step logits: quant vs fp32 within tight relative error."""
        cfg, params = _tiny_plm()
        rng = np.random.RandomState(5)
        tc = jnp.asarray(rng.randn(2, 1, cfg.d_model - cfg.vq_dim), jnp.float32)
        bos = jnp.full((2,), cfg.bos_id, jnp.int32)

        def logits(p, quant):
            m = MegaPLM(cfg, decode=True, max_decode_len=4, quant=quant)
            out, _ = m.apply(
                {"params": p}, tc, bos, jnp.asarray(0, jnp.int32),
                method=MegaPLM.decode_step, mutable=["cache"],
            )
            return out

        lf = np.asarray(logits(params, False))
        lq = np.asarray(logits(quantize_tree(params), True))
        denom = np.abs(lf).max() + 1e-9
        assert np.abs(lq - lf).max() / denom < 0.02

    def test_adm_quant_durations_close(self):
        cfg, params = _tiny_adm()
        rng = np.random.RandomState(6)
        tc = jnp.asarray(rng.randn(2, 10, 48), jnp.float32)
        d_fp = adm_infer(params, cfg, tc)
        d_q = jax.jit(lambda p, t: adm_infer(p, cfg, t, quant=True))(
            quantize_tree(params), tc
        )
        assert d_q.shape == d_fp.shape
        assert np.abs(np.asarray(d_q) - np.asarray(d_fp)).max() <= 1

    # full-cascade quant_int8 coverage lives in
    # tests/test_e2e.py::test_quant_int8_synthesize (reuses the e2e fixture)
