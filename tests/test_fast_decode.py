"""fast_decode (hand-scheduled AR loops) must reproduce the flax
decode_step scans op-for-op — it is a scheduling change, not a model
change (models/fast_decode.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from megatts2_tpu.config import MegaADMConfig, MegaPLMConfig
from megatts2_tpu.models import MegaADM, MegaPLM
from megatts2_tpu.models.adm import adm_infer
from megatts2_tpu.models.fast_decode import adm_fast_decode, plm_fast_decode
from megatts2_tpu.models.plm import plm_infer
from megatts2_tpu.quantization.weight_only import quantize_tree

PLM_CFG = MegaPLMConfig(
    n_layers=3, n_heads=4, vq_dim=32, tc_latent_dim=32, vq_bins=64,
    dropout=0.0, use_flash=False,
)
ADM_CFG = MegaADMConfig(
    n_layers=3, n_heads=4, emb_dim=32, tc_latent_dim=32, tc_emb_dim=32,
    dropout=0.0,
)


def _plm_params():
    return jax.jit(MegaPLM(PLM_CFG).init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 4, 32)),
        jnp.zeros((1, 5), jnp.int32), jnp.asarray([4]),
    )["params"]


def _adm_params():
    return jax.jit(MegaADM(ADM_CFG).init)(
        jax.random.PRNGKey(1), jnp.zeros((1, 4, 32)),
        jnp.zeros((1, 5, 1)), jnp.asarray([4]),
    )["params"]


class TestPLMFastDecode:
    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
    def test_matches_plm_infer(self, dtype):
        params = _plm_params()
        rng = np.random.RandomState(0)
        tc = jnp.asarray(rng.randn(3, 12, 32), jnp.float32)
        ref = np.asarray(plm_infer(params, PLM_CFG, tc, dtype=dtype, fast=False))
        got = np.asarray(plm_fast_decode(params, PLM_CFG, tc, dtype=dtype))
        np.testing.assert_array_equal(got, ref)

    def test_matches_plm_infer_int8(self):
        params = _plm_params()
        qp = quantize_tree(params)
        rng = np.random.RandomState(1)
        tc = jnp.asarray(rng.randn(2, 10, 32), jnp.float32)
        ref = np.asarray(plm_infer(qp, PLM_CFG, tc, dtype=jnp.bfloat16, quant=True, fast=False))
        got = np.asarray(plm_fast_decode(qp, PLM_CFG, tc, dtype=jnp.bfloat16, quant=True))
        np.testing.assert_array_equal(got, ref)

    def test_matches_sampling(self):
        params = _plm_params()
        rng = np.random.RandomState(2)
        tc = jnp.asarray(rng.randn(2, 8, 32), jnp.float32)
        key = jax.random.PRNGKey(7)
        ref = np.asarray(plm_infer(
            params, PLM_CFG, tc, dtype=jnp.float32,
            temperature=0.8, top_k=8, rng=key, fast=False,
        ))
        got = np.asarray(plm_fast_decode(
            params, PLM_CFG, tc, dtype=jnp.float32,
            temperature=0.8, top_k=8, rng=key,
        ))
        np.testing.assert_array_equal(got, ref)

    def test_matches_prompted(self):
        """Prompt prefill via the flax path; its cache stack feeds the
        fast loop directly (same (L, B, P+T, H*Dh) layout)."""
        params = _plm_params()
        rng = np.random.RandomState(3)
        B, T, P = 2, 8, 6
        tc = jnp.asarray(rng.randn(B, T, 32), jnp.float32)
        ptc = jnp.asarray(rng.randn(B, P, 32), jnp.float32)
        pcodes = jnp.asarray(rng.randint(0, 64, (B, P)), jnp.int32)
        ref = np.asarray(plm_infer(
            params, PLM_CFG, tc, dtype=jnp.float32,
            prompt_tc=ptc, prompt_codes=pcodes, fast=False,
        ))

        model = MegaPLM(PLM_CFG, dtype=jnp.float32, decode=True,
                        max_decode_len=P + T)
        bos = jnp.full((B, 1), PLM_CFG.bos_id, jnp.int32)
        prev_prompt = jnp.concatenate([bos, pcodes[:, :-1]], axis=1)
        _, cache = model.apply(
            {"params": params}, ptc, prev_prompt,
            method=MegaPLM.prefill, mutable=["cache"],
        )
        att = cache["cache"]["plm"]["layers"]["attn"]
        got = np.asarray(plm_fast_decode(
            params, PLM_CFG, tc, dtype=jnp.float32,
            init_cache=(att["k"], att["v"]), start_pos=P,
            prev0=pcodes[:, -1],
        ))
        np.testing.assert_array_equal(got, ref)

    def test_full_size_one_step_logit_parity(self):
        """Production dims (12L, d1024): greedy codes equal at a short
        horizon (bf16 — same dtype both paths)."""
        cfg = MegaPLMConfig(dropout=0.0, use_flash=False)
        params = jax.jit(MegaPLM(cfg).init)(
            jax.random.PRNGKey(3), jnp.zeros((1, 4, 512)),
            jnp.zeros((1, 5), jnp.int32), jnp.asarray([4]),
        )["params"]
        rng = np.random.RandomState(4)
        tc = jnp.asarray(rng.randn(2, 4, 512), jnp.float32)
        ref = np.asarray(plm_infer(params, cfg, tc, dtype=jnp.bfloat16, fast=False))
        got = np.asarray(plm_fast_decode(params, cfg, tc, dtype=jnp.bfloat16))
        np.testing.assert_array_equal(got, ref)


class TestADMFastDecode:
    def test_matches_adm_infer_fp32(self):
        params = _adm_params()
        rng = np.random.RandomState(5)
        tc = jnp.asarray(rng.randn(3, 12, 32), jnp.float32)
        ref = np.asarray(adm_infer(params, ADM_CFG, tc, dtype=jnp.float32, fast=False))
        got = np.asarray(adm_fast_decode(params, ADM_CFG, tc, dtype=jnp.float32))
        np.testing.assert_array_equal(got, ref)

    def test_matches_adm_infer_bf16(self):
        """bf16: nn.scan's stacked-weight slices round differently than
        any unrolled application (verified per-layer-equal otherwise), so
        a duration on a +0.5 boundary may flip by one frame — accept <=1
        frame on <=10% of positions (module docstring)."""
        params = _adm_params()
        rng = np.random.RandomState(5)
        tc = jnp.asarray(rng.randn(3, 12, 32), jnp.float32)
        ref = np.asarray(adm_infer(params, ADM_CFG, tc, dtype=jnp.bfloat16, fast=False))
        got = np.asarray(adm_fast_decode(params, ADM_CFG, tc, dtype=jnp.bfloat16))
        diff = np.abs(got.astype(np.int64) - ref.astype(np.int64))
        assert diff.max() <= 1, diff
        assert (diff > 0).mean() <= 0.10, (diff > 0).mean()

    def test_matches_adm_infer_int8(self):
        params = _adm_params()
        qp = quantize_tree(params)
        rng = np.random.RandomState(6)
        tc = jnp.asarray(rng.randn(2, 10, 32), jnp.float32)
        ref = np.asarray(adm_infer(qp, ADM_CFG, tc, dtype=jnp.bfloat16, quant=True, fast=False))
        got = np.asarray(adm_fast_decode(qp, ADM_CFG, tc, dtype=jnp.bfloat16, quant=True))
        np.testing.assert_array_equal(got, ref)
