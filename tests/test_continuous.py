"""Continuous-batching engine (megatts2_tpu/continuous.py): per-slot
decode positions, in-place admission, frozen finished slots — every
request's output must equal the one-shot ``synthesize`` at the engine's
frame budget, regardless of what shares the batch with it.
"""
import jax
import jax.numpy as jnp
import numpy as np

from megatts2_tpu.continuous import ContinuousEngine
from megatts2_tpu.models import MegaPLM
from megatts2_tpu.models.megatts import synthesize
from megatts2_tpu.models.plm import plm_infer
from tests.test_streaming import (
    TINY_ADM,
    TINY_G,
    TINY_HIFI,
    TINY_PLM,
    _cascade_vars,
)


class TestPerSlotDecode:
    def test_per_slot_matches_scalar_when_aligned(self):
        """per_slot=True with all rows at the same position must reproduce
        the scalar-index decode exactly (same math, scattered writes)."""
        cfg = TINY_PLM
        key = jax.random.PRNGKey(0)
        params = jax.jit(MegaPLM(cfg).init)(
            key, jnp.zeros((1, 4, 16)), jnp.zeros((1, 5), jnp.int32), jnp.asarray([4])
        )["params"]
        rng = np.random.RandomState(0)
        tc = jnp.asarray(rng.randn(3, 10, 16), jnp.float32)
        ref = plm_infer(params, cfg, tc)  # scalar-index KV cache

        T = 10
        model = MegaPLM(cfg, decode=True, max_decode_len=T, per_slot=True)
        B = 3
        prev = jnp.full((B,), cfg.bos_id, jnp.int32)
        pos = jnp.zeros((B,), jnp.int32)
        _, cache = model.apply(
            {"params": params}, tc[:, :1], prev, pos,
            method=MegaPLM.decode_step, mutable=["cache"],
        )
        cache = jax.tree_util.tree_map(jnp.zeros_like, cache)
        codes = []
        for t in range(T):
            tc_t = jax.vmap(
                lambda x, i: jax.lax.dynamic_slice_in_dim(x, i, 1, axis=0)
            )(tc, pos)
            logits, cache = model.apply(
                {"params": params, **cache}, tc_t, prev, pos,
                method=MegaPLM.decode_step, mutable=["cache"],
            )
            prev = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            pos = pos + 1
            codes.append(np.asarray(prev))
        np.testing.assert_array_equal(np.stack(codes, 1), np.asarray(ref))


class TestEngineEqualsSynthesize:
    def test_mixed_lengths_interleaved(self):
        g_vars, plm_params, adm_params, hifi_params = _cascade_vars()
        rng = np.random.RandomState(0)
        # 3 requests of different lengths through 2 slots → the third is
        # admitted mid-flight into whichever slot frees first
        reqs = []
        for i, tp in enumerate((40, 64, 24)):
            reqs.append({
                "id": f"r{i}",
                "phone": rng.randint(1, 40, (1, tp)).astype(np.int32),
                "lens": np.full((1,), tp, np.int32),
                "mels_prompt": rng.randn(1, 64, 80).astype(np.float32),
            })

        eng = ContinuousEngine(
            g_vars, plm_params, adm_params, hifi_params,
            TINY_G, TINY_PLM, TINY_ADM, TINY_HIFI,
            slots=2, max_frames=96, chunk_frames=32, dtype=jnp.float32,
        )
        got = dict(eng.run(list(reqs)))
        assert set(got) == {"r0", "r1", "r2"}

        for r in reqs:
            # the engine pads phones per-request to the next 16 bucket
            # (same as synthesize_batch) — mirror it for the reference call
            tp = r["phone"].shape[1]
            Tp = -(-tp // 16) * 16
            phone = np.zeros((1, Tp), np.int32)
            phone[0, :tp] = r["phone"][0]
            wav_full, _, n_frames = synthesize(
                g_vars, plm_params, adm_params, hifi_params,
                TINY_G, TINY_PLM, TINY_ADM, TINY_HIFI,
                jnp.asarray(phone), jnp.asarray(r["lens"]),
                jnp.asarray(r["mels_prompt"]),
                max_frames=eng.Tmax, dtype=jnp.float32,
            )
            total = int(np.asarray(n_frames)[0]) * 256
            assert got[r["id"]].shape[0] == total, r["id"]
            np.testing.assert_allclose(
                got[r["id"]], np.asarray(wav_full)[0, :total],
                rtol=1e-4, atol=1e-4, err_msg=r["id"],
            )

    def test_slots_always_busy(self):
        """With more requests than slots the engine keeps every slot
        occupied until the queue drains (no head-of-line blocking)."""
        g_vars, plm_params, adm_params, hifi_params = _cascade_vars()
        rng = np.random.RandomState(1)
        reqs = [
            {
                "id": i,
                "phone": rng.randint(1, 40, (1, 24)).astype(np.int32),
                "lens": np.full((1,), 24, np.int32),
                "mels_prompt": rng.randn(1, 64, 80).astype(np.float32),
            }
            for i in range(5)
        ]
        eng = ContinuousEngine(
            g_vars, plm_params, adm_params, hifi_params,
            TINY_G, TINY_PLM, TINY_ADM, TINY_HIFI,
            slots=2, max_frames=96, chunk_frames=32, dtype=jnp.float32,
        )
        got = dict(eng.run(reqs))
        assert len(got) == 5
        for w in got.values():
            assert w.shape[0] > 0 and np.isfinite(w).all()
