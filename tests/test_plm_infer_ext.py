"""plm_infer extensions beyond the reference greedy loop: in-context
prompt prefill (block-causal KV-cache write) and temperature/top-k
sampling.  The reference infer (models/megatts2.py:165-181) is BOS-only
greedy; these are deliberate, documented extensions (PARITY.md).
"""
import jax
import jax.numpy as jnp
import numpy as np

from megatts2_tpu.config import MegaPLMConfig
from megatts2_tpu.models import MegaPLM
from megatts2_tpu.models.plm import plm_infer


def _tiny(n_layers=2):
    cfg = MegaPLMConfig(
        n_layers=n_layers, n_heads=4, vq_dim=32, tc_latent_dim=32, vq_bins=40,
        dropout=0.0, use_flash=False,
    )
    params = jax.jit(MegaPLM(cfg).init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 4, cfg.tc_latent_dim)),
        jnp.zeros((1, 5), jnp.int32),
        jnp.asarray([4]),
    )["params"]
    return cfg, params


class TestPromptPrefill:
    def test_prefill_matches_full_forward(self):
        """Step-0 logits after a P-token prefill == the non-decode full
        forward's logits at position P on [prompt ++ first-gen] — proves
        the block-causal cache write and position offsets are exact."""
        cfg, params = _tiny()
        B, P = 2, 6
        rng = np.random.RandomState(0)
        prompt_tc = jnp.asarray(rng.randn(B, P, 32), jnp.float32)
        prompt_codes = jnp.asarray(rng.randint(0, 40, (B, P)), jnp.int32)
        tc0 = jnp.asarray(rng.randn(B, 1, 32), jnp.float32)

        # decode path: prefill then one step
        model = MegaPLM(cfg, decode=True, max_decode_len=P + 1)
        _, cache = model.apply(
            {"params": params},
            prompt_tc,
            jnp.concatenate(
                [jnp.full((B, 1), cfg.bos_id, jnp.int32), prompt_codes[:, :-1]], 1
            ),
            method=MegaPLM.prefill,
            mutable=["cache"],
        )
        logits_dec, _ = model.apply(
            {"params": params, **cache},
            tc0,
            prompt_codes[:, -1],
            jnp.asarray(P, jnp.int32),
            method=MegaPLM.decode_step,
            mutable=["cache"],
        )

        # full-forward path: teacher-forced over the same sequence
        full = MegaPLM(cfg)
        p_seq = jnp.concatenate(
            [
                jnp.full((B, 1), cfg.bos_id, jnp.int32),
                prompt_codes,
                jnp.zeros((B, 1), jnp.int32),  # target slot (unused)
            ],
            axis=1,
        )  # (B, P+2) with BOS
        tc_seq = jnp.concatenate([prompt_tc, tc0], axis=1)  # (B, P+1, D)
        logits_full, _ = full.apply(
            {"params": params},
            tc_seq,
            p_seq,
            jnp.full((B,), P + 1, jnp.int32),
            train=False,
        )
        np.testing.assert_allclose(
            np.asarray(logits_dec),
            np.asarray(logits_full[:, P]),
            rtol=2e-4, atol=2e-4,
        )

    def test_plm_infer_with_prompt_runs_and_differs(self):
        cfg, params = _tiny()
        rng = np.random.RandomState(1)
        tc = jnp.asarray(rng.randn(2, 8, 32), jnp.float32)
        prompt_tc = jnp.asarray(rng.randn(2, 5, 32), jnp.float32)
        prompt_codes = jnp.asarray(rng.randint(0, 40, (2, 5)), jnp.int32)
        base = plm_infer(params, cfg, tc)
        cond = plm_infer(
            params, cfg, tc, prompt_tc=prompt_tc, prompt_codes=prompt_codes
        )
        assert cond.shape == base.shape == (2, 8)
        assert (np.asarray(cond) >= 0).all() and (np.asarray(cond) < 40).all()
        # conditioning must actually influence the decode
        assert (np.asarray(cond) != np.asarray(base)).any()


class TestSampling:
    def test_topk1_equals_greedy(self):
        cfg, params = _tiny()
        rng = np.random.RandomState(2)
        tc = jnp.asarray(rng.randn(2, 10, 32), jnp.float32)
        greedy = plm_infer(params, cfg, tc)
        k1 = plm_infer(
            params, cfg, tc, temperature=0.7, top_k=1, rng=jax.random.PRNGKey(3)
        )
        np.testing.assert_array_equal(np.asarray(greedy), np.asarray(k1))

    def test_sampling_deterministic_given_rng_and_varies(self):
        cfg, params = _tiny()
        rng = np.random.RandomState(3)
        tc = jnp.asarray(rng.randn(2, 12, 32), jnp.float32)
        a = plm_infer(params, cfg, tc, temperature=5.0, rng=jax.random.PRNGKey(0))
        b = plm_infer(params, cfg, tc, temperature=5.0, rng=jax.random.PRNGKey(0))
        c = plm_infer(params, cfg, tc, temperature=5.0, rng=jax.random.PRNGKey(1))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert (np.asarray(a) != np.asarray(c)).any()

    def test_requires_rng(self):
        cfg, params = _tiny(n_layers=1)
        tc = jnp.zeros((1, 2, 32))
        import pytest

        with pytest.raises(ValueError):
            plm_infer(params, cfg, tc, temperature=1.0)


class TestPromptFeatureHelper:
    def test_prompt_features_from_stage2(self, tmp_path):
        import os

        from megatts2_tpu.data import CutManifest, prompt_features
        from megatts2_tpu.data.manifest import Cut

        ds = str(tmp_path)
        cuts = []
        rng = np.random.RandomState(4)
        os.makedirs(os.path.join(ds, "latents", "spk"), exist_ok=True)
        for i, durs in enumerate([[2, 3], [1, 2, 2]]):
            tp = len(durs)
            n_codes = -(-sum(durs) // 8)
            np.save(
                os.path.join(ds, "latents", "spk", f"c{i}.npy"),
                {
                    "tc_latent": rng.randn(1, tp, 16).astype(np.float32),
                    "p_code": rng.randint(0, 32, (1, 1, n_codes)),
                },
            )
            cuts.append(
                Cut(
                    id=f"c{i}", speaker="spk", duration=1.0,
                    num_frames=sum(durs), phone_tokens=["a"] * tp,
                    duration_tokens=list(durs),
                )
            )
        manifest = CutManifest(cuts)
        tc, codes = prompt_features(manifest, ds, ["c0", "c1"])
        assert tc.shape[0] == 1 and codes.shape[0] == 1
        assert tc.shape[1] == codes.shape[1] == 2  # ceil(5/8) + ceil(5/8)
        assert tc.shape[2] == 16 and codes.dtype == np.int32

        # resolve_prompt: speaker-pick path over a saved manifest
        from megatts2_tpu.data import resolve_prompt

        manifest.save(os.path.join(ds, "cuts_train.jsonl.gz"))
        tc2, codes2 = resolve_prompt(ds, speaker="spk", n=2)
        np.testing.assert_array_equal(tc2, tc)
        np.testing.assert_array_equal(codes2, codes)

    def test_fit_prompt_tiles_and_tail_truncates(self):
        from megatts2_tpu.data import fit_prompt

        rng = np.random.RandomState(0)
        tc = rng.randn(5, 4).astype(np.float32)
        codes = np.arange(5, dtype=np.int32)
        # truncate: keeps the LAST tokens
        t, c = fit_prompt(tc, codes, 3)
        assert t.shape == (1, 3, 4) and c.shape == (1, 3)
        np.testing.assert_array_equal(c[0], [2, 3, 4])
        np.testing.assert_array_equal(t[0], tc[2:])
        # extend: tiling, still ending on the original tail
        t, c = fit_prompt(tc[None], codes, 8)  # batched input accepted
        assert c.shape == (1, 8)
        np.testing.assert_array_equal(c[0], [2, 3, 4, 0, 1, 2, 3, 4])
        np.testing.assert_array_equal(t[0, -5:], tc)
