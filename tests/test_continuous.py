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

    def test_prompted_request_matches_synthesize(self):
        """A request with an in-context prosody prompt (prompt_tokens>0,
        per-slot prefill at admission) must equal the one-shot synthesize
        with the same plm_prompt — including when it shares the engine
        with an unprompted request."""
        g_vars, plm_params, adm_params, hifi_params = _cascade_vars()
        # the init-time VQ codebook is all-zeros (kmeans runs on the first
        # TRAIN batch), which makes the mel code-INDEPENDENT and would let
        # this test pass vacuously — install a random inited codebook so
        # prosody codes actually steer the output
        rng = np.random.RandomState(2)
        cb = g_vars["vq_stats"]["vqpe"]["vq"]["layers_0"]["_codebook"]
        embed = jnp.asarray(rng.randn(*cb["embed"].shape), jnp.float32)
        g_vars = dict(g_vars)
        g_vars["vq_stats"] = {"vqpe": {"vq": {"layers_0": {"_codebook": {
            "embed": embed, "embed_avg": embed,
            "cluster_size": jnp.ones_like(cb["cluster_size"]),
            "inited": jnp.ones_like(cb["inited"]),
        }}}}}
        Pe = 16
        D = TINY_PLM.tc_latent_dim
        prompt_tc = rng.randn(Pe, D).astype(np.float32)
        prompt_codes = rng.randint(0, TINY_PLM.vq_bins, (Pe,)).astype(np.int32)
        reqs = []
        for i, tp in enumerate((40, 24)):
            r = {
                "id": f"r{i}",
                "phone": rng.randint(1, 40, (1, tp)).astype(np.int32),
                "lens": np.full((1,), tp, np.int32),
                "mels_prompt": rng.randn(1, 64, 80).astype(np.float32),
            }
            if i == 0:  # first request prompted, second BOS-only
                r["prompt_tc"] = prompt_tc
                r["prompt_codes"] = prompt_codes
            reqs.append(r)

        eng = ContinuousEngine(
            g_vars, plm_params, adm_params, hifi_params,
            TINY_G, TINY_PLM, TINY_ADM, TINY_HIFI,
            slots=2, max_frames=96, chunk_frames=32, dtype=jnp.float32,
            prompt_tokens=Pe,
        )
        got = dict(eng.run(list(reqs)))
        assert set(got) == {"r0", "r1"}

        for i, r in enumerate(reqs):
            tp = r["phone"].shape[1]
            Tp = -(-tp // 16) * 16
            phone = np.zeros((1, Tp), np.int32)
            phone[0, :tp] = r["phone"][0]
            kw = {}
            if "prompt_codes" in r:
                kw = dict(
                    plm_prompt_tc=jnp.asarray(prompt_tc[None]),
                    plm_prompt_codes=jnp.asarray(prompt_codes[None]),
                )
            wav_full, _, n_frames = synthesize(
                g_vars, plm_params, adm_params, hifi_params,
                TINY_G, TINY_PLM, TINY_ADM, TINY_HIFI,
                jnp.asarray(phone), jnp.asarray(r["lens"]),
                jnp.asarray(r["mels_prompt"]),
                max_frames=eng.Tmax, dtype=jnp.float32, **kw,
            )
            total = int(np.asarray(n_frames)[0]) * 256
            assert got[r["id"]].shape[0] == total, r["id"]
            np.testing.assert_allclose(
                got[r["id"]], np.asarray(wav_full)[0, :total],
                rtol=1e-4, atol=1e-4, err_msg=r["id"],
            )
        # the prompt must actually CHANGE the prosody decode: compare the
        # SAME one-shot path with and without the prompt (an engine-vs-
        # one-shot comparison would "differ" by mere chunking float noise)
        r = reqs[0]
        tp = r["phone"].shape[1]
        Tp = -(-tp // 16) * 16
        phone = np.zeros((1, Tp), np.int32)
        phone[0, :tp] = r["phone"][0]
        _, mel_np, _ = synthesize(
            g_vars, plm_params, adm_params, hifi_params,
            TINY_G, TINY_PLM, TINY_ADM, TINY_HIFI,
            jnp.asarray(phone), jnp.asarray(r["lens"]),
            jnp.asarray(r["mels_prompt"]),
            max_frames=eng.Tmax, dtype=jnp.float32,
        )
        _, mel_p, _ = synthesize(
            g_vars, plm_params, adm_params, hifi_params,
            TINY_G, TINY_PLM, TINY_ADM, TINY_HIFI,
            jnp.asarray(phone), jnp.asarray(r["lens"]),
            jnp.asarray(r["mels_prompt"]),
            max_frames=eng.Tmax, dtype=jnp.float32,
            plm_prompt_tc=jnp.asarray(prompt_tc[None]),
            plm_prompt_codes=jnp.asarray(prompt_codes[None]),
        )
        diff = float(np.max(np.abs(np.asarray(mel_p) - np.asarray(mel_np))))
        assert diff > 1e-3, f"prompt did not change the decoded mel ({diff})"

    def test_unprompted_wave_skips_prefill(self, monkeypatch):
        """An all-unprompted admission wave on a prompt-ENABLED engine
        must not pay the 12-layer prompt prefill dispatch (regression:
        r3 review), and an explicit ``prompt_codes=None`` placeholder is
        unprompted, not an error — on both Pe>0 and Pe=0 engines."""
        import megatts2_tpu.continuous as cont

        g_vars, plm_params, adm_params, hifi_params = _cascade_vars()
        rng = np.random.RandomState(3)
        reqs = []
        for i, tp in enumerate((40, 24)):
            reqs.append({
                "id": f"r{i}",
                "phone": rng.randint(1, 40, (1, tp)).astype(np.int32),
                "lens": np.full((1,), tp, np.int32),
                "mels_prompt": rng.randn(1, 64, 80).astype(np.float32),
                "prompt_codes": None,  # explicit unprompted placeholder
            })

        def boom(*a, **k):  # any host-side prefill dispatch is a bug
            raise AssertionError("prefill_slots called on unprompted wave")

        monkeypatch.setattr(cont, "prefill_slots", boom)
        eng = ContinuousEngine(
            g_vars, plm_params, adm_params, hifi_params,
            TINY_G, TINY_PLM, TINY_ADM, TINY_HIFI,
            slots=2, max_frames=96, chunk_frames=32, dtype=jnp.float32,
            prompt_tokens=16,
        )
        got = dict(eng.run(list(reqs)))
        assert set(got) == {"r0", "r1"}
        eng0 = ContinuousEngine(
            g_vars, plm_params, adm_params, hifi_params,
            TINY_G, TINY_PLM, TINY_ADM, TINY_HIFI,
            slots=2, max_frames=96, chunk_frames=32, dtype=jnp.float32,
        )
        got0 = dict(eng0.run(list(reqs)))  # must not raise on Pe=0
        for i, r in enumerate(reqs):
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
            for out in (got, got0):
                np.testing.assert_allclose(
                    out[r["id"]], np.asarray(wav_full)[0, :total],
                    rtol=1e-4, atol=1e-4, err_msg=r["id"],
                )

    def test_fused_admission_matches_synthesize(self):
        """admit_tp_bucket: one static phone bucket → prep+admit fuse
        into one dispatch; output must equal synthesize padded to the
        SAME bucket (the bucket is an engine constant, so output stays
        independent of co-admitted requests)."""
        g_vars, plm_params, adm_params, hifi_params = _cascade_vars()
        rng = np.random.RandomState(3)
        TP = 64
        reqs = []
        for i, tp in enumerate((40, 24, 33)):
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
            admit_tp_bucket=TP,
        )
        got = dict(eng.run(list(reqs)))
        assert set(got) == {"r0", "r1", "r2"}
        for r in reqs:
            phone = np.zeros((1, TP), np.int32)
            phone[0, : r["phone"].shape[1]] = r["phone"][0]
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

    def test_fused_admission_prompt_engine_unprompted_wave(self):
        """admit_tp_bucket on a prompt-ENABLED engine (Pe>0): an
        all-unprompted wave takes the fused prep_admit prompted=False
        branch, which receives dummy (S,1,D)/(S,1) prompt arrays — a
        shape/tracing regression there would ship silently without this
        (advisor round-3 finding).  A later prompted wave then flips to
        the prompted=True variant; both must equal one-shot synthesize."""
        g_vars, plm_params, adm_params, hifi_params = _cascade_vars()
        rng = np.random.RandomState(4)
        # code-dependent mel (see test_prompted_request_matches_synthesize)
        cb = g_vars["vq_stats"]["vqpe"]["vq"]["layers_0"]["_codebook"]
        embed = jnp.asarray(rng.randn(*cb["embed"].shape), jnp.float32)
        g_vars = dict(g_vars)
        g_vars["vq_stats"] = {"vqpe": {"vq": {"layers_0": {"_codebook": {
            "embed": embed, "embed_avg": embed,
            "cluster_size": jnp.ones_like(cb["cluster_size"]),
            "inited": jnp.ones_like(cb["inited"]),
        }}}}}
        TP = 64
        Pe = 16
        D = TINY_PLM.tc_latent_dim
        prompt_tc = rng.randn(Pe, D).astype(np.float32)
        prompt_codes = rng.randint(0, TINY_PLM.vq_bins, (Pe,)).astype(np.int32)
        reqs = []
        for i, tp in enumerate((40, 24, 33)):
            r = {
                "id": f"r{i}",
                "phone": rng.randint(1, 40, (1, tp)).astype(np.int32),
                "lens": np.full((1,), tp, np.int32),
                "mels_prompt": rng.randn(1, 64, 80).astype(np.float32),
                "prompt_codes": None,  # explicit unprompted placeholder
            }
            if i == 2:  # slots=2 → r2 arrives as its own (prompted) wave
                r["prompt_tc"] = prompt_tc
                r["prompt_codes"] = prompt_codes
            reqs.append(r)
        eng = ContinuousEngine(
            g_vars, plm_params, adm_params, hifi_params,
            TINY_G, TINY_PLM, TINY_ADM, TINY_HIFI,
            slots=2, max_frames=96, chunk_frames=32, dtype=jnp.float32,
            admit_tp_bucket=TP, prompt_tokens=Pe,
        )
        got = dict(eng.run(list(reqs)))
        assert set(got) == {"r0", "r1", "r2"}
        for r in reqs:
            phone = np.zeros((1, TP), np.int32)
            phone[0, : r["phone"].shape[1]] = r["phone"][0]
            kw = {}
            if r.get("prompt_codes") is not None:
                kw = dict(
                    plm_prompt_tc=jnp.asarray(prompt_tc[None]),
                    plm_prompt_codes=jnp.asarray(prompt_codes[None]),
                )
            wav_full, _, n_frames = synthesize(
                g_vars, plm_params, adm_params, hifi_params,
                TINY_G, TINY_PLM, TINY_ADM, TINY_HIFI,
                jnp.asarray(phone), jnp.asarray(r["lens"]),
                jnp.asarray(r["mels_prompt"]),
                max_frames=eng.Tmax, dtype=jnp.float32, **kw,
            )
            total = int(np.asarray(n_frames)[0]) * 256
            assert got[r["id"]].shape[0] == total, r["id"]
            np.testing.assert_allclose(
                got[r["id"]], np.asarray(wav_full)[0, :total],
                rtol=1e-4, atol=1e-4, err_msg=r["id"],
            )

    def _count_dispatches(self, monkeypatch, reqs, **eng_kw):
        """Run the offline engine with every module-level jitted entry
        point wrapped by a counter; returns (counts dict, n_ticks)."""
        import megatts2_tpu.continuous as cont

        counts = {}

        def wrap(name):
            fn = getattr(cont, name)

            def w(*a, **k):
                counts[name] = counts.get(name, 0) + 1
                return fn(*a, **k)

            if hasattr(fn, "__wrapped__"):
                # prep_admit composes the other graphs via .__wrapped__
                w.__wrapped__ = fn.__wrapped__
            return w

        for name in ("stream_prep", "admit_slots", "admit_slots_prompted",
                     "prefill_slots", "prep_admit", "engine_tick_emit_multi"):
            monkeypatch.setattr(cont, name, wrap(name))
        g_vars, plm_params, adm_params, hifi_params = _cascade_vars()
        eng = ContinuousEngine(
            g_vars, plm_params, adm_params, hifi_params,
            TINY_G, TINY_PLM, TINY_ADM, TINY_HIFI,
            slots=4, max_frames=96, chunk_frames=32, dtype=jnp.float32,
            **eng_kw,
        )
        got = dict(eng.run(list(reqs)))
        assert len(got) == len(reqs)
        return counts, eng.n_ticks

    def _mixed_reqs(self, n=12):
        rng = np.random.RandomState(0)
        reqs = []
        for i in range(n):
            tp = (40, 64, 24)[i % 3]
            reqs.append({
                "id": f"r{i}",
                "phone": rng.randint(1, 40, (1, tp)).astype(np.int32),
                "lens": np.full((1,), tp, np.int32),
                "mels_prompt": rng.randn(1, 64, 80).astype(np.float32),
            })
        return reqs

    def test_dispatch_budget_offline(self, monkeypatch):
        """The 'structurally tunnel-bound' engine claim as a tested
        invariant (round-3 verdict weak #1): the offline engine must stay
        within a per-request DISPATCH budget — each dispatch is a ~75 ms
        round trip on the tunnel target, so the count, not device
        compute, sets the offline throughput floor.  Measured on this
        workload (12 mixed requests, 4 slots): 11 preps + 7 admits +
        7 fused-tick dispatches = 25 total, 2.08/request."""
        reqs = self._mixed_reqs(12)
        counts, _ = self._count_dispatches(monkeypatch, reqs)
        total = sum(counts.values())
        assert total <= 28, counts  # measured 25; slack for schedule drift
        assert total / len(reqs) <= 2.4, counts

    def test_dispatch_budget_fused_admission(self, monkeypatch):
        """admit_tp_bucket fuses prep+admit into one dispatch: the same
        workload must run in ~half the dispatches (measured 7 prep_admit
        + 7 tick dispatches = 14 total, 1.17/request)."""
        reqs = self._mixed_reqs(12)
        counts, _ = self._count_dispatches(
            monkeypatch, reqs, admit_tp_bucket=64
        )
        assert counts.get("stream_prep", 0) == 0, counts
        assert counts.get("admit_slots", 0) == 0, counts
        total = sum(counts.values())
        assert total <= 16, counts  # measured 14
        assert total / len(reqs) <= 1.4, counts

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

    def test_run_live_deferred_nf_equals_run(self):
        """The ONLINE loop defers each admission wave's n_frames sync past
        the next tick dispatch (continuous.py::_install/_resolve_nf).
        Deferral is pure scheduling: run_live must produce bit-identical
        audio to the offline run() for the same requests."""
        import queue as queue_mod
        import threading

        g_vars, plm_params, adm_params, hifi_params = _cascade_vars()
        rng = np.random.RandomState(2)
        reqs = [
            {
                "id": i,
                "phone": rng.randint(1, 40, (1, tp)).astype(np.int32),
                "lens": np.full((1,), tp, np.int32),
                "mels_prompt": rng.randn(1, 64, 80).astype(np.float32),
            }
            for i, tp in enumerate((24, 40, 16, 32))
        ]

        def make_engine():
            return ContinuousEngine(
                g_vars, plm_params, adm_params, hifi_params,
                TINY_G, TINY_PLM, TINY_ADM, TINY_HIFI,
                slots=2, max_frames=96, chunk_frames=32, dtype=jnp.float32,
            )

        ref = dict(make_engine().run([dict(r) for r in reqs]))

        rq = queue_mod.Queue()
        for r in reqs:
            rq.put(dict(r))
        stop = threading.Event()
        eng = make_engine()
        got = {}
        for rid, wav in eng.run_live(rq, stop):
            got[rid] = wav
            if len(got) == len(reqs):
                stop.set()
        assert set(got) == set(ref)
        assert eng._pending_nf is None  # every deferred sync resolved
        for rid in ref:
            np.testing.assert_array_equal(got[rid], ref[rid], err_msg=str(rid))
