"""EMA vector-quantization tests: closed-form EMA math, straight-through
gradients, kmeans init, dead-code expiry, encode/decode round trip."""
import jax
import jax.numpy as jnp
import numpy as np

from megatts2_tpu.quantization import ResidualVectorQuantizer, VectorQuantization

KEY = jax.random.PRNGKey(0)


def make_vq(bins=8, dim=4, **kw):
    vq = VectorQuantization(dim=dim, codebook_size=bins, **kw)
    x = jnp.zeros((2, 6, dim))
    variables = vq.init({"params": KEY, "vq": KEY}, x, train=False)
    return vq, variables


class TestEuclidean:
    def test_nearest_neighbor_assignment(self):
        vq, variables = make_vq(kmeans_init=False)
        embed = np.asarray(variables["vq_stats"]["_codebook"]["embed"])
        x = embed[[1, 3, 5]][None]  # exactly on codewords
        q, codes, _ = vq.apply(variables, jnp.asarray(x), train=False)
        np.testing.assert_array_equal(np.asarray(codes)[0], [1, 3, 5])
        np.testing.assert_allclose(np.asarray(q)[0], x[0], atol=1e-6)

    def test_kmeans_init_on_first_batch(self):
        vq, variables = make_vq(kmeans_init=True, kmeans_iters=5)
        assert float(variables["vq_stats"]["_codebook"]["inited"]) == 0.0
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 4))
        _, new_state = vq.apply(
            variables, x, train=True, rngs={"vq": KEY}, mutable=["vq_stats"]
        )
        st = new_state["vq_stats"]["_codebook"]
        assert float(st["inited"]) == 1.0
        assert np.abs(np.asarray(st["embed"])).sum() > 0

    def test_ema_update_closed_form(self):
        """One train step from a known codebook: EMA cluster sizes and
        embed_avg must match hand-computed values (core_vq.py:217-229)."""
        decay, eps, bins, dim = 0.99, 1e-5, 4, 2
        vq, variables = make_vq(
            bins=bins, dim=dim, kmeans_init=False, decay=decay,
            threshold_ema_dead_code=0,
        )
        embed0 = np.eye(4, 2, dtype=np.float32) * 10  # rows: [10,0],[0,10],[0,0],[0,0]
        state = {
            "inited": jnp.asarray(1.0),
            "cluster_size": jnp.asarray([5.0, 5.0, 5.0, 5.0]),
            "embed": jnp.asarray(embed0),
            "embed_avg": jnp.asarray(embed0),
        }
        variables = {
            "params": variables.get("params", {}),
            "vq_stats": {"_codebook": state},
        }
        x = np.array([[[9.0, 1.0], [1.0, 9.0], [8.0, 0.0]]], np.float32)  # codes 0,1,0
        (_, codes, _), new_state = vq.apply(
            variables, jnp.asarray(x), train=True, rngs={"vq": KEY},
            mutable=["vq_stats"],
        )
        np.testing.assert_array_equal(np.asarray(codes)[0], [0, 1, 0])
        st = new_state["vq_stats"]["_codebook"]
        exp_cs = np.array([5 * decay + 2 * 0.01, 5 * decay + 0.01, 5 * decay, 5 * decay])
        np.testing.assert_allclose(np.asarray(st["cluster_size"]), exp_cs, rtol=1e-5)
        exp_avg0 = embed0[0] * decay + np.array([17.0, 1.0]) * 0.01
        np.testing.assert_allclose(np.asarray(st["embed_avg"])[0], exp_avg0, rtol=1e-5)
        n = exp_cs.sum()
        smoothed = (exp_cs + eps) / (n + bins * eps) * n
        np.testing.assert_allclose(
            np.asarray(st["embed"])[0], exp_avg0 / smoothed[0], rtol=1e-5
        )

    def test_dead_code_expiry(self):
        """Codes with EMA cluster size < threshold get replaced from batch."""
        vq, variables = make_vq(bins=4, dim=2, kmeans_init=False, threshold_ema_dead_code=2.0)
        state = {
            "inited": jnp.asarray(1.0),
            "cluster_size": jnp.asarray([100.0, 0.1, 100.0, 0.1]),  # 1,3 dead
            "embed": jnp.full((4, 2), 100.0),
            "embed_avg": jnp.full((4, 2), 100.0),
        }
        variables = {"params": variables.get("params", {}), "vq_stats": {"_codebook": state}}
        x = jnp.asarray(np.random.RandomState(0).randn(1, 16, 2).astype(np.float32))
        _, new_state = vq.apply(
            variables, x, train=True, rngs={"vq": KEY}, mutable=["vq_stats"]
        )
        avg = np.asarray(new_state["vq_stats"]["_codebook"]["embed_avg"])
        # dead rows re-seeded from batch samples (|values| ~ 1, not ~100);
        # live rows keep their EMA mass (~99 after one decay step)
        assert np.abs(avg[1]).max() < 50 and np.abs(avg[3]).max() < 50
        assert np.abs(avg[0]).max() > 50 and np.abs(avg[2]).max() > 50
        cs = np.asarray(new_state["vq_stats"]["_codebook"]["cluster_size"])
        assert cs[1] < 50 and cs[0] > 50  # dead cluster size reset near threshold

    def test_straight_through_gradient(self):
        """d loss/d x flows through the quantizer unchanged (STE)."""
        vq, variables = make_vq(kmeans_init=False, threshold_ema_dead_code=0)

        def loss_fn(x):
            q, _, _ = vq.apply(
                variables, x, train=True, rngs={"vq": KEY}, mutable=["vq_stats"]
            )[0]
            return jnp.sum(q * 2.0)

        x = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 4))
        g = jax.grad(loss_fn)(x)
        np.testing.assert_allclose(np.asarray(g), 2.0 * np.ones_like(g), atol=1e-6)

    def test_commit_loss_value(self):
        vq, variables = make_vq(kmeans_init=False, threshold_ema_dead_code=0)
        x = jax.random.normal(jax.random.PRNGKey(3), (1, 5, 4))
        (q, _, commit), _ = vq.apply(
            variables, x, train=True, rngs={"vq": KEY}, mutable=["vq_stats"]
        )
        expect = np.mean((np.asarray(q) - np.asarray(x)) ** 2)
        np.testing.assert_allclose(float(commit), expect, rtol=1e-4)


class TestRVQ:
    def test_encode_decode_roundtrip(self):
        rvq = ResidualVectorQuantizer(dimension=4, n_q=2, bins=8, kmeans_init=False)
        x = jax.random.normal(jax.random.PRNGKey(4), (2, 6, 4))
        variables = rvq.init({"params": KEY, "vq": KEY}, x)
        codes = rvq.apply(variables, x, method=ResidualVectorQuantizer.encode)
        assert codes.shape == (2, 2, 6)
        q = rvq.apply(variables, codes, method=ResidualVectorQuantizer.decode)
        assert q.shape == x.shape
        q2, codes2, _ = rvq.apply(variables, x, train=False)
        np.testing.assert_array_equal(np.asarray(codes), np.asarray(codes2))
        np.testing.assert_allclose(np.asarray(q), np.asarray(q2), atol=1e-6)

    def test_residual_reduces_error(self):
        rvq1 = ResidualVectorQuantizer(dimension=4, n_q=1, bins=16, kmeans_init=False)
        rvq2 = ResidualVectorQuantizer(dimension=4, n_q=4, bins=16, kmeans_init=False)
        x = jax.random.normal(jax.random.PRNGKey(5), (2, 32, 4))
        v1 = rvq1.init({"params": KEY, "vq": KEY}, x)
        v2 = rvq2.init({"params": KEY, "vq": KEY}, x)
        q1, _, _ = rvq1.apply(v1, x, train=False)
        q2, _, _ = rvq2.apply(v2, x, train=False)
        e1 = float(jnp.mean((q1 - x) ** 2))
        e2 = float(jnp.mean((q2 - x) ** 2))
        assert e2 < e1
