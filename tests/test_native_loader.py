"""Native C++ data loader: build, parity vs numpy reader, batch builder
integration (skipped when the toolchain can't build the library)."""
import os

import numpy as np
import pytest

from megatts2_tpu.data import FeatureReader, FeatureWriter

native = pytest.importorskip("megatts2_tpu.data.native_loader")


@pytest.fixture(scope="module")
def lib():
    lib = native.load_library()
    if lib is None:
        pytest.skip("native dataloader not built (g++ unavailable?)")
    return lib


@pytest.fixture()
def shard(tmp_path):
    p = str(tmp_path / "f.bin")
    rng = np.random.RandomState(0)
    arrays = [rng.randn(n, 80).astype(np.float32) for n in (33, 21, 7)]
    offsets = []
    with FeatureWriter(p, dim=80) as w:
        for a in arrays:
            offsets.append(w.add(a)[1])
    return p, arrays, offsets


class TestNativeReader:
    def test_version(self, lib):
        assert lib.mtl_version() >= 1

    def test_read_parity_f16(self, lib, shard):
        p, arrays, offsets = shard
        r = native.NativeFeatureReader()
        ref = FeatureReader()
        for a, o in zip(arrays, offsets):
            got = r.read(p, o, a.shape[0])
            np.testing.assert_array_equal(got, ref.read(p, o, a.shape[0]))

    def test_batch_padding(self, lib, shard):
        p, arrays, offsets = shard
        r = native.NativeFeatureReader()
        out = r.read_batch(p, offsets, [a.shape[0] for a in arrays], 40)
        assert out.shape == (3, 40, 80)
        for i, a in enumerate(arrays):
            assert np.abs(out[i, a.shape[0] :]).sum() == 0

    def test_concat_truncation(self, lib, shard):
        p, arrays, offsets = shard
        r = native.NativeFeatureReader()
        cc = r.concat_slices(p, offsets, [a.shape[0] for a in arrays], 40)
        ref = FeatureReader()
        expect = np.concatenate(
            [ref.read(p, o, a.shape[0]) for a, o in zip(arrays, offsets)]
        )[:40]
        np.testing.assert_array_equal(cc, expect)

    def test_out_of_bounds_rejected(self, lib, shard):
        p, arrays, offsets = shard
        r = native.NativeFeatureReader()
        with pytest.raises(ValueError):
            r.read_batch(p, [offsets[-1]], [10_000], 10_000)


class TestBuilderIntegration:
    def test_gan_builder_native_matches_numpy(self, lib, tmp_path):
        from tests.test_data_text import _make_ds
        from megatts2_tpu.data import GANBatchBuilder

        m, ds = _make_ds(tmp_path)
        b_native = GANBatchBuilder(m, ds, seed=3, use_native=True)
        b_numpy = GANBatchBuilder(m, ds, seed=3, use_native=False)
        assert b_native.native is not None
        a = b_native([0, 1, 2])
        b = b_numpy([0, 1, 2])
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)


class TestBatchRing:
    def test_ring_matches_sync_fill(self, lib, shard):
        p, arrays, offsets = shard
        r = native.NativeFeatureReader()
        lens = [a.shape[0] for a in arrays]
        ref = r.read_batch(p, offsets, lens, 40)
        ring = r.ring_create(slots=2, max_floats=3 * 40 * 80)
        t = ring.submit(p, offsets, lens, 40)
        assert t >= 0
        got = ring.wait(t, 3, 40)
        ring.release(t)
        np.testing.assert_array_equal(got, ref)
        ring.close()

    def test_two_outstanding_tickets(self, lib, shard):
        p, arrays, offsets = shard
        r = native.NativeFeatureReader()
        lens = [a.shape[0] for a in arrays]
        ring = r.ring_create(slots=2, max_floats=3 * 40 * 80)
        t0 = ring.submit(p, offsets, lens, 40)
        t1 = ring.submit(p, list(reversed(offsets)), list(reversed(lens)), 40)
        assert {t0, t1} == {0, 1}
        # third submit must report all-busy, not corrupt anything
        assert ring.submit(p, offsets, lens, 40) == -1
        a = ring.wait(t0, 3, 40)
        b = ring.wait(t1, 3, 40)
        # shards store f16 — compare against the reader's roundtrip
        np.testing.assert_array_equal(a, r.read_batch(p, offsets, lens, 40))
        np.testing.assert_array_equal(
            b, r.read_batch(p, list(reversed(offsets)), list(reversed(lens)), 40)
        )
        ring.release(t0)
        ring.release(t1)
        # slot is reusable after release
        t2 = ring.submit(p, offsets, lens, 40)
        assert t2 >= 0
        ring.wait(t2, 3, 40)
        ring.release(t2)
        ring.close()

    def test_ring_stress_random(self, lib, shard):
        """Many submit/wait cycles with alternating slots stay correct."""
        p, arrays, offsets = shard
        r = native.NativeFeatureReader()
        lens = [a.shape[0] for a in arrays]
        ring = r.ring_create(slots=2, max_floats=3 * 64 * 80)
        rng = np.random.RandomState(0)
        for _ in range(50):
            order = rng.permutation(3)
            off = [offsets[i] for i in order]
            ln = [lens[i] for i in order]
            T = int(rng.choice([33, 40, 64]))
            t = ring.submit(p, off, ln, T)
            got = ring.wait(t, 3, T)
            ring.release(t)
            ref = r.read_batch(p, off, ln, T)
            np.testing.assert_array_equal(got, ref)
            for row, i in enumerate(order):
                assert np.abs(got[row, min(lens[i], T):]).sum() == 0
        ring.close()

    def test_builder_uses_ring(self, lib, tmp_path):
        """GANBatchBuilder's native path (now ring-based) still matches the
        numpy path bit-for-bit."""
        from megatts2_tpu.data import Cut, CutManifest, FeatureWriter
        from megatts2_tpu.data.datasets import GANBatchBuilder

        rng = np.random.RandomState(0)
        ds = str(tmp_path)
        cuts = []
        with FeatureWriter(os.path.join(ds, "feats.bin"), dim=80) as w:
            for i in range(6):
                mel = rng.randn(40, 80).astype(np.float32)
                pth, o = w.add(mel)
                cuts.append(
                    Cut(f"c{i}", "spk0", 1.0, 40, ["a", "b"], [20, 20], "", pth, o)
                )
        m = CutManifest(cuts)
        with open(os.path.join(ds, "unique_text_tokens.k2symbols"), "w") as f:
            f.write("<eps> 0\na 1\nb 2\n")
        bn = GANBatchBuilder(m, ds, seed=3, use_native=True)
        bp = GANBatchBuilder(m, ds, seed=3, use_native=False)
        if bn.native is None:
            pytest.skip("native unavailable")
        out_n = bn([0, 2, 4])
        out_p = bp([0, 2, 4])
        for k in out_p:
            np.testing.assert_array_equal(out_n[k], out_p[k], err_msg=k)
