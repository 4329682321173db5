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
