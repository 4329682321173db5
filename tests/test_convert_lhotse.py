"""lhotse-dataset interop: the ctypes HDF5 layer and the reference-ds
converter (tools/convert_lhotse_ds.py) — a user migrating a dataset the
reference prepared (lhotse MonoCut jsonl.gz + NumpyHdf5Writer features,
/root/reference/prepare_ds.py:140-217) must get a native ds that loads,
batches, and preserves tokens/features."""
import gzip
import json
import os

import numpy as np
import pytest


def _write_lhotse_ds(root, n_speakers=2, n_per_spk=2, T=24, n_mels=80):
    """Fake a reference-prepared ds: cuts_{train,valid}.jsonl.gz in lhotse
    MonoCut schema + an HDF5 feature store per split."""
    from megatts2_tpu.data.hdf5 import Hdf5Writer

    os.makedirs(root, exist_ok=True)
    rng = np.random.RandomState(0)
    feats = {}
    for split, n_per in (("train", n_per_spk), ("valid", 1)):
        h5 = os.path.join(root, f"feats_{split}.h5")
        cuts = []
        with Hdf5Writer(h5) as w:
            for s in range(n_speakers):
                spk = f"spk{s}"
                for u in range(n_per):
                    cid = f"{spk}_{split}_u{u}"
                    mel = rng.randn(T, n_mels).astype(np.float32)
                    feats[cid] = mel
                    w.add(cid, mel)
                    cuts.append({
                        "id": cid, "start": 0, "duration": T * 0.016,
                        "channel": 0, "type": "MonoCut",
                        "supervisions": [{
                            "id": cid, "recording_id": cid, "start": 0,
                            "duration": T * 0.016, "channel": 0,
                            "text": "hello world", "speaker": spk,
                            "custom": {
                                "duration_tokens": [8, 8, 8],
                                "phone_tokens": ["hello", "_", "world"],
                            },
                        }],
                        "features": {
                            "type": "mel", "num_frames": T,
                            "num_features": n_mels, "frame_shift": 0.016,
                            "sampling_rate": 16000, "start": 0,
                            "duration": T * 0.016,
                            "storage_type": "numpy_hdf5",
                            # relative path, as lhotse records it
                            "storage_path": f"feats_{split}.h5",
                            "storage_key": cid,
                        },
                        "recording": {
                            "id": cid, "sampling_rate": 16000,
                            "num_samples": int(T * 0.016 * 16000),
                            "duration": T * 0.016,
                            "sources": [{"type": "file", "channels": [0],
                                         "source": f"/wavs/{cid}.wav"}],
                        },
                    })
        with gzip.open(os.path.join(root, f"cuts_{split}.jsonl.gz"), "wt") as f:
            for c in cuts:
                f.write(json.dumps(c) + "\n")
    return feats


class TestHdf5Layer:
    def test_roundtrip_and_missing_key(self, tmp_path):
        from megatts2_tpu.data.hdf5 import Hdf5Reader, Hdf5Writer

        p = str(tmp_path / "t.h5")
        a = np.random.RandomState(0).randn(7, 80).astype(np.float32)
        b = np.random.RandomState(1).randn(3, 5).astype(np.float32)
        with Hdf5Writer(p) as w:
            w.add("x", a)
            w.add("y/z", b)  # lhotse keys can contain '/'
        with Hdf5Reader(p) as r:
            assert "x" in r and "nope" not in r
            np.testing.assert_array_equal(r.read("x"), a)
            np.testing.assert_array_equal(r.read("y/z"), b)
            with pytest.raises(KeyError):
                r.read("nope")


class TestConvertLhotse:
    def test_convert_and_load(self, tmp_path):
        from megatts2_tpu.data import CutManifest
        from megatts2_tpu.data.features import FeatureReader
        from tools.convert_lhotse_ds import main as convert_main

        src = str(tmp_path / "ref_ds")
        dst = str(tmp_path / "native_ds")
        feats = _write_lhotse_ds(src)
        # reference ships a symbol table in its ds dir — must be COPIED
        open(os.path.join(src, "unique_text_tokens.k2symbols"), "w").write(
            "<eps> 0\n_ 1\nhello 2\nworld 3\n")
        report = convert_main([
            "--src", src, "--dst", dst, "--feats_root", src,
            "--dtype", "float32"])
        assert report["splits"] == {"train": 4, "valid": 2}
        assert report["symbol_table"] == "copied"

        m = CutManifest.load(os.path.join(dst, "cuts_train.jsonl.gz"))
        assert len(m) == 4
        c = next(c for c in m if c.id == "spk0_train_u0")
        assert c.speaker == "spk0"
        assert c.phone_tokens == ["hello", "_", "world"]
        assert c.duration_tokens == [8, 8, 8]
        assert c.text == "hello world"
        assert c.wav_path == "/wavs/spk0_train_u0.wav"
        reader = FeatureReader()
        got = reader.read(c.feats_path, c.feats_offset, c.num_frames)
        np.testing.assert_allclose(got, feats[c.id], atol=0)
        assert open(os.path.join(dst, "unique_text_tokens.k2symbols")).read() \
            == open(os.path.join(src, "unique_text_tokens.k2symbols")).read()

    def test_converted_ds_feeds_gan_batch_builder(self, tmp_path):
        """The converted ds must batch through the real training input
        path (GANBatchBuilder: mel targets + same-speaker timbre concat)."""
        from megatts2_tpu.data import CutManifest
        from megatts2_tpu.data.datasets import GANBatchBuilder
        from tools.convert_lhotse_ds import main as convert_main

        src = str(tmp_path / "ref_ds")
        dst = str(tmp_path / "native_ds")
        _write_lhotse_ds(src, n_per_spk=3)
        convert_main(["--src", src, "--dst", dst, "--feats_root", src])
        m = CutManifest.load(os.path.join(dst, "cuts_train.jsonl.gz"))
        builder = GANBatchBuilder(m, dst, use_native=False)
        batch = builder(list(range(4)))
        assert batch["mel_targets"].shape[0] == 4
        assert batch["mel_targets"].shape[2] == 80
        assert np.isfinite(batch["mel_targets"]).all()
        assert batch["phone_tokens"].shape[0] == 4

    def test_symbol_table_regenerated_when_absent(self, tmp_path):
        from tools.convert_lhotse_ds import main as convert_main

        src = str(tmp_path / "ref_ds")
        dst = str(tmp_path / "native_ds")
        _write_lhotse_ds(src)
        report = convert_main(["--src", src, "--dst", dst,
                               "--feats_root", src])
        assert report["symbol_table"] == "generated"
        from megatts2_tpu.text import SymbolTable

        st = SymbolTable.from_file(
            os.path.join(dst, "unique_text_tokens.k2symbols"))
        assert "hello" in st.symbols and "world" in st.symbols
