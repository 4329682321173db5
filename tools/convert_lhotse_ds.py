#!/usr/bin/env python
"""Convert a REFERENCE-prepared dataset (lhotse cuts + HDF5 features) into
the native manifest/memmap format (VERDICT r4 missing #3 / next #8a).

The reference's ``prepare_ds.py`` stage 1 produces, per split:
* ``cuts_{split}.jsonl.gz`` — lhotse MonoCut records carrying
  ``supervisions[0].custom.{duration_tokens,phone_tokens}``, speaker and
  text (``/root/reference/prepare_ds.py:140-183``);
* ``cuts_{split}.h5`` (NumpyHdf5Writer) — one float32 mel dataset per
  cut, addressed by ``features.storage_path`` + ``features.storage_key``
  (``prepare_ds.py:211-217``, ``modules/datamodule.py:328-338``).

This tool maps those 1:1 into the native schema (``data/manifest.py``:
gzipped-JSONL cuts + flat memmap feature shards) so a user with an
existing reference dataset can train here WITHOUT re-running prepare_ds
from raw wav/TextGrid:

* features are read via h5py when installed, else a ctypes binding on the
  system libhdf5 (``data/hdf5.py``) — no new Python deps;
* the reference's ``unique_text_tokens.k2symbols`` is COPIED when present
  (preserving token ids, so reference checkpoints converted with
  ``training/convert.py`` keep their embedding rows), else regenerated
  from the phone inventory exactly as prepare_ds stage 1 does;
* stage-2 ``latents/`` (same ``latents/{spk}/{id}.npy`` layout in both
  frameworks) are linked across when present.

    python tools/convert_lhotse_ds.py --src /path/to/reference/ds \
        --dst /path/to/native/ds [--feats_root DIR] [--dtype float16]
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import shutil
import sys

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def iter_lhotse_cuts(path: str):
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if line:
                yield json.loads(line)


def convert_split(src: str, dst: str, split: str, feats_root: str,
                  dtype: str) -> tuple:
    from megatts2_tpu.data.features import FeatureWriter
    from megatts2_tpu.data.hdf5 import Hdf5Reader
    from megatts2_tpu.data.manifest import Cut, CutManifest

    cuts_path = os.path.join(src, f"cuts_{split}.jsonl.gz")
    if not os.path.exists(cuts_path):
        return None, set()
    manifest = CutManifest()
    symbols = set()
    readers = {}

    def reader_for(storage_path: str) -> Hdf5Reader:
        # lhotse records storage_path relative to the prepare-time cwd;
        # resolve against feats_root, then src, then as-is
        if storage_path not in readers:
            for cand in (
                os.path.join(feats_root, storage_path),
                os.path.join(src, os.path.basename(storage_path)),
                storage_path,
            ):
                if os.path.exists(cand):
                    readers[storage_path] = Hdf5Reader(cand)
                    break
            else:
                raise FileNotFoundError(
                    f"feature store {storage_path!r} not found (try "
                    f"--feats_root)")
        return readers[storage_path]

    n_feat_dim = None
    writer = None
    out_bin = os.path.join(dst, f"feats_{split}.bin")
    for rec in iter_lhotse_cuts(cuts_path):
        sup = rec["supervisions"][0]
        custom = sup.get("custom") or {}
        feats = rec.get("features") or {}
        mel = reader_for(feats["storage_path"]).read(feats["storage_key"])
        if mel.ndim != 2:
            raise ValueError(f"cut {rec['id']}: expected (T, n_mels) mel, "
                             f"got {mel.shape}")
        if writer is None:
            n_feat_dim = mel.shape[1]
            writer = FeatureWriter(out_bin, dim=n_feat_dim, dtype=dtype)
        path, off = writer.add(mel)
        wav_path = ""
        rec_src = (rec.get("recording") or {}).get("sources") or []
        if rec_src:
            wav_path = rec_src[0].get("source", "")
        manifest.cuts.append(Cut(
            id=rec["id"],
            speaker=sup.get("speaker", ""),
            duration=float(rec["duration"]),
            num_frames=int(mel.shape[0]),
            phone_tokens=[str(p) for p in custom.get("phone_tokens", [])],
            duration_tokens=[int(d) for d in custom.get("duration_tokens", [])],
            text=sup.get("text") or "",
            feats_path=path,
            feats_offset=off,
            wav_path=wav_path,
        ))
        symbols.update(manifest.cuts[-1].phone_tokens)
    if writer is not None:
        writer.close()
    for r in readers.values():
        r.close()
    manifest.save(os.path.join(dst, f"cuts_{split}.jsonl.gz"))
    return manifest, symbols


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--src", required=True, help="reference ds dir "
                    "(cuts_{train,valid}.jsonl.gz + HDF5 feature stores)")
    ap.add_argument("--dst", required=True, help="native ds output dir")
    ap.add_argument("--feats_root", default=None,
                    help="base dir for relative storage_path entries "
                         "(default: --src's parent)")
    ap.add_argument("--dtype", default="float16",
                    choices=("float16", "float32"),
                    help="memmap shard dtype (prepare_ds default: float16)")
    args = ap.parse_args(argv)

    os.makedirs(args.dst, exist_ok=True)
    feats_root = args.feats_root or os.path.dirname(os.path.abspath(args.src))

    all_symbols = set()
    report = {"src": args.src, "dst": args.dst, "splits": {}}
    for split in ("train", "valid"):
        manifest, symbols = convert_split(
            args.src, args.dst, split, feats_root, args.dtype)
        if manifest is None:
            continue
        all_symbols |= symbols
        report["splits"][split] = len(manifest)

    # symbol table: copy the reference's (token ids preserved for converted
    # checkpoints), else regenerate exactly as prepare_ds stage 1 does
    src_tbl = os.path.join(args.src, "unique_text_tokens.k2symbols")
    dst_tbl = os.path.join(args.dst, "unique_text_tokens.k2symbols")
    if os.path.exists(src_tbl):
        shutil.copy(src_tbl, dst_tbl)
        report["symbol_table"] = "copied"
    else:
        from megatts2_tpu.text import SymbolTable

        table = SymbolTable()
        for s in sorted(all_symbols):
            table.add(s)
        table.to_file(dst_tbl)
        report["symbol_table"] = "generated"

    # stage-2 latents: identical layout in both frameworks — link across
    src_lat = os.path.join(args.src, "latents")
    dst_lat = os.path.join(args.dst, "latents")
    if os.path.isdir(src_lat) and not os.path.exists(dst_lat):
        os.symlink(os.path.abspath(src_lat), dst_lat)
        report["latents"] = "linked"

    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()
