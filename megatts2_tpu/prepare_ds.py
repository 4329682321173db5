"""Offline dataset preparation — 3 stages, same flags as the reference CLI
(``prepare_ds.py:67-86``):

  stage 0: tokenize ``{id}.txt`` → ``{id}.lab`` next to each wav (for MFA);
  stage 1: TextGrids → per-phone frame durations, cut manifests
           (train/valid interleaved split), mel features into memmap shards,
           ``unique_text_tokens.k2symbols`` symbol table;
  stage 2: run the trained generator's ``s2_latent`` per cut and save
           ``{ds_path}/latents/{spk}/{id}.npy`` with tc_latent + p_code.

TPU-first departures: mel extraction is the jitted XLA ``mel_spectrogram``
(optionally on the TPU itself), run over bucketed batches instead of
per-file torch calls (the hand-written Pallas mel kernel was measured
slower and retired — BENCHMARKS.md); stage-2 latent extraction jits one
``s2_latent`` graph per shape bucket.
"""
from __future__ import annotations

import argparse
import glob
import os
from functools import partial
from multiprocessing import Pool
from typing import List

import numpy as np

from . import HIFIGAN_HOP_LENGTH, HIFIGAN_SR
from .data import Cut, CutManifest, FeatureWriter
from .ops import num_frames
from .text import SymbolTable, TextTokenizer, read_textgrid
from .utils.audio import load_wav, peak_normalize, save_wav


def make_lab(tt: TextTokenizer, wav: str) -> None:
    base = os.path.splitext(wav)[0]
    with open(base + ".txt", encoding="utf-8") as f:
        txt = f.read()
    with open(base + ".lab", "w", encoding="utf-8") as f:
        f.write(" ".join(tt.tokenize(txt)))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="megatts2_tpu dataset preparation")
    p.add_argument("--stage", type=int, default=0, help="Stage to run (0/1/2)")
    p.add_argument("--wavtxt_path", type=str, default="data/wavs/")
    p.add_argument("--text_grid_path", type=str, default="data/textgrids/")
    p.add_argument("--ds_path", type=str, default="data/ds/")
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--test_set_ratio", type=float, default=0.03)
    p.add_argument("--trim_wav", type=bool, default=False)
    p.add_argument("--generator_ckpt", type=str, default="generator.ckpt")
    p.add_argument("--generator_config", type=str, default="configs/config_gan.yaml")
    p.add_argument("--pinyin_dict", type=str, default=None)
    return p.parse_args(argv)


class DatasetMaker:
    def __init__(self, args):
        self.args = args
        # 0 disables the valid split (e.g. prompt-only datasets prepared
        # for inference/eval); the reference would divide by zero here
        self.test_set_interval = (
            max(1, int(1 / args.test_set_ratio)) if args.test_set_ratio > 0 else 0
        )

    # ----------------------------------------------------------- stage 0
    def make_labs(self) -> None:
        wavs = glob.glob(f"{self.args.wavtxt_path}/**/*.wav", recursive=True)
        tt = TextTokenizer(self.args.pinyin_dict)
        with Pool(self.args.num_workers) as p:
            list(p.imap(partial(make_lab, tt), wavs))

    # ----------------------------------------------------------- stage 1
    def _parse_one(self, n: int, tg: str):
        """Host-side per-file work (thread-parallel): TextGrid → phone/
        duration tokens, wav → bucket-padded signal.  Returns a record dict
        or None for files without phone intervals."""
        frame_shift = HIFIGAN_HOP_LENGTH / HIFIGAN_SR
        cut_id = os.path.splitext(os.path.basename(tg))[0]
        speaker = os.path.basename(os.path.dirname(tg))
        wav_path = os.path.join(self.args.wavtxt_path, speaker, cut_id + ".wav")
        txt_path = os.path.join(self.args.wavtxt_path, speaker, cut_id + ".txt")

        intervals = [e for e in read_textgrid(tg) if e.tier == "phones"]
        if not intervals:
            return None
        if intervals[0].name == "":
            intervals = intervals[1:]
        if intervals[-1].name == "":
            intervals = intervals[:-1]

        y = load_wav(wav_path, HIFIGAN_SR)
        if self.args.trim_wav:
            start_i = int(intervals[0].start * HIFIGAN_SR)
            stop_i = int(intervals[-1].stop * HIFIGAN_SR)
            y = peak_normalize(y[start_i:stop_i])
            save_wav(wav_path, y, HIFIGAN_SR)

        start = intervals[0].start
        n_fr = num_frames(y.shape[-1])

        duration_tokens: List[int] = []
        phone_tokens: List[str] = []
        for e in intervals:
            phone_stop = e.stop - start
            n_frame_interval = int(phone_stop / frame_shift)
            duration_tokens.append(n_frame_interval - sum(duration_tokens))
            phone_tokens.append(e.name if e.name else "<sil>")
        if sum(duration_tokens) > n_fr:
            raise AssertionError(
                f"{cut_id}: sum(duration_tokens)={sum(duration_tokens)} > n_frames={n_fr}"
            )

        # pad the signal to a sample bucket (multiple of 32768) so the
        # jitted mel kernel compiles once per (bucket, batch) — not per file
        bucket = ((y.shape[-1] + 32767) // 32768) * 32768
        text = open(txt_path, encoding="utf-8").read() if os.path.exists(txt_path) else ""
        return {
            "id": cut_id, "speaker": speaker, "text": text,
            "split": ("train" if self.test_set_interval == 0
                      or n % self.test_set_interval else "valid"),
            "n_samples": y.shape[-1], "n_fr": n_fr, "bucket": bucket,
            "y_pad": np.pad(y, (0, bucket - y.shape[-1])),
            "phone_tokens": phone_tokens, "duration_tokens": duration_tokens,
            "wav_path": wav_path,
        }

    def make_ds(self, mel_batch: int = 8) -> None:
        """Stage 1, pipelined: TextGrid/wav parsing runs on a
        ``--num_workers`` thread pool (the reference parallelizes its mel
        extraction over ``num_jobs`` processes, prepare_ds.py:211-217) while
        the main thread batches same-bucket signals through the jitted mel
        kernel and appends features/manifests serially."""
        from concurrent.futures import ThreadPoolExecutor

        import jax.numpy as jnp

        from .ops import mel_spectrogram

        tgs = sorted(
            glob.glob(f"{self.args.text_grid_path}/**/*.TextGrid", recursive=True)
        )
        os.makedirs(self.args.ds_path, exist_ok=True)

        manifests = {"train": CutManifest(), "valid": CutManifest()}
        writers = {
            split: FeatureWriter(os.path.join(self.args.ds_path, f"feats_{split}.bin"))
            for split in manifests
        }
        unique_symbols = set()
        max_duration_token = 0
        groups: dict = {}  # bucket size -> pending records

        def flush(recs: List[dict]) -> None:
            nonlocal max_duration_token
            sigs = jnp.asarray(np.stack([r["y_pad"] for r in recs]))
            mels = np.asarray(mel_spectrogram(sigs), np.float32)
            for r, mel in zip(recs, mels):
                mel = mel[: r["n_fr"]]
                path, off = writers[r["split"]].add(mel)
                manifests[r["split"]].cuts.append(
                    Cut(
                        id=r["id"], speaker=r["speaker"],
                        duration=r["n_samples"] / HIFIGAN_SR, num_frames=mel.shape[0],
                        phone_tokens=r["phone_tokens"],
                        duration_tokens=r["duration_tokens"],
                        text=r["text"], feats_path=path, feats_offset=off,
                        wav_path=r["wav_path"],
                    )
                )
                unique_symbols.update(r["phone_tokens"])
                max_duration_token = max(max_duration_token, len(r["duration_tokens"]))

        workers = max(1, self.args.num_workers)
        with ThreadPoolExecutor(workers) as ex:
            for rec in ex.map(self._parse_one, range(len(tgs)), tgs):
                if rec is None:
                    continue
                pending = groups.setdefault(rec["bucket"], [])
                pending.append(rec)
                if len(pending) >= mel_batch:
                    flush(pending)
                    groups[rec["bucket"]] = []
        for bucket in sorted(groups):
            if groups[bucket]:
                flush(groups[bucket])

        for split, m in manifests.items():
            writers[split].close()
            m.save(os.path.join(self.args.ds_path, f"cuts_{split}.jsonl.gz"))

        table = SymbolTable()
        for s in sorted(unique_symbols):
            table.add(s)
        table.to_file(os.path.join(self.args.ds_path, "unique_text_tokens.k2symbols"))
        print(f"max_duration_token: {max_duration_token}")

    # ----------------------------------------------------------- stage 2
    def extract_latent(self) -> None:
        import jax
        import jax.numpy as jnp

        from .config import load_gan_config
        from .data import GANBatchBuilder
        from .models import MegaG
        from .training.checkpoints import load_generator_from_orbax
        from .training.convert import convert_megag, load_torch_state_dict

        g_cfg, _, _ = load_gan_config(self.args.generator_config)
        g = MegaG(g_cfg)
        if self.args.generator_ckpt.endswith((".ckpt", ".pt", ".pth")):
            g_vars = convert_megag(
                load_torch_state_dict(self.args.generator_ckpt, prefix="G."), g_cfg
            )
        else:  # orbax checkpoint directory of a GANTrainState
            g_vars = load_generator_from_orbax(self.args.generator_ckpt)

        ds = self.args.ds_path
        cuts_all = CutManifest.load(os.path.join(ds, "cuts_train.jsonl.gz"))
        cuts_valid = CutManifest.load(os.path.join(ds, "cuts_valid.jsonl.gz"))
        cuts_all.cuts.extend(cuts_valid.cuts)
        builder = GANBatchBuilder(cuts_all, ds)

        def s2_fn(variables, phone, lens, mel_mrte, mel_vqpe):
            return g.apply(variables, phone, lens, mel_mrte, mel_vqpe,
                           method=MegaG.s2_latent)

        s2 = jax.jit(s2_fn)
        # Commit the (orbax-loaded, numpy) generator tree to the device ONCE.
        # Passing a numpy tree as a jit argument re-transfers all ~775 MB of
        # it through the tunnel on EVERY call (~25 s/batch), and the axon
        # plugin never releases the staging buffers — a 10k-utterance
        # extraction OOM-killed a 125 GB host at batch 134 before this.
        variables = jax.device_put(
            {"params": g_vars["params"], "vq_stats": g_vars["vq_stats"]}
        )
        jax.block_until_ready(variables)

        # batched extraction: sort by length so padded batches are tight,
        # run B cuts per device pass (the reference extracts one cut per
        # CUDA call, prepare_ds.py:240-258)
        B = 8
        order = sorted(range(len(cuts_all)), key=lambda i: cuts_all[i].num_frames)
        for start in range(0, len(order), B):
            idxs = order[start : start + B]
            batch = builder(idxs)
            tc, codes = s2(
                variables,
                jnp.asarray(batch["phone_tokens"]),
                jnp.asarray(batch["tokens_lens"]),
                # host-cast back to f32: the builder emits fp16 on the wire
                # for the leaky train path; extraction is bounded (~1.3k
                # batches) and stays at full precision
                jnp.asarray(np.asarray(batch["mel_timbres"], np.float32)),
                jnp.asarray(np.asarray(batch["mel_targets"], np.float32)),
            )
            tc = np.asarray(tc, np.float32)
            codes = np.asarray(codes, np.int32)  # (n_q, B, T8)
            for b, i in enumerate(idxs):
                cut = cuts_all[i]
                os.makedirs(os.path.join(ds, "latents", cut.speaker), exist_ok=True)
                tl = int(batch["tokens_lens"][b])
                n_codes = -(-int(batch["mel_target_lens"][b]) // 8)
                out = {
                    "tc_latent": tc[b : b + 1, :tl],
                    "p_code": codes[:, b : b + 1, :n_codes].transpose(1, 0, 2),
                }
                np.save(os.path.join(ds, "latents", cut.speaker, f"{cut.id}.npy"), out)


def main(argv=None):
    args = parse_args(argv)
    dm = DatasetMaker(args)
    if args.stage == 0:
        dm.make_labs()
    elif args.stage == 1:
        dm.make_ds()
    elif args.stage == 2:
        dm.extract_latent()
    else:
        raise ValueError(f"unknown stage {args.stage}")


if __name__ == "__main__":
    main()
