"""Batch builders for the three training stages (GAN / PLM / ADM).

Parity targets: reference ``modules/datamodule.py`` —
* TTSDataset (:72-137): phone/duration tokens padded with 0, mel targets
  truncated so Σdurations ≤ mel_len, timbre mels = concat of 2..10 random
  same-speaker utterances cut to the batch-min length;
* MegaPLMDataset (:140-240): stage-2 latents length-regulated by duration
  then ×8 max-pooled, ≤10 same-speaker utterances prefixed as prompt,
  BOS=vq_bins prepended, EOS=vq_bins+1 padded;
* MegaADMDataset (:243-296): cuts with any duration ≥128 skipped, leading-0
  BOS pad, float durations (B, T+1, 1).

TPU-first departure: every padded axis rounds up to a bucket multiple so the
jit cache stays small (static shapes), and batch assembly is pure numpy —
no torch, no thread-pooled HDF5 (features are memmap slices).
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from .features import FeatureReader
from .manifest import CutManifest
from .sampler import round_up
from .shape_guard import safe_target_frames
from ..text.symbol_table import SymbolTable

MEL_PAD_MULTIPLE = 64
PHONE_PAD_MULTIPLE = 16


def expand_by_durations(x: np.ndarray, durations: np.ndarray) -> np.ndarray:
    """Host-side length regulation: (T, D) → (Σdur, D)."""
    return np.repeat(x, durations.astype(np.int64), axis=0)


def max_pool_1d_ceil(x: np.ndarray, stride: int) -> np.ndarray:
    """(T, D) → (ceil(T/stride), D) max pooling."""
    T, D = x.shape
    pad = (-T) % stride
    if pad:
        x = np.concatenate([x, np.full((pad, D), -np.inf, x.dtype)], axis=0)
    return x.reshape(-1, stride, D).max(axis=1)


class TokensCollector:
    """Phone-string → id collation (reference ``datamodule.py:30-69``)."""

    def __init__(self, symbols_file: str):
        self.token2idx = {
            tok: idx for idx, tok in enumerate(SymbolTable.from_file(symbols_file).symbols)
        }

    def phone2token(self, phones: List[str]) -> np.ndarray:
        return np.array([self.token2idx[p] for p in phones], dtype=np.int32)

    def collate(self, cuts) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        lens = np.array([len(c.phone_tokens) for c in cuts], np.int32)
        T = round_up(int(lens.max()), PHONE_PAD_MULTIPLE)
        phones = np.zeros((len(cuts), T), np.int32)
        durs = np.zeros((len(cuts), T), np.int32)
        for i, c in enumerate(cuts):
            phones[i, : lens[i]] = self.phone2token(c.phone_tokens)
            durs[i, : lens[i]] = np.asarray(c.duration_tokens, np.int32)
        return phones, durs, lens


class GANBatchBuilder:
    """Builds the VQ-GAN training batch (reference TTSDataset semantics)."""

    def __init__(
        self,
        manifest: CutManifest,
        ds_path: str,
        n_same_spk_samples: int = 10,
        seed: int = 0,
        max_timbre_frames: int = 2048,
        use_native: bool = True,
    ):
        self.manifest = manifest
        self.collector = TokensCollector(os.path.join(ds_path, "unique_text_tokens.k2symbols"))
        self.reader = FeatureReader()
        self.native = None
        if use_native:
            try:  # C++ mmap/thread-pool loader (native/dataloader.cpp)
                from .native_loader import NativeFeatureReader

                self.native = NativeFeatureReader()
            except Exception:
                self.native = None
        self.spk2idx = manifest.speaker_index()
        self.n_same_spk_samples = n_same_spk_samples
        self.rng = np.random.RandomState(seed)
        self.max_timbre_frames = max_timbre_frames
        self._ring = None  # lazy native prefetch ring (resized on demand)

    def _get_ring(self, need_floats: int):
        if self._ring is None or self._ring.max_floats < need_floats:
            if self._ring is not None:
                self._ring.close()
            self._ring = self.native.ring_create(2, need_floats)
        return self._ring

    def _read_mel(self, cut) -> np.ndarray:
        return self.reader.read(cut.feats_path, cut.feats_offset, cut.num_frames)

    def __call__(self, idxs: List[int]) -> Dict[str, np.ndarray]:
        cuts = [self.manifest[i] for i in idxs]
        phones, durs, lens = self.collector.collate(cuts)

        # mel targets, truncated to Σduration then padded to bucket multiple
        tgt_lens = np.array(
            [min(int(sum(c.duration_tokens)), c.num_frames) for c in cuts], np.int32
        )
        T = max(int(tgt_lens.max()), 128)
        T = round_up(T, MEL_PAD_MULTIPLE)
        # dodge measured remote-compiler crash geometries (shape_guard.py)
        T = safe_target_frames(len(cuts), T, self.max_timbre_frames)
        same_shard = len({c.feats_path for c in cuts}) == 1
        ticket = -1
        if self.native is not None and same_shard:
            # async: the C++ pool fills the padded target batch while this
            # thread assembles timbre mels below (prefetch-ring overlap)
            ring = self._get_ring(len(cuts) * T * 80)
            ticket = ring.submit(
                cuts[0].feats_path,
                [c.feats_offset for c in cuts],
                tgt_lens.tolist(),
                T,
            )
        if ticket < 0:
            mel_targets = np.zeros((len(cuts), T, 80), np.float32)
            for i, c in enumerate(cuts):
                mel_targets[i, : tgt_lens[i]] = self._read_mel(c)[: tgt_lens[i]]

        try:
            return self._assemble(cuts, phones, durs, lens, tgt_lens, T,
                                  ticket, None if ticket >= 0 else mel_targets)
        except BaseException:
            if ticket >= 0:
                # never leak a ring slot: an exception mid-assembly (e.g. a
                # bad timbre cut) would otherwise strand the ticket and,
                # after 2 such events, silently disable the native ring
                # forever (advisor r2)
                try:
                    self._ring.wait(ticket, len(cuts), T)
                finally:
                    self._ring.release(ticket)
            raise

    def _assemble(self, cuts, phones, durs, lens, tgt_lens, T, ticket, mel_targets):
        # timbre mels: concat of 2..n random same-speaker utterances
        n_sample = self.rng.randint(2, self.n_same_spk_samples + 1)
        timbres, tlens = [], []
        for c in cuts:
            pool = self.spk2idx[c.speaker]
            pick = self.rng.choice(pool, size=min(n_sample, len(pool)), replace=False)
            picks = [self.manifest[int(j)] for j in pick]
            if self.native is not None and {p.feats_path for p in picks} == {cuts[0].feats_path}:
                mel = self.native.concat_slices(
                    picks[0].feats_path,
                    [p.feats_offset for p in picks],
                    [p.num_frames for p in picks],
                    self.max_timbre_frames,
                )
            else:
                mel = np.concatenate([self._read_mel(p) for p in picks])
                mel = mel[: self.max_timbre_frames]
            timbres.append(mel)
            tlens.append(mel.shape[0])
        tmin = min(tlens)
        # Round DOWN to a power of two (min 128): the reference already crops
        # timbre mels to the batch min, and a free-running tmin would give
        # every batch a distinct shape — one full jit compile per STEP on a
        # remote-compile target.  Pow2 buckets cap the shape set at ~5.
        if tmin >= 128:
            bucket = 128
            while bucket * 2 <= tmin:
                bucket *= 2
            tmin = min(bucket, self.max_timbre_frames)
        else:  # tiny corpora: round down to the phone multiple as before
            tmin = max(tmin - tmin % PHONE_PAD_MULTIPLE, PHONE_PAD_MULTIPLE)
        mel_timbres = np.stack([m[:tmin] for m in timbres]).astype(np.float32)

        if ticket >= 0:  # collect the async target fill
            mel_targets = self._ring.wait(ticket, len(cuts), T)
            self._ring.release(ticket)

        # fp16 on the wire (AFTER the fp32 native ring fill): the axon
        # plugin leaks a fraction of upload staging buffers, and a 30k-step
        # GAN run at ~3 MB fp32 mels/step OOM-killed a 129 GB host (round
        # 5).  The train step casts back to f32 at entry and computes in
        # bf16; fp16's 10-bit mantissa strictly dominates bf16's 7 and
        # log-mels ([-12, 3]) sit far inside fp16's exponent range, so
        # nothing is lost.  Same mitigation PLMBatchBuilder/ADMBatchBuilder
        # ship for tc_latents.
        return {
            "phone_tokens": phones,
            "duration_tokens": durs,
            "tokens_lens": lens,
            "mel_targets": mel_targets.astype(np.float16),
            "mel_target_lens": tgt_lens,
            "mel_timbres": mel_timbres.astype(np.float16),
        }


class VocoderBatchBuilder:
    """Raw-waveform crops for vocoder GAN training (no reference
    counterpart — the reference never trains a vocoder).

    Emits ``{"wav": (B, segment_frames*hop)}`` float32 crops at random
    offsets (seeded), zero-padded when an utterance is shorter than the
    segment.  The mel input/target is deliberately NOT built here: the
    train step computes it on-device with the framework's own mel kernel
    (``training/vocoder_trainer.py``), so the host ships 1/80th the bytes
    and mel numerics are exactly the synthesis-time ones."""

    def __init__(
        self,
        manifest: CutManifest,
        ds_path: str,  # unused; uniform builder signature
        segment_frames: int = 64,
        hop: int = 256,
        seed: int = 0,
    ):
        self.manifest = manifest
        self.n_samples = segment_frames * hop
        self.rng = np.random.RandomState(seed)
        self._cache: dict = {}

    def _load(self, cut) -> np.ndarray:
        wav = self._cache.get(cut.id)
        if wav is None:
            from ..utils.audio import load_wav

            wav = load_wav(cut.wav_path, 16000).astype(np.float32)
            if len(self._cache) < 256:  # small LRU-ish cache for tiny corpora
                self._cache[cut.id] = wav
        return wav

    def __call__(self, idxs: List[int]) -> Dict[str, np.ndarray]:
        out = np.zeros((len(idxs), self.n_samples), np.float32)
        for i, idx in enumerate(idxs):
            y = self._load(self.manifest[idx])
            if y.shape[0] <= self.n_samples:
                out[i, : y.shape[0]] = y
            else:
                start = self.rng.randint(0, y.shape[0] - self.n_samples + 1)
                out[i] = y[start : start + self.n_samples]
        return {"wav": out}


class LatentReader:
    """Stage-2 latent store: {ds_path}/latents/{spk}/{id}.npy with keys
    tc_latent (1, Tp, D) and p_code (1, 1, Tc)."""

    def __init__(self, ds_path: str):
        self.ds_path = ds_path

    def read(self, cut) -> Dict[str, np.ndarray]:
        path = os.path.join(self.ds_path, "latents", cut.speaker, f"{cut.id}.npy")
        return np.load(path, allow_pickle=True).item()


def prompt_features(
    manifest, ds_path: str, cut_ids: List[str], max_tokens: int = 2048
):
    """In-context prosody prompt for inference (plm_infer prompt_tc /
    prompt_codes): concatenate the stage-2 features of the given cuts —
    tc_latent length-regulated to frame rate and ×8-pooled to code rate,
    paired with the VQPE codes — exactly how PLMBatchBuilder builds the
    training prompt prefix.  Returns (tc (1, P, D) fp32, codes (1, P) i32),
    tail-truncated to ``max_tokens``.
    """
    reader = LatentReader(ds_path)
    by_id = {c.id: c for c in manifest}
    tcs, ps = [], []
    for cid in cut_ids:
        cut = by_id[cid]
        lat = reader.read(cut)
        tc = np.asarray(lat["tc_latent"][0], np.float32)
        tc = expand_by_durations(tc, np.asarray(cut.duration_tokens, np.int64))
        tc = max_pool_1d_ceil(tc, 8)
        p = np.asarray(lat["p_code"]).reshape(-1)
        assert tc.shape[0] == p.shape[0], (tc.shape, p.shape)
        tcs.append(tc)
        ps.append(p)
    tc = np.concatenate(tcs)[-max_tokens:]
    p = np.concatenate(ps)[-max_tokens:]
    return tc[None].astype(np.float32), p[None].astype(np.int32)


def load_prompt_manifest(ds_path: str) -> CutManifest:
    """All cuts (train + valid) of a prepared dataset — the prompt pool."""
    m = CutManifest.load(os.path.join(ds_path, "cuts_train.jsonl.gz"))
    vp = os.path.join(ds_path, "cuts_valid.jsonl.gz")
    if os.path.exists(vp):
        m.cuts.extend(CutManifest.load(vp).cuts)
    return m


def resolve_prompt(
    ds_path: str,
    cut_ids: Optional[List[str]] = None,
    speaker: Optional[str] = None,
    n: int = 3,
    max_tokens: int = 2048,
    manifest: Optional[CutManifest] = None,
):
    """User-surface entry to in-context prosody prompting: pick prompt cuts
    either explicitly (``cut_ids``) or as the first ``n`` utterances of a
    ``speaker``, and return ``(tc (1,P,D), codes (1,P))`` for plm_infer /
    synthesize.  ``ds_path`` is a prepare_ds root with stage-2 ``latents/``."""
    m = manifest if manifest is not None else load_prompt_manifest(ds_path)
    if not cut_ids:
        if not speaker:
            raise ValueError("need prompt cut_ids or a speaker")
        pool = [c.id for c in m if c.speaker == speaker]
        if not pool:
            raise ValueError(f"no cuts for speaker {speaker!r} in {ds_path}")
        cut_ids = pool[:n]
    return prompt_features(m, ds_path, list(cut_ids), max_tokens=max_tokens)


def fit_prompt(tc: np.ndarray, codes: np.ndarray, length: int):
    """Fit an in-context prosody prompt to a STATIC token length.

    Serving needs one compiled graph per prompt length, so prompts are
    tiled (a prompt is a same-speaker utterance concat — repeating it is
    within the PLM's training distribution, modules/datamodule.py:186-211)
    and tail-truncated so the LAST ``length`` tokens flow into decode.
    Accepts (P, ...)/(P,) or leading-batch (1, P, ...) arrays; returns
    batched (1, length, ...) fp32 / (1, length) int32."""
    tc = np.asarray(tc)
    codes = np.asarray(codes)
    if tc.ndim == 3:
        tc = tc[0]
    codes = codes.reshape(-1)
    P = tc.shape[0]
    assert P == codes.shape[0] and P > 0, (tc.shape, codes.shape)
    reps = -(-length // P)
    tc = np.concatenate([tc] * reps)[-length:]
    codes = np.concatenate([codes] * reps)[-length:]
    return tc[None].astype(np.float32), codes[None].astype(np.int32)


class PLMBatchBuilder:
    def __init__(
        self,
        manifest: CutManifest,
        ds_path: str,
        n_same_spk_samples: int = 10,
        vq_bins: int = 1024,
        seed: int = 0,
        max_tokens: int = 4096,
    ):
        self.manifest = manifest
        self.latents = LatentReader(ds_path)
        self.spk2idx = manifest.speaker_index()
        self.n = n_same_spk_samples
        self.bos = vq_bins
        self.eos = vq_bins + 1
        self.rng = np.random.RandomState(seed)
        self.max_tokens = max_tokens

    def _cut_latent(self, cut) -> tuple[np.ndarray, np.ndarray]:
        lat = self.latents.read(cut)
        tc = np.asarray(lat["tc_latent"][0], np.float32)  # (Tp, D)
        dur = np.asarray(cut.duration_tokens, np.int64)
        tc = expand_by_durations(tc, dur)  # frame rate
        tc = max_pool_1d_ceil(tc, 8)  # code rate
        p = np.asarray(lat["p_code"]).reshape(-1)  # (Tc,)
        assert tc.shape[0] == p.shape[0], (tc.shape, p.shape)
        return tc, p

    def __call__(self, idxs: List[int]) -> Dict[str, np.ndarray]:
        tc_list, code_list, lens = [], [], []
        for i in idxs:
            cut = self.manifest[i]
            tc, p = self._cut_latent(cut)
            pool = self.spk2idx[cut.speaker]
            picks = self.rng.choice(pool, size=min(self.n, len(pool)), replace=False)
            for j in picks:  # prompt prefix: same-speaker utterances
                tc_j, p_j = self._cut_latent(self.manifest[int(j)])
                tc = np.concatenate([tc_j, tc])
                p = np.concatenate([p_j, p])
            tc = tc[-self.max_tokens :]
            p = p[-self.max_tokens :]
            assert p.max() < self.bos
            code_list.append(np.concatenate([[self.bos], p]))
            tc_list.append(tc)
            lens.append(p.shape[0])

        lens = np.asarray(lens, np.int32)
        L = round_up(int(lens.max()), 32)
        D = tc_list[0].shape[1]
        p_codes = np.full((len(idxs), L + 1), self.eos, np.int32)
        # fp16 on the wire: tc_latents dominate the per-step host->device
        # transfer (a (8, 4096, 512) batch is 67 MB fp32 / 33 MB fp16) and
        # the train step computes in bf16 anyway.  Round-5 at-scale lesson:
        # the axon plugin leaks a fraction of upload staging buffers, and a
        # 27k-step PLM run at 67 MB/step grew to 130 GB host RSS and was
        # OOM-killed — halving the bytes halves the leak rate (and the
        # upload cost) at no training-precision cost.
        tc_latents = np.zeros((len(idxs), L, D), np.float16)
        for i, (tc, p) in enumerate(zip(tc_list, code_list)):
            p_codes[i, : len(p)] = p
            tc_latents[i, : tc.shape[0]] = tc
        return {"p_codes": p_codes, "tc_latents": tc_latents, "lens": lens}


class ADMBatchBuilder:
    def __init__(self, manifest: CutManifest, ds_path: str, max_duration_token: int = 128):
        self.manifest = manifest
        self.latents = LatentReader(ds_path)
        self.max_duration_token = max_duration_token

    def __call__(self, idxs: List[int]) -> Optional[Dict[str, np.ndarray]]:
        durs, tcs, lens = [], [], []
        for i in idxs:
            cut = self.manifest[i]
            d = np.asarray(cut.duration_tokens, np.float32)
            if d.max() >= self.max_duration_token:
                continue  # reference skips such cuts (datamodule.py:259-260)
            lat = self.latents.read(cut)
            tc = np.asarray(lat["tc_latent"][0], np.float32)
            assert tc.shape[0] == d.shape[0]
            durs.append(d)
            tcs.append(tc)
            lens.append(d.shape[0])
        if not durs:
            return None
        lens = np.asarray(lens, np.int32)
        T = round_up(int(lens.max()), PHONE_PAD_MULTIPLE)
        D = tcs[0].shape[1]
        duration_tokens = np.zeros((len(durs), T + 1, 1), np.float32)  # leading 0 = BOS
        # fp16 on the wire — see PLMBatchBuilder (staging-buffer leak +
        # upload cost; the step casts to its compute dtype regardless)
        tc_latents = np.zeros((len(durs), T, D), np.float16)
        for i, (d, tc) in enumerate(zip(durs, tcs)):
            duration_tokens[i, 1 : 1 + len(d), 0] = d
            tc_latents[i, : tc.shape[0]] = tc
        return {"duration_tokens": duration_tokens, "tc_latents": tc_latents, "lens": lens}
