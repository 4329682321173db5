"""End-to-end quality harness on a FULLY self-trained stack.

Takes the checkpoint root of a ``tools/train_curve.py --stages
gan,vocoder,plm,adm`` run (every component trained from scratch in-repo;
zero external weights) and measures zero-shot synthesis quality through
the real ``Megatts`` surface, for EVERY corpus speaker:

* **timbre transfer** — judged by SPECTRAL ENVELOPE, not pitch: each
  speaker's envelope centroid (mean c1..c13 cepstra) is estimated FROM
  THE CORPUS and the generated audio must classify to the prompt
  speaker by nearest centroid.  (In the Mega-TTS2 factorization f0 is
  *prosody*, carried by the VQ codes/PLM; the round-3 8-speaker drive
  showed f0-band classification conflates the two — BOS-only decodes
  legitimately generate modal-corpus prosody.)  The corpus generator
  gives every speaker distinct formants (bench_input_pipeline.py);
* **prosody cloning** — the f0 band (corpus median ± tolerance) is
  checked on the PROMPTED decode (`prompted_in_band`): an in-context
  same-speaker prosody prompt should pull f0 into the speaker's band;
* **mel-cepstral distortion (MCD)** — DTW-aligned MCD between the
  generated utterance and a same-speaker corpus rendition of the same
  words (the synthetic corpus is single-sentence, so ground truth
  exists);
* **duration MAE** — ADM-predicted durations vs the ground-truth
  duration tokens of a corpus cut (frames/phone);
* **prompted-vs-BOS decode** — the in-context prosody prompt must
  change the decode and stay in band.

Prints one JSON line.  The reference's only quality artifact is a mel
picture in a filename (``examples/mel_step_400k_re_loss_0.4771.png``).

    python tools/e2e_quality.py --root /tmp/full_drive
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, ".")

import numpy as np


def dominant_f0(y: np.ndarray, sr: int = 16000, lo: float = 60.0, hi: float = 400.0) -> float:
    """Fundamental estimate within [lo, hi] Hz via the harmonic product
    spectrum (spectra downsampled ×1..×4 multiplied): robust when formant
    resonances make a HARMONIC the strongest FFT peak (the formant-shaped
    corpus would otherwise alias f0 to h2/h3)."""
    y = np.asarray(y, np.float64)
    if y.size < sr // 4:
        return 0.0
    spec = np.abs(np.fft.rfft(y * np.hanning(y.size)))
    freqs = np.fft.rfftfreq(y.size, 1.0 / sr)
    n = spec.size
    hps = np.log(spec + 1e-12).copy()
    for k in (2, 3, 4):
        hps[: n // k] += np.log(spec[::k][: n // k] + 1e-12)
    band = (freqs >= lo) & (freqs <= hi) & (freqs < freqs[n // 4 - 1])
    return float(freqs[band][np.argmax(hps[band])])


def mfcc_from_mel(logmel: np.ndarray, n_coef: int = 13) -> np.ndarray:
    """(T, n_mels) log-mel → (T, n_coef) cepstra via DCT-II (c1..c13)."""
    from scipy.fftpack import dct

    return dct(logmel, type=2, axis=-1, norm="ortho")[:, 1 : n_coef + 1]


def dtw_mcd(c_ref: np.ndarray, c_gen: np.ndarray) -> float:
    """Mel-cepstral distortion (dB): mean frame distance along the DTW
    alignment path (standard 10*sqrt(2)/ln10 scaling)."""
    Tr, Tg = c_ref.shape[0], c_gen.shape[0]
    d = np.sqrt(
        ((c_ref[:, None, :] - c_gen[None, :, :]) ** 2).sum(-1)
    )  # (Tr, Tg) frame distances
    INF = np.inf
    acc = np.full((Tr + 1, Tg + 1), INF)
    steps = np.zeros((Tr + 1, Tg + 1), np.int64)
    acc[0, 0] = 0.0
    for i in range(1, Tr + 1):
        ai, ai1, di = acc[i], acc[i - 1], d[i - 1]
        si, si1 = steps[i], steps[i - 1]
        for j in range(1, Tg + 1):
            best = ai1[j - 1]
            sbest = si1[j - 1]
            if ai1[j] < best:
                best, sbest = ai1[j], si1[j]
            if ai[j - 1] < best:
                best, sbest = ai[j - 1], si[j - 1]
            ai[j] = di[j - 1] + best
            si[j] = sbest + 1
    return float(
        10.0 * np.sqrt(2.0) / np.log(10.0) * acc[Tr, Tg] / max(steps[Tr, Tg], 1)
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True, help="train_curve --root dir")
    ap.add_argument("--out_dir", default=None)
    ap.add_argument("--text", default="hello world nice day of speech",
                    help="default = the corpus sentence (enables MCD vs "
                         "ground truth)")
    ap.add_argument("--max_frames", type=int, default=512)
    ap.add_argument("--n_prompt_wavs", type=int, default=3)
    ap.add_argument("--band_tol", type=float, default=0.25,
                    help="speaker band = corpus median f0 ± tol (fraction)")
    ap.add_argument("--quant_int8", action="store_true",
                    help="int8 weight-only PLM decode (the serving/bench "
                         "default) — run once without and once with this "
                         "flag for the fp32-vs-int8 quality rows")
    args = ap.parse_args()

    from megatts2_tpu import enable_compilation_cache

    enable_compilation_cache()

    import jax.numpy as jnp

    from megatts2_tpu.config import (
        load_adm_config,
        load_gan_config,
        load_plm_config,
        load_vocoder_config,
    )
    from megatts2_tpu.data import resolve_prompt
    from megatts2_tpu.models import Megatts
    from megatts2_tpu.ops import mel_spectrogram
    from megatts2_tpu.training.checkpoints import (
        best_checkpoint,
        load_generator_from_orbax,
        load_vocoder_from_orbax,
        restore_pytree,
    )
    from megatts2_tpu.utils.audio import load_wav

    root = args.root
    ds = os.path.join(root, "ds")
    out_dir = args.out_dir or os.path.join(root, "e2e_out")
    os.makedirs(out_dir, exist_ok=True)

    g_cfg, _, _ = load_gan_config(os.path.join(root, "gan.yaml"))
    plm_cfg, _ = load_plm_config(os.path.join(root, "plm.yaml"))
    adm_cfg, _ = load_adm_config(os.path.join(root, "adm.yaml"))
    voc_cfg, _, _ = load_vocoder_config(os.path.join(root, "vocoder.yaml"))

    cks = os.path.join(root, "ckpts")
    g_vars = load_generator_from_orbax(best_checkpoint(os.path.join(cks, "gan")))
    plm_params = restore_pytree(best_checkpoint(os.path.join(cks, "plm")))["params"]
    adm_params = restore_pytree(best_checkpoint(os.path.join(cks, "adm")))["params"]
    voc_params = load_vocoder_from_orbax(best_checkpoint(os.path.join(cks, "vocoder")))

    tts = Megatts(
        g_vars, plm_params, adm_params, voc_params,
        os.path.join(ds, "unique_text_tokens.k2symbols"),
        g_cfg=g_cfg, plm_cfg=plm_cfg, adm_cfg=adm_cfg, hifi_cfg=voc_cfg,
        max_frames=args.max_frames, dtype=jnp.bfloat16,
        quant_int8=args.quant_int8,
    )

    # ---- per-speaker corpus statistics (bands from the data, no
    # hardcoding — scales to any corpus the generator produced) ----
    speakers = sorted(
        os.path.basename(p) for p in glob.glob(os.path.join(root, "wavs", "*"))
        if os.path.isdir(p)
    )
    spk_wavs = {
        s: sorted(glob.glob(os.path.join(root, "wavs", s, "*.wav")))
        for s in speakers
    }
    spk_f0 = {
        s: float(np.median([dominant_f0(load_wav(w)) for w in ws[:6]]))
        for s, ws in spk_wavs.items()
    }

    # Per-speaker TIMBRE centroid: mean c1..c13 cepstra over a few corpus
    # utterances.  In the Mega-TTS2 factorization f0 is PROSODY (VQ codes
    # / PLM), timbre is the SPECTRAL ENVELOPE (MRTE) — so timbre transfer
    # is judged by nearest-envelope-centroid classification, and the
    # f0-band check moves to the PROMPTED decode (prosody cloning).
    def mean_cepstra(wav: np.ndarray) -> np.ndarray:
        import jax.numpy as _jnp

        mel = np.asarray(mel_spectrogram(_jnp.asarray(wav)))
        return mfcc_from_mel(mel).mean(axis=0)

    spk_env = {
        s: np.mean([mean_cepstra(load_wav(w)) for w in ws[:6]], axis=0)
        for s, ws in spk_wavs.items()
    }

    # ground-truth duration tokens + reference mel (any corpus cut; the
    # corpus is single-sentence so every cut renders args.text's words)
    from megatts2_tpu.data import load_prompt_manifest

    manifest = load_prompt_manifest(ds)
    cut_by_spk = {}
    for c in manifest:
        cut_by_spk.setdefault(c.speaker, c)

    import shutil

    report = {"root": root, "text": args.text,
              "plm_decode": "int8" if args.quant_int8 else "fp32",
              "speaker_f0_hz": {
                  s: round(f, 1) for s, f in spk_f0.items()}}
    per_spk = {}
    correct = 0
    mcds, dur_maes = [], []
    prompted_ok = prompted_diff = 0
    for spk in speakers:
        lo, hi = spk_f0[spk] * (1 - args.band_tol), spk_f0[spk] * (1 + args.band_tol)
        wavs = spk_wavs[spk][: args.n_prompt_wavs]
        pdir = os.path.join(out_dir, f"prompt_{spk}")
        os.makedirs(pdir, exist_ok=True)
        for w in wavs:
            dst = os.path.join(pdir, os.path.basename(w))
            if not os.path.exists(dst):
                shutil.copy(w, dst)
        out_path = os.path.join(out_dir, f"gen_{spk}.wav")
        full = tts(pdir, args.text, out_path=out_path)
        prompt_len = load_wav(wavs[0]).shape[0]
        gen = full[prompt_len:]
        f0 = dominant_f0(gen)
        in_band = lo <= f0 <= hi
        # nearest-envelope-centroid TIMBRE classification (pitch-free)
        c_env = mean_cepstra(gen)
        pred = min(spk_env, key=lambda s: float(
            np.linalg.norm(spk_env[s] - c_env)))
        correct += pred == spk

        # MCD vs a same-speaker corpus rendition (13 cepstra, DTW)
        ref_wav = load_wav(spk_wavs[spk][-1])
        c_ref = mfcc_from_mel(np.asarray(mel_spectrogram(jnp.asarray(ref_wav))))
        c_gen = mfcc_from_mel(np.asarray(mel_spectrogram(jnp.asarray(gen))))
        mcd = dtw_mcd(c_ref, c_gen) if c_gen.shape[0] > 8 else float("nan")
        mcds.append(mcd)

        # duration MAE: ADM predictions on a corpus cut's phones vs its
        # ground-truth duration tokens (same prompt mels)
        cut = cut_by_spk[spk]
        ids = np.array(
            [tts.token2idx[p] for p in cut.phone_tokens
             if not (p in ("_", "-") and p not in tts.token2idx)],
            np.int32,
        )
        mels = [np.asarray(mel_spectrogram(jnp.asarray(load_wav(w)))) for w in wavs]
        mel_prompt = np.concatenate(mels, axis=0)[None]
        from megatts2_tpu.models import MegaG
        from megatts2_tpu.models.adm import adm_infer

        g = MegaG(g_cfg, dtype=jnp.bfloat16)
        tc = g.apply(
            tts.g_vars, jnp.asarray(ids[None]), jnp.asarray(mel_prompt),
            jnp.asarray([ids.size]),
            method=lambda m, p, mel, pl: m.mrte.tc_latent(p, mel, pl),
        )
        dt = np.asarray(adm_infer(
            tts.adm_params, adm_cfg, tc.astype(jnp.float32), dtype=jnp.bfloat16
        ))[0, : ids.size]
        true_dt = np.asarray(cut.duration_tokens[: ids.size], np.float64)
        dur_mae = float(np.abs(dt[: true_dt.size] - true_dt).mean())
        dur_maes.append(dur_mae)

        # prompted decode: must stay in band and differ from BOS-only
        pf = resolve_prompt(ds, speaker=spk, n=3)
        out_p = os.path.join(out_dir, f"gen_{spk}_prompted.wav")
        full_p = tts(pdir, args.text, out_path=out_p, prompt_features=pf)
        gen_p = full_p[prompt_len:]
        f0_p = dominant_f0(gen_p)
        in_band_p = lo <= f0_p <= hi
        nmin = min(gen.shape[0], gen_p.shape[0])
        differs = not np.allclose(gen[:nmin], gen_p[:nmin])
        prompted_ok += in_band_p
        prompted_diff += differs

        per_spk[spk] = {
            "band_hz": [round(lo, 1), round(hi, 1)],
            "generated_f0_hz": round(f0, 1),
            "in_band": bool(in_band),
            "classified_as": pred,
            "mcd_db": round(mcd, 2),
            "duration_mae_frames": round(dur_mae, 2),
            "prompted_f0_hz": round(f0_p, 1),
            "prompted_in_band": bool(in_band_p),
            "prompted_differs": bool(differs),
        }

    n = len(speakers)
    report["speakers"] = per_spk
    report["n_speakers"] = n
    # timbre = envelope identity (MRTE's job); prosody = f0 (the codes'
    # job, checked on the prompted decode)
    report["timbre_classification_acc"] = round(correct / n, 3)
    report["mcd_db_mean"] = round(float(np.nanmean(mcds)), 2)
    report["duration_mae_frames_mean"] = round(float(np.mean(dur_maes)), 2)
    report["prompted_in_band_frac"] = round(prompted_ok / n, 3)
    report["prompted_differs_frac"] = round(prompted_diff / n, 3)
    report["timbre_transfer_ok"] = bool(correct / n >= 0.75)
    report["timbre_transfer_ok_threshold"] = 0.75
    print(json.dumps(report))


if __name__ == "__main__":
    main()
