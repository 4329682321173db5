#!/usr/bin/env python
"""Zero-shot cloning evaluation on HELD-OUT speakers (round-5 centerpiece).

Redesign of the round-4 e2e quality experiment per VERDICT r4 #1/#2: the
old harness evaluated the TRAINING corpus' speakers with ONE text and ONE
greedy decode per cell, on a corpus whose f0 bands were overlapping by
construction (8 speakers log-spaced at 1.2x spacing vs a 1.67x-wide
+/-25% tolerance band).  This tool fixes all three axes:

* **held-out speakers** — generated fresh (seed/formants/f0 never seen in
  training), then prepared through the REAL user path (prepare_ds stages
  0/1/2 with the trained GAN) so `resolve_prompt` works exactly as it
  would for a user cloning a new voice.  Zero-shot in the reference's
  sense (models/megatts2.py:295-375: prompt wavs in, cloned speech out).
* **disjoint f0 bands** — eval speakers are log-spaced at ratio 1.23
  (75..320 Hz) with a +/-8% tolerance band (per-utterance wobble is only
  +5%), so spacing strictly exceeds band width: bands cannot overlap and
  an in-band hit is evidence, not chance.  Formants are assigned on an
  F1-linear x F2-permuted grid so adjacent speakers differ in BOTH
  formants (envelope classification has no intrinsic confusions).
* **n>1 per cell** — >=4 texts (word permutations: same token count, one
  compile shape) x >=3 sampled decodes (plm_temperature>0, split rng)
  plus one greedy decode per text; all metrics reported mean +/- std.

Also measures the GAN+vocoder CEILING (decode from ground-truth stage-2
codes + durations, bypassing PLM/ADM) so a failure localizes to a stage.

    python tools/heldout_eval.py --train_root /tmp/pipe10k \
        --ckpt_root /tmp/pipe10k/ckpts50k --out /tmp/heldout [--quant_int8]
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tools.e2e_quality import dtw_mcd, mfcc_from_mel


def f0_acf(y: np.ndarray, sr: int = 16000, lo: float = 60.0,
           hi: float = 400.0) -> float:
    """Autocorrelation f0: robust where the harmonic-product estimator
    octave-errors (formant-shaped stacks whose fundamental is weak — the
    round-4 harness's dominant_f0 read one corpus speaker an octave high).
    Picks the SMALLEST lag whose ACF local max is within 95% of the global
    max (anti-octave-down), then parabolic-refines."""
    y = np.asarray(y, np.float64)
    if y.size < sr // 4:
        return 0.0
    y = y - y.mean()
    n = y.size
    f = np.fft.rfft(y, 2 * n)
    acf = np.fft.irfft(f * np.conj(f))[:n]
    acf /= acf[0] + 1e-12
    lag_min, lag_max = int(sr / hi), min(int(sr / lo), n - 2)
    seg = acf[lag_min:lag_max + 1]
    peaks = [i for i in range(1, seg.size - 1)
             if seg[i] >= seg[i - 1] and seg[i] >= seg[i + 1]]
    if not peaks:
        return 0.0
    best = max(seg[i] for i in peaks)
    i = next(i for i in peaks if seg[i] >= 0.95 * best)
    # parabolic interpolation around the integer lag
    a, b, c = seg[i - 1], seg[i], seg[i + 1]
    denom = a - 2 * b + c
    di = 0.5 * (a - c) / denom if abs(denom) > 1e-12 else 0.0
    return float(sr / (lag_min + i + di))

SR = 16000
WORDS = ["hello", "world", "nice", "day", "of", "speech"]
# same length (6 tokens) => ONE compile shape across texts
TEXTS = [
    "hello world nice day of speech",
    "speech of day nice world hello",
    "nice day of speech hello world",
    "world hello speech of day nice",
]


def build_heldout_corpus(root: str, n_speakers: int = 8, n_per_spk: int = 8,
                         seed: int = 999, dur_s: float = 3.2) -> tuple:
    """Held-out speakers with DISJOINT f0 bands and separated formants.

    Disjointness arithmetic: with band tolerance t (band = measured median
    * (1 +/- t)) and per-utterance wobble in [0, +5%], adjacent bands are
    disjoint iff the speaker spacing ratio r exceeds (1+t)/(1-t).  With
    t = 0.08 that bound is 1.174; we use r = 1.23 (8 speakers log-spaced
    75..320 Hz), comfortably disjoint and inside dominant_f0's 60..400 Hz
    search band.  (The round-4 corpus had r = 1.2 vs a +/-25% band —
    ratio 1.67 — guaranteeing overlap; VERDICT r4 'What's weak' #1.)
    """
    from megatts2_tpu.utils.audio import save_wav

    wavs = os.path.join(root, "wavs")
    tgs = os.path.join(root, "textgrids")
    ds = os.path.join(root, "ds")
    os.makedirs(ds, exist_ok=True)
    rng = np.random.RandomState(seed)
    n = int(dur_s * SR)
    t = np.arange(n) / SR
    seg = dur_s / len(WORDS)
    iv = "".join(
        f"""        intervals [{j+1}]:
            xmin = {j*seg}
            xmax = {(j+1)*seg}
            text = "{w}"
"""
        for j, w in enumerate(WORDS)
    )
    tg_body = (
        'File type = "ooTextFile"\nObject class = "TextGrid"\n'
        f"xmin = 0\nxmax = {dur_s}\ntiers? <exists>\nsize = 1\nitem []:\n"
        "    item [1]:\n"
        '        class = "IntervalTier"\n        name = "phones"\n'
        f"        xmin = 0\n        xmax = {dur_s}\n"
        f"        intervals: size = {len(WORDS)}\n" + iv
    )
    # F1 linear, F2 on a shuffled grid: adjacent-F1 speakers differ in F2
    f2_perm = [3, 7, 1, 5, 0, 4, 2, 6]
    speakers = {}
    for spk_i in range(n_speakers):
        spk = f"eval{spk_i:02d}"
        os.makedirs(os.path.join(wavs, spk), exist_ok=True)
        os.makedirs(os.path.join(tgs, spk), exist_ok=True)
        f0_base = 75.0 * 1.23 ** spk_i
        F1 = 320.0 + 70.0 * spk_i
        F2 = 1250.0 + 1650.0 * f2_perm[spk_i % 8] / 7.0

        def env(f, F1=F1, F2=F2):
            return (0.08 + np.exp(-((f - F1) ** 2) / (2 * 140.0 ** 2))
                    + 0.8 * np.exp(-((f - F2) ** 2) / (2 * 260.0 ** 2)))

        speakers[spk] = {"f0_base": f0_base, "F1": F1, "F2": F2}
        for i in range(n_per_spk):
            f0 = f0_base * (1 + 0.05 * rng.rand())
            n_harm = max(3, int(3800.0 / f0))
            # the fundamental gets an amplitude floor: when F1 sits far
            # from f0 the plain formant envelope leaves h=1 nearly silent
            # and the harmonic-product f0 estimator octave-errors (seen on
            # the F2=1250 speaker) — a strong fundamental is also the
            # realistic voiced-speech shape
            y = sum(
                (max(env(h * f0), 0.5 if h == 1 else 0.0) / np.sqrt(h))
                * np.sin(2 * np.pi * f0 * h * t + rng.rand() * 6.28)
                for h in range(1, n_harm + 1)
            )
            y *= 0.5 + 0.5 * np.sin(2 * np.pi * (2 + rng.rand()) * t) ** 2
            y = (y + 0.01 * rng.randn(n)).astype(np.float32)
            y /= np.abs(y).max() + 1e-6
            uid = f"{spk}_u{i}"
            save_wav(os.path.join(wavs, spk, uid + ".wav"), y)
            open(os.path.join(wavs, spk, uid + ".txt"), "w").write(" ".join(WORDS))
            open(os.path.join(tgs, spk, uid + ".TextGrid"), "w").write(tg_body)
    return wavs, tgs, ds, speakers


def prepare_heldout(root: str, gan_ckpt: str, gan_config: str,
                    train_ds: str) -> str:
    """Run the REAL user data path over the held-out corpus: stages 0+1
    (lab files, manifests, memmap feats, symbol table) and stage 2 (latents
    via the TRAINED generator) — afterwards resolve_prompt() works on it
    exactly as on a training dataset."""
    from megatts2_tpu.prepare_ds import main as prep_main

    wavs = os.path.join(root, "wavs")
    tgs = os.path.join(root, "textgrids")
    ds = os.path.join(root, "ds")
    if not os.path.exists(os.path.join(ds, "cuts_train.jsonl.gz")):
        prep_main(["--stage", "0", "--wavtxt_path", wavs, "--num_workers", "1"])
        prep_main(["--stage", "1", "--wavtxt_path", wavs, "--text_grid_path",
                   tgs, "--ds_path", ds, "--test_set_ratio", "0.0"])
    # the held-out corpus uses the same 6 words => identical sorted symbol
    # table; the trained models' phone ids must agree
    own = open(os.path.join(ds, "unique_text_tokens.k2symbols")).read()
    train = open(os.path.join(train_ds, "unique_text_tokens.k2symbols")).read()
    assert own == train, "held-out symbol table diverged from training's"
    if not os.path.isdir(os.path.join(ds, "latents")):
        prep_main(["--stage", "2", "--ds_path", ds,
                   "--generator_ckpt", gan_ckpt,
                   "--generator_config", gan_config])
    return ds


def _agg(xs):
    xs = [x for x in xs if np.isfinite(x)]
    if not xs:
        return {"mean": float("nan"), "std": float("nan"), "n": 0}
    return {"mean": round(float(np.mean(xs)), 3),
            "std": round(float(np.std(xs)), 3), "n": len(xs)}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--train_root", default="/tmp/pipe10k")
    ap.add_argument("--ckpt_root", default="/tmp/pipe10k/ckpts50k")
    ap.add_argument("--gan_config", default="/tmp/pipe10k/gan50k.yaml")
    ap.add_argument("--out", default="/tmp/heldout")
    ap.add_argument("--n_speakers", type=int, default=8)
    ap.add_argument("--n_seeds", type=int, default=3)
    ap.add_argument("--temperature", type=float, default=0.7)
    ap.add_argument("--top_k", type=int, default=32)
    ap.add_argument("--band_tol", type=float, default=0.08,
                    help="f0 band = measured median * (1 +/- tol); 0.08 is "
                         "disjoint at the 1.23 speaker spacing (see "
                         "build_heldout_corpus docstring)")
    ap.add_argument("--max_frames", type=int, default=512)
    ap.add_argument("--quant_int8", action="store_true")
    ap.add_argument("--skip_ceiling", action="store_true")
    ap.add_argument("--report", default=None, help="also write JSON here")
    args = ap.parse_args()

    from megatts2_tpu import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from megatts2_tpu.config import (
        load_adm_config,
        load_gan_config,
        load_plm_config,
        load_vocoder_config,
    )
    from megatts2_tpu.data import load_prompt_manifest, resolve_prompt
    from megatts2_tpu.models import Megatts
    from megatts2_tpu.ops import mel_spectrogram
    from megatts2_tpu.training.checkpoints import (
        best_checkpoint,
        load_generator_from_orbax,
        load_vocoder_from_orbax,
        restore_pytree,
    )
    from megatts2_tpu.utils.audio import load_wav

    t_start = time.time()
    root = args.out
    if not os.path.isdir(os.path.join(root, "wavs")):
        build_heldout_corpus(root, n_speakers=args.n_speakers)
    gan_ck = best_checkpoint(os.path.join(args.ckpt_root, "gan"))
    ds = prepare_heldout(root, gan_ck, args.gan_config,
                         os.path.join(args.train_root, "ds"))

    g_cfg, _, _ = load_gan_config(args.gan_config)
    plm_cfg, _ = load_plm_config(os.path.join(args.train_root, "plm.yaml"))
    adm_cfg, _ = load_adm_config(os.path.join(args.train_root, "adm.yaml"))
    voc_cfg, _, _ = load_vocoder_config(
        os.path.join(args.train_root, "vocoder.yaml"))

    g_vars = load_generator_from_orbax(gan_ck)
    plm_params = restore_pytree(
        best_checkpoint(os.path.join(args.ckpt_root, "plm")))["params"]
    adm_params = restore_pytree(
        best_checkpoint(os.path.join(args.ckpt_root, "adm")))["params"]
    voc_params = load_vocoder_from_orbax(
        best_checkpoint(os.path.join(args.ckpt_root, "vocoder")))

    def make_tts(temperature: float, seed: int):
        return Megatts(
            g_vars, plm_params, adm_params, voc_params,
            os.path.join(ds, "unique_text_tokens.k2symbols"),
            g_cfg=g_cfg, plm_cfg=plm_cfg, adm_cfg=adm_cfg, hifi_cfg=voc_cfg,
            max_frames=args.max_frames, dtype=jnp.bfloat16,
            quant_int8=args.quant_int8, plm_temperature=temperature,
            plm_top_k=args.top_k if temperature > 0 else 0, seed=seed,
        )

    # ---- per-speaker statistics from the held-out corpus itself ----
    speakers = sorted(
        os.path.basename(p) for p in glob.glob(os.path.join(root, "wavs", "*"))
        if os.path.isdir(p)
    )
    spk_wavs = {s: sorted(glob.glob(os.path.join(root, "wavs", s, "*.wav")))
                for s in speakers}
    spk_f0 = {s: float(np.median([f0_acf(load_wav(w)) for w in ws[:6]]))
              for s, ws in spk_wavs.items()}
    # assert the design property this corpus exists for: disjoint bands
    meds = sorted(spk_f0.values())
    for a, b in zip(meds, meds[1:]):
        assert a * (1 + args.band_tol) < b * (1 - args.band_tol), (
            f"eval bands overlap: {a:.1f} vs {b:.1f} at tol {args.band_tol}")

    def mean_cepstra(wav: np.ndarray) -> np.ndarray:
        mel = np.asarray(mel_spectrogram(jnp.asarray(wav)))
        return mfcc_from_mel(mel).mean(axis=0)

    spk_env = {s: np.mean([mean_cepstra(load_wav(w)) for w in ws[:6]], axis=0)
               for s, ws in spk_wavs.items()}

    manifest = load_prompt_manifest(ds)
    cut_by_spk = {}
    for c in manifest:
        cut_by_spk.setdefault(c.speaker, []).append(c)

    report = {
        "mode": "int8" if args.quant_int8 else "fp32",
        "train_root": args.train_root, "heldout_root": root,
        "design": {
            "n_speakers": len(speakers), "n_texts": len(TEXTS),
            "n_seeds": args.n_seeds, "temperature": args.temperature,
            "top_k": args.top_k, "band_tol": args.band_tol,
            "f0_spacing_ratio": 1.23,
            "bands_disjoint": True,  # asserted above
        },
        "speaker_f0_hz": {s: round(f, 1) for s, f in spk_f0.items()},
        "ckpts": {"gan": gan_ck},
    }

    # ---- ceiling: decode from GROUND-TRUTH codes+durations (no PLM/ADM);
    # isolates MRTE + VQ decode + mel decoder + vocoder ----
    from megatts2_tpu.data.datasets import LatentReader
    from megatts2_tpu.models import MegaG
    from megatts2_tpu.models.megatts import vocode

    if not args.skip_ceiling:
        reader = LatentReader(ds)
        g = MegaG(g_cfg, dtype=jnp.bfloat16)
        g_dev = jax.device_put(g_vars)

        def gt_decode(g_vars_, phone, mel_prompt, phone_len, p_code, dt, voc):
            tc = g.apply(
                g_vars_, phone, mel_prompt, phone_len,
                method=lambda m, p, mel, pl: m.mrte.tc_latent(p, mel, pl))
            from megatts2_tpu.ops import regulate_length

            tc_expand = regulate_length(tc, dt, args.max_frames)
            # RVQ.decode takes (n_q, B, T) — prepend the 1-quantizer axis
            zq = g.apply(g_vars_, p_code[None],
                         method=lambda m, c: m.vqpe.vq.decode(c))
            zq = jnp.repeat(zq, 8, axis=1)  # code rate -> frame rate
            T = tc_expand.shape[1]  # static frame budget
            if zq.shape[1] < T:
                zq = jnp.pad(zq, ((0, 0), (0, T - zq.shape[1]), (0, 0)))
            else:
                zq = zq[:, :T]
            mel_hat = g.apply(g_vars_, tc_expand, zq,
                              method=lambda m, a, b: m.decode_latents(a, b))
            return vocode(voc, voc_cfg, mel_hat.astype(jnp.float32), jnp.bfloat16)

        gt_decode_j = jax.jit(gt_decode)
        voc_dev = jax.device_put(voc_params)
        from megatts2_tpu.text.symbol_table import SymbolTable

        st = SymbolTable.from_file(
            os.path.join(ds, "unique_text_tokens.k2symbols"))
        token2idx = {s: i for i, s in enumerate(st.symbols)}
        ceil_rows = []
        for spk in speakers:
            # ground-truth codes of the SAME utterance the MCD reference
            # uses (the last wav, held out of the prompt set)
            ref_uid = os.path.splitext(
                os.path.basename(spk_wavs[spk][-1]))[0]
            cut = next(c for c in cut_by_spk[spk] if c.id == ref_uid)
            lat = reader.read(cut)
            p_code = np.asarray(lat["p_code"]).reshape(1, -1).astype(np.int32)
            dt = np.asarray(cut.duration_tokens, np.int32)[None]
            ids = np.array([token2idx[p] for p in cut.phone_tokens
                            if not (p in ("_", "-") and p not in token2idx)],
                           np.int32)[None]
            dt = dt[:, : ids.shape[1]]
            # 2 prompt utts = 400 frames, inside the 512-frame timbre
            # window the GAN trained with (max_timbre_frames=512)
            prompt_mels = np.concatenate(
                [np.asarray(mel_spectrogram(jnp.asarray(load_wav(w))))
                 for w in spk_wavs[spk][:2]], axis=0)[None]
            wav = np.asarray(gt_decode_j(
                g_dev, jnp.asarray(ids), jnp.asarray(prompt_mels),
                jnp.asarray([ids.shape[1]]), jnp.asarray(p_code),
                jnp.asarray(dt), voc_dev))[0]
            n = int(dt.sum()) * 256
            wav = wav[:n]
            f0 = f0_acf(wav)
            lo, hi = spk_f0[spk] * (1 - args.band_tol), spk_f0[spk] * (1 + args.band_tol)
            pred = min(spk_env, key=lambda s: float(
                np.linalg.norm(spk_env[s] - mean_cepstra(wav))))
            ref = load_wav(spk_wavs[spk][-1])
            mcd = dtw_mcd(
                mfcc_from_mel(np.asarray(mel_spectrogram(jnp.asarray(ref)))),
                mfcc_from_mel(np.asarray(mel_spectrogram(jnp.asarray(wav)))))
            ceil_rows.append({"spk": spk, "f0": round(f0, 1),
                              "in_band": bool(lo <= f0 <= hi),
                              "classified_as": pred, "mcd_db": round(mcd, 2)})
        report["ceiling_gt_codes"] = {
            "rows": ceil_rows,
            "in_band_frac": round(
                np.mean([r["in_band"] for r in ceil_rows]), 3),
            "classification_acc": round(
                np.mean([r["classified_as"] == r["spk"] for r in ceil_rows]), 3),
            "mcd_db": _agg([r["mcd_db"] for r in ceil_rows]),
        }
        print(json.dumps({"phase": "ceiling",
                          **report["ceiling_gt_codes"]}), flush=True)

    # ---- the main grid: speakers x texts x (greedy + n_seeds sampled) ----
    out_dir = os.path.join(root, "gen_" + report["mode"])
    os.makedirs(out_dir, exist_ok=True)
    tts_greedy = make_tts(0.0, 0)
    tts_sampled = make_tts(args.temperature, 12345)

    rows = []
    dur_maes = []
    from megatts2_tpu.models import MegaG as _MegaG
    from megatts2_tpu.models.adm import adm_infer

    _g = _MegaG(g_cfg, dtype=jnp.bfloat16)
    # jitted (params as ARGS — closures over params break the remote
    # compiler on size); eager MRTE apply would pay ~75 ms/op through the
    # tunnel per speaker
    tc_fn = jax.jit(lambda v, p, mel, pl: _g.apply(
        v, p, mel, pl, method=lambda m, a, b, c: m.mrte.tc_latent(a, b, c)))
    for spk in speakers:
        lo, hi = spk_f0[spk] * (1 - args.band_tol), spk_f0[spk] * (1 + args.band_tol)
        pdir = os.path.join(out_dir, f"prompt_{spk}")
        os.makedirs(pdir, exist_ok=True)
        # 2 mel-prompt utts (400 frames <= the 512-frame timbre window the
        # GAN trained with); the prosody prompt uses u0..u2 explicitly so
        # the MCD reference (u_last) stays held out of every prompt
        prompt_wavs = spk_wavs[spk][:2]
        for w in prompt_wavs:
            dst = os.path.join(pdir, os.path.basename(w))
            if not os.path.exists(dst):
                shutil.copy(w, dst)
        prompt_len = load_wav(prompt_wavs[0]).shape[0]
        pf = resolve_prompt(ds, cut_ids=[f"{spk}_u{i}" for i in range(3)],
                            manifest=manifest)
        ref = load_wav(spk_wavs[spk][-1])
        c_ref = mfcc_from_mel(np.asarray(mel_spectrogram(jnp.asarray(ref))))

        # duration MAE (deterministic; once per speaker on corpus phones)
        cut = cut_by_spk[spk][0]
        ids = np.array([tts_greedy.token2idx[p] for p in cut.phone_tokens
                        if not (p in ("_", "-") and p not in tts_greedy.token2idx)],
                       np.int32)
        mels = [np.asarray(mel_spectrogram(jnp.asarray(load_wav(w))))
                for w in prompt_wavs]
        mel_prompt = np.concatenate(mels, axis=0)[None]
        tc = tc_fn(tts_greedy.g_vars, jnp.asarray(ids[None]),
                   jnp.asarray(mel_prompt), jnp.asarray([ids.size]))
        dt = np.asarray(adm_infer(tts_greedy.adm_params, adm_cfg,
                                  tc.astype(jnp.float32), dtype=jnp.bfloat16)
                        )[0, : ids.size]
        true_dt = np.asarray(cut.duration_tokens[: ids.size], np.float64)
        dur_maes.append(float(np.abs(dt[: true_dt.size] - true_dt).mean()))

        for ti, text in enumerate(TEXTS):
            for mode_i in range(1 + args.n_seeds):  # 0 = greedy
                sampled = mode_i > 0
                tts = tts_sampled if sampled else tts_greedy
                tag = f"{spk}_t{ti}_{'s%d' % mode_i if sampled else 'greedy'}"
                full = tts(pdir, text,
                           out_path=os.path.join(out_dir, f"gen_{tag}.wav"),
                           prompt_features=pf)
                gen = full[prompt_len:]
                f0 = f0_acf(gen)
                c_gen = mfcc_from_mel(
                    np.asarray(mel_spectrogram(jnp.asarray(gen))))
                pred = min(spk_env, key=lambda s: float(
                    np.linalg.norm(spk_env[s] - c_gen.mean(axis=0))))
                mcd = dtw_mcd(c_ref, c_gen) if c_gen.shape[0] > 8 else float("nan")
                rows.append({
                    "spk": spk, "text": ti,
                    "decode": "sampled" if sampled else "greedy",
                    "f0": round(f0, 1), "in_band": bool(lo <= f0 <= hi),
                    "classified": pred == spk, "classified_as": pred,
                    "mcd_db": round(mcd, 2),
                })
        done = [r for r in rows if r["spk"] == spk]
        print(json.dumps({
            "phase": "speaker_done", "spk": spk,
            "in_band": round(np.mean([r["in_band"] for r in done]), 3),
            "cls": round(np.mean([r["classified"] for r in done]), 3),
            "elapsed_s": round(time.time() - t_start, 1),
        }), flush=True)

    for decode in ("greedy", "sampled"):
        sel = [r for r in rows if r["decode"] == decode]
        per_spk_cls = [np.mean([r["classified"] for r in sel if r["spk"] == s])
                       for s in speakers]
        per_spk_band = [np.mean([r["in_band"] for r in sel if r["spk"] == s])
                        for s in speakers]
        report[decode] = {
            "n_decodes": len(sel),
            "envelope_classification": _agg(per_spk_cls),
            "prompted_f0_in_band": _agg(per_spk_band),
            "mcd_db": _agg([r["mcd_db"] for r in sel]),
        }
    report["duration_mae_frames"] = _agg(dur_maes)
    report["rows"] = rows
    report["wall_s"] = round(time.time() - t_start, 1)
    line = json.dumps(report)
    print(line, flush=True)
    if args.report:
        with open(args.report, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
