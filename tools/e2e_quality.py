"""End-to-end quality drive on a FULLY self-trained stack.

Takes the checkpoint root of a ``tools/train_curve.py --stages
gan,vocoder,plm,adm`` run (every component — VQ-GAN, duration model,
prosody LM, Vocos vocoder — trained from scratch in-repo on the synthetic
2-speaker corpus; zero external weights) and runs zero-shot synthesis
through the real ``Megatts`` surface with prompts from each speaker.

Objective check: the corpus speakers occupy disjoint f0 bands
(spkA ≈ 110–143 Hz, spkB ≈ 220–286 Hz — train_curve.build_corpus), so
zero-shot timbre transfer is measurable: the dominant f0 of the
*generated* audio must land in the prompt speaker's band for BOTH
speakers.  Prints one JSON line with the measured f0s and the verdict.

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
    """FFT-peak fundamental estimate within [lo, hi] Hz."""
    y = np.asarray(y, np.float64)
    if y.size < sr // 4:
        return 0.0
    spec = np.abs(np.fft.rfft(y * np.hanning(y.size)))
    freqs = np.fft.rfftfreq(y.size, 1.0 / sr)
    band = (freqs >= lo) & (freqs <= hi)
    return float(freqs[band][np.argmax(spec[band])])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True, help="train_curve --root dir")
    ap.add_argument("--out_dir", default=None)
    ap.add_argument("--text", default="hello world nice day")
    ap.add_argument("--max_frames", type=int, default=512)
    args = ap.parse_args()

    from megatts2_tpu import enable_compilation_cache

    enable_compilation_cache()

    import jax.numpy as jnp

    from megatts2_tpu.config import load_gan_config, load_plm_config, load_adm_config, load_vocoder_config
    from megatts2_tpu.models import Megatts
    from megatts2_tpu.training.checkpoints import (
        best_checkpoint,
        load_generator_from_orbax,
        load_vocoder_from_orbax,
        restore_pytree,
    )

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
    )

    # speaker f0 bands of the synthetic corpus (train_curve.build_corpus)
    bands = {"spkA": (95.0, 160.0), "spkB": (200.0, 310.0)}
    report = {"root": root, "text": args.text}
    ok = True
    for spk, (lo, hi) in bands.items():
        wavs = sorted(glob.glob(os.path.join(root, "wavs", spk, "*.wav")))[:3]
        pdir = os.path.join(out_dir, f"prompt_{spk}")
        os.makedirs(pdir, exist_ok=True)
        import shutil

        for w in wavs:
            dst = os.path.join(pdir, os.path.basename(w))
            if not os.path.exists(dst):
                shutil.copy(w, dst)
        out_path = os.path.join(out_dir, f"gen_{spk}.wav")
        full = tts(pdir, args.text, out_path=out_path)
        # measure the GENERATED tail only (the prompt is prepended)
        from megatts2_tpu.utils.audio import load_wav

        prompt_len = load_wav(wavs[0]).shape[0]
        gen = full[prompt_len:]
        f0 = dominant_f0(gen)
        in_band = lo <= f0 <= hi
        ok = ok and in_band
        report[spk] = {
            "prompt_band_hz": [lo, hi],
            "generated_f0_hz": round(f0, 1),
            "generated_s": round(gen.shape[0] / 16000, 2),
            "in_band": bool(in_band),
            "wav": out_path,
        }

        # in-context prosody prompting (the PLM's training-time same-speaker
        # prefix, wired through the product surface): prompted decode must
        # (a) still land in the speaker's band, (b) actually change the
        # prosody-code trajectory vs the BOS-only decode
        from megatts2_tpu.data import resolve_prompt

        pf = resolve_prompt(ds, speaker=spk, n=3)
        out_p = os.path.join(out_dir, f"gen_{spk}_prompted.wav")
        full_p = tts(pdir, args.text, out_path=out_p, prompt_features=pf)
        gen_p = full_p[prompt_len:]
        f0_p = dominant_f0(gen_p)
        in_band_p = lo <= f0_p <= hi
        ok = ok and in_band_p
        n = min(gen.shape[0], gen_p.shape[0])
        differs = not np.allclose(gen[:n], gen_p[:n])
        report[spk]["prompted"] = {
            "prompt_tokens": int(pf[1].shape[1]),
            "generated_f0_hz": round(f0_p, 1),
            "in_band": bool(in_band_p),
            "differs_from_bos_decode": bool(differs),
            "wav": out_p,
        }
    report["timbre_transfer_ok"] = bool(ok)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
