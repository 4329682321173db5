#!/usr/bin/env python
"""Numerical-parity harness vs the PyTorch reference (BASELINE.json:
"mel-L1 parity within numerical tolerance").

The reference's python environment (torch+speechbrain+lhotse) can't run
here, so parity is checked against ARTIFACTS exported from it:

  mode "mel":   compare our mel extraction on a wav against a saved
                reference mel (.npy, shape (T, 80), from
                extract_mel_spec(y).T in the reference env)
  mode "megag": load a reference generator .ckpt, run our converted MegaG
                on inputs saved from the reference (npz with
                duration_tokens, phone_tokens, tokens_lens, mel_timbres,
                mel_targets, mel_hat) and report mel-L1 vs its mel_hat

Usage:
  python tools/parity_harness.py mel --wav a.wav --ref_mel a_mel.npy
  python tools/parity_harness.py megag --ckpt generator.ckpt \
      --config configs/config_gan.yaml --batch ref_batch.npz
"""
import argparse
import json
import sys

import numpy as np


def run_mel(args) -> dict:
    import jax.numpy as jnp

    from megatts2_tpu.ops import mel_spectrogram
    from megatts2_tpu.utils.audio import load_wav, peak_normalize

    y = peak_normalize(load_wav(args.wav, 16000))
    ours = np.asarray(mel_spectrogram(jnp.asarray(y)))
    ref = np.load(args.ref_mel)
    T = min(ours.shape[0], ref.shape[0])
    ours, ref = ours[:T], ref[:T]
    return {
        "metric": "mel_l1",
        "value": float(np.abs(ours - ref).mean()),
        "max_abs": float(np.abs(ours - ref).max()),
        "frames": T,
    }


def run_megag(args) -> dict:
    import jax.numpy as jnp

    from megatts2_tpu.models import MegaG, megag_from_pretrained

    g_cfg, g_vars = megag_from_pretrained(args.ckpt, args.config)
    b = np.load(args.batch)
    mel_hat, _, _ = MegaG(g_cfg).apply(
        g_vars,
        jnp.asarray(b["duration_tokens"]),
        jnp.asarray(b["phone_tokens"]),
        jnp.asarray(b["tokens_lens"]),
        jnp.asarray(b["mel_timbres"]),
        jnp.asarray(b["mel_targets"]),
        train=False,
    )
    ours = np.asarray(mel_hat)
    ref = np.asarray(b["mel_hat"])
    return {
        "metric": "megag_mel_l1",
        "value": float(np.abs(ours - ref).mean()),
        "max_abs": float(np.abs(ours - ref).max()),
        "recon_l1_ours": float(np.abs(ours - b["mel_targets"]).mean()),
        "recon_l1_ref": float(np.abs(ref - b["mel_targets"]).mean()),
    }


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="mode", required=True)
    pm = sub.add_parser("mel")
    pm.add_argument("--wav", required=True)
    pm.add_argument("--ref_mel", required=True)
    pg = sub.add_parser("megag")
    pg.add_argument("--ckpt", required=True)
    pg.add_argument("--config", required=True)
    pg.add_argument("--batch", required=True)
    args = p.parse_args(argv)
    out = run_mel(args) if args.mode == "mel" else run_megag(args)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
