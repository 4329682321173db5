"""Quality signal: train the FULL-SIZE GAN stage on a synthetic corpus and
record the val loss_re curve (VERDICT r1 #10; the reference's only
quantitative artifact is loss_re 0.4771 @ 400k on LibriTTS,
examples/mel_step_400k_re_loss_0.4771.png).

Builds a structured 2-speaker corpus (harmonic tones + AM, per-utterance
f0 so mels are learnable), runs prepare_ds stages 0+1, then
``cli.py fit`` with the reference-size config for ``--steps`` steps on the
available device, and prints the train/val loss_re trajectory.

    python tools/train_curve.py --steps 2000   # TPU, run in background
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, ".")

import numpy as np


def build_corpus(root: str, n_per_spk: int = 24, seed: int = 0) -> tuple:
    from megatts2_tpu.utils.audio import save_wav

    wavs = os.path.join(root, "wavs")
    tgs = os.path.join(root, "textgrids")
    ds = os.path.join(root, "ds")
    os.makedirs(ds, exist_ok=True)
    words = ["hello", "world", "nice", "day", "of", "speech"]
    rng = np.random.RandomState(seed)
    sr = 16000
    for spk_i, spk in enumerate(("spkA", "spkB")):
        os.makedirs(os.path.join(wavs, spk), exist_ok=True)
        os.makedirs(os.path.join(tgs, spk), exist_ok=True)
        for i in range(n_per_spk):
            # constant duration → ONE batch shape → one jit compile (variable
            # shapes would each pay minutes on the remote compiler)
            dur_s = 3.2
            n = int(dur_s * sr)
            t = np.arange(n) / sr
            f0 = 110 * (spk_i + 1) * (1 + 0.3 * rng.rand())
            # harmonic stack with per-word AM envelope: learnable structure
            y = sum(
                (0.4 / h) * np.sin(2 * np.pi * f0 * h * t + rng.rand() * 6.28)
                for h in range(1, 6)
            )
            y *= 0.5 + 0.5 * np.sin(2 * np.pi * (2 + rng.rand()) * t) ** 2
            y = (y + 0.01 * rng.randn(n)).astype(np.float32)
            y /= np.abs(y).max() + 1e-6
            uid = f"{spk}_u{i}"
            save_wav(os.path.join(wavs, spk, uid + ".wav"), y)
            open(os.path.join(wavs, spk, uid + ".txt"), "w").write(" ".join(words))
            seg = dur_s / len(words)
            iv = "".join(
                f"""        intervals [{j+1}]:
            xmin = {j*seg}
            xmax = {(j+1)*seg}
            text = "{w}"
"""
                for j, w in enumerate(words)
            )
            open(os.path.join(tgs, spk, uid + ".TextGrid"), "w").write(
                'File type = "ooTextFile"\nObject class = "TextGrid"\n'
                f"xmin = 0\nxmax = {dur_s}\ntiers? <exists>\nsize = 1\nitem []:\n"
                "    item [1]:\n"
                '        class = "IntervalTier"\n        name = "phones"\n'
                f"        xmin = 0\n        xmax = {dur_s}\n"
                f"        intervals: size = {len(words)}\n" + iv
            )
    return wavs, tgs, ds


def _curve(log_dir: str, name: str, keys: tuple) -> dict:
    path = os.path.join(log_dir, f"{name}_metrics.jsonl")
    rows = [json.loads(l) for l in open(path)]
    out = {}
    for k in keys:
        out[k] = [(r["step"], round(r[k], 4)) for r in rows if k in r]
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000, help="GAN steps")
    ap.add_argument("--lm_steps", type=int, default=0,
                    help="PLM/ADM steps (0 = GAN only)")
    ap.add_argument("--stages", default="gan",
                    help="comma list from {gan,plm,adm,vocoder}; plm/adm run "
                         "stage-2 extraction off the trained GAN ckpt")
    ap.add_argument("--val_every", type=int, default=200)
    ap.add_argument("--n_per_spk", type=int, default=24)
    ap.add_argument("--n_speakers", type=int, default=2,
                    help=">2 uses the scaled corpus generator "
                         "(tools/bench_input_pipeline.py, log-spread f0s)")
    ap.add_argument("--root", default=None)
    args = ap.parse_args()
    stages = args.stages.split(",")

    root = args.root or tempfile.mkdtemp(prefix="megatts_curve_")
    if args.n_speakers != 2:
        from tools.bench_input_pipeline import build_corpus as build_scaled

        wavs, tgs, ds = build_scaled(root, args.n_speakers, args.n_per_spk)
    else:
        wavs, tgs, ds = build_corpus(root, args.n_per_spk)

    from megatts2_tpu.prepare_ds import main as prep_main

    prep_main(["--stage", "0", "--wavtxt_path", wavs, "--num_workers", "2"])
    prep_main(["--stage", "1", "--wavtxt_path", wavs, "--text_grid_path", tgs,
               "--ds_path", ds, "--test_set_ratio", "0.125"])

    import yaml

    from megatts2_tpu.cli import main as cli_main

    log_dir = os.path.join(root, "logs")
    report = {"corpus": root, "steps": args.steps}

    def fit(stage: str, steps: int, data_overrides: dict):
        with open(f"configs/config_{'gan' if stage == 'gan' else stage}.yaml") as f:
            cfg = yaml.safe_load(f)
        cfg["trainer"] = {
            "max_steps": steps,
            "log_every_n_steps": 50,
            "val_check_interval": args.val_every,
        }
        cfg.setdefault("data", {}).update(
            {"ds_path": ds + "/", "min_duration": 1.0, **data_overrides}
        )
        cfg_path = os.path.join(root, f"{stage}.yaml")
        with open(cfg_path, "w") as f:
            yaml.safe_dump(cfg, f)
        cli_main(["fit", "-c", cfg_path, "--stage", stage,
                  "--log_dir", log_dir,
                  "--ckpt_dir", os.path.join(root, "ckpts", stage)])

    if "gan" in stages:
        # reference-size GAN config (configs/config_gan.yaml) on this corpus.
        # max_timbre_frames=512 dodges the remote-compiler int32-overflow
        # CHECK the 2048-frame timbre bucket trips on this target (the
        # compile HANGS/aborts mid-run once a ≥10-cut concat first appears)
        fit("gan", args.steps, {"max_duration_batch": 40,
                                "max_timbre_frames": 512})
        report["gan"] = _curve(log_dir, "gan", ("train/G_loss_re", "val/loss_re"))

    if "vocoder" in stages:
        # vocoder GAN stage (Vocos by default) on the same corpus: the
        # manifests carry wav_path, so no GAN checkpoint is needed
        fit("vocoder", args.lm_steps or args.steps, {"batch_size": 8})
        report["vocoder"] = _curve(
            log_dir, "vocoder",
            ("train/G_loss_mel", "train/D_loss_total", "val/loss"),
        )

    if "plm" in stages or "adm" in stages:
        from megatts2_tpu.training.checkpoints import latest_checkpoint

        ck = latest_checkpoint(os.path.join(root, "ckpts", "gan"))
        assert ck, "PLM/ADM curves need a trained GAN checkpoint (run gan first)"
        prep_main(["--stage", "2", "--ds_path", ds,
                   "--generator_ckpt", ck,
                   "--generator_config", os.path.join(root, "gan.yaml")])
        lm_steps = args.lm_steps or args.steps
        if "plm" in stages:
            fit("plm", lm_steps, {"max_n_cuts": 4})
            report["plm"] = _curve(
                log_dir, "plm", ("train/loss", "val/loss", "val/ac10")
            )
        if "adm" in stages:
            fit("adm", lm_steps, {"max_duration_batch": 200})
            report["adm"] = _curve(log_dir, "adm", ("train/loss", "val/loss"))

    print(json.dumps(report))


if __name__ == "__main__":
    main()
