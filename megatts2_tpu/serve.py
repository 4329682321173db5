"""Batch-synthesis serving CLI.

Production driver for throughput synthesis (the v5e-8 layout: utterances
sharded over the mesh's data axis, per-chip KV caches).  Reads a JSONL
manifest of requests, groups them into fixed-size batches per prompt, runs
the jitted cascade, writes wavs, and reports throughput.

    python -m megatts2_tpu.serve --requests reqs.jsonl --out_dir out/ \
        --g_ckpt ... --plm_ckpt ... --adm_ckpt ... --symbol_table ...

Request line: {"id": "u1", "text": "...", "wavs_dir": "prompts/spk1"}
(requests with the same wavs_dir share the prompt-mel computation).
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import time
from collections import defaultdict

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="megatts2_tpu batch serving")
    p.add_argument("--requests", required=True, help="JSONL of {id, text, wavs_dir}")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--max_frames", type=int, default=1024)
    p.add_argument("--n_model", type=int, default=1)
    p.add_argument("--g_ckpt", default=None)
    p.add_argument("--g_config", default="configs/config_gan.yaml")
    p.add_argument("--plm_ckpt", default=None)
    p.add_argument("--plm_config", default="configs/config_plm.yaml")
    p.add_argument("--adm_ckpt", default=None)
    p.add_argument("--adm_config", default="configs/config_adm.yaml")
    p.add_argument("--hifigan_ckpt", default=None)
    p.add_argument("--symbol_table", default="data/ds/unique_text_tokens.k2symbols")
    p.add_argument("--pinyin_dict", default=None)
    return p.parse_args(argv)


def main(argv=None):
    from . import HIFIGAN_SR, enable_compilation_cache

    enable_compilation_cache()
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp

    from .models import megatts_from_pretrained
    from .ops import mel_spectrogram
    from .parallel import make_mesh
    from .utils.audio import load_wav, peak_normalize, save_wav

    if not (args.g_ckpt and args.plm_ckpt and args.adm_ckpt):
        raise SystemExit("serving requires --g_ckpt/--plm_ckpt/--adm_ckpt")
    tts = megatts_from_pretrained(
        args.g_ckpt, args.g_config, args.plm_ckpt, args.plm_config,
        args.adm_ckpt, args.adm_config, args.symbol_table,
        hifigan_ckpt=args.hifigan_ckpt, pinyin_dict_path=args.pinyin_dict,
        max_frames=args.max_frames,
    )
    mesh = make_mesh(n_model=args.n_model)
    os.makedirs(args.out_dir, exist_ok=True)

    requests = [json.loads(l) for l in open(args.requests) if l.strip()]
    by_prompt = defaultdict(list)
    for r in requests:
        by_prompt[r["wavs_dir"]].append(r)

    t0 = time.time()
    done = 0
    audio_s = 0.0
    for wavs_dir, reqs in by_prompt.items():
        mels = []
        for w in sorted(glob.glob(os.path.join(wavs_dir, "*.wav"))):
            y = peak_normalize(load_wav(w, HIFIGAN_SR))
            mels.append(np.asarray(mel_spectrogram(jnp.asarray(y))))
        mel_prompt = np.concatenate(mels, axis=0)
        for i in range(0, len(reqs), args.batch_size):
            chunk = reqs[i : i + args.batch_size]
            # pad the final chunk so the jit shape stays fixed
            pad = args.batch_size - len(chunk)
            texts = [r["text"] for r in chunk] + [chunk[-1]["text"]] * pad
            prompts = np.broadcast_to(
                mel_prompt[None], (len(texts),) + mel_prompt.shape
            )
            wavs = tts.synthesize_batch(texts, prompts, mesh=mesh)
            for r, wav in zip(chunk, wavs):
                save_wav(os.path.join(args.out_dir, f"{r['id']}.wav"), wav)
                audio_s += wav.shape[0] / HIFIGAN_SR
                done += 1
    dt = time.time() - t0
    print(
        json.dumps(
            {
                "requests": done,
                "wall_s": round(dt, 2),
                "utt_per_sec": round(done / dt, 2),
                "audio_s": round(audio_s, 1),
                "rtf": round(dt / max(audio_s, 1e-9), 4),
            }
        )
    )


if __name__ == "__main__":
    main()
