"""Inference CLI — zero-shot synthesis from prompt wavs + text.

Replaces the reference's hardcoded ``infer.py`` (ctor paths + a fixed test
sentence, ``infer.py:3-19``) with argparse, while keeping the same
``Megatts(...)(wavs_dir, text)`` call shape.  Accepts reference Lightning
checkpoints (.ckpt, converted on the fly) for G/PLM/ADM and an optional
HiFi-GAN torch checkpoint; missing checkpoints fall back to random init
(useful for smoke runs).
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="megatts2_tpu zero-shot TTS")
    p.add_argument("--wavs_dir", required=True, help="dir with prompt *.wav files")
    p.add_argument("--text", required=True)
    p.add_argument("--out", default="test.wav")
    p.add_argument("--g_ckpt", default=None)
    p.add_argument("--g_config", default="configs/config_gan.yaml")
    p.add_argument("--plm_ckpt", default=None)
    p.add_argument("--plm_config", default="configs/config_plm.yaml")
    p.add_argument("--adm_ckpt", default=None)
    p.add_argument("--adm_config", default="configs/config_adm.yaml")
    p.add_argument("--hifigan_ckpt", default=None)
    p.add_argument("--vocoder", choices=["hifigan", "vocos"], default="hifigan",
                   help="vocos = the fast iSTFT vocoder family "
                        "(models/vocos.py; train with the cli 'vocoder' stage)")
    p.add_argument("--vocoder_ckpt", default=None,
                   help="orbax checkpoint dir from the vocoder training "
                        "stage (overrides --hifigan_ckpt)")
    p.add_argument("--vocoder_config", default="configs/config_vocoder.yaml",
                   help="config the vocoder stage was trained with "
                        "(used when --vocoder vocos)")
    p.add_argument("--symbol_table", default="data/ds/unique_text_tokens.k2symbols")
    p.add_argument("--pinyin_dict", default=None)
    p.add_argument("--max_frames", type=int, default=2048)
    p.add_argument("--dtype", choices=["bfloat16", "float32"], default="bfloat16")
    p.add_argument("--quant_int8", action="store_true",
                   help="int8 weight-only PLM decode (see PARITY.md)")
    p.add_argument("--plm_temperature", type=float, default=0.0,
                   help=">0: sample prosody codes instead of greedy argmax")
    p.add_argument("--plm_top_k", type=int, default=0,
                   help="truncate sampling to the k most likely codes")
    p.add_argument("--seed", type=int, default=0, help="sampling seed")
    p.add_argument("--plm_prompt_ds", default=None,
                   help="prepare_ds root with stage-2 latents/ — enables "
                        "in-context prosody prompting (the same-speaker "
                        "prompt prefix the PLM is trained with, reference "
                        "modules/datamodule.py:186-211)")
    p.add_argument("--plm_prompt_cuts", default=None,
                   help="comma-separated cut ids to use as the prosody "
                        "prompt (default: first --plm_prompt_n cuts of "
                        "--plm_prompt_speaker)")
    p.add_argument("--plm_prompt_speaker", default=None,
                   help="speaker whose utterances form the prosody prompt")
    p.add_argument("--plm_prompt_n", type=int, default=3,
                   help="number of speaker utterances in the prompt")
    p.add_argument("--plm_prompt_max_tokens", type=int, default=2048)
    return p.parse_args(argv)


def main(argv=None):
    from . import enable_compilation_cache

    enable_compilation_cache()
    args = parse_args(argv)
    from .config import load_adm_config, load_gan_config, load_plm_config
    from .models import MegaADM, MegaG, MegaPLM, Megatts
    from .training.convert import (
        convert_adm,
        convert_megag,
        convert_plm,
        load_torch_state_dict,
    )

    g_cfg, _, _ = load_gan_config(args.g_config)
    plm_cfg, _ = load_plm_config(args.plm_config)
    adm_cfg, _ = load_adm_config(args.adm_config)
    key = jax.random.PRNGKey(0)

    if args.g_ckpt:
        g_vars = convert_megag(load_torch_state_dict(args.g_ckpt, prefix="G."), g_cfg)
    else:
        v = jax.jit(MegaG(g_cfg).init)(
            {"params": key, "vq": key},
            jnp.ones((1, 8), jnp.int32), jnp.zeros((1, 8), jnp.int32),
            jnp.asarray([8]), jnp.zeros((1, 64, 80)), jnp.zeros((1, 64, 80)),
        )
        g_vars = {"params": v["params"], "vq_stats": v["vq_stats"]}

    if args.plm_ckpt:
        plm_params = convert_plm(load_torch_state_dict(args.plm_ckpt, prefix="plm."), plm_cfg)
    else:
        plm_params = jax.jit(MegaPLM(plm_cfg).init)(
            key, jnp.zeros((1, 4, plm_cfg.tc_latent_dim)),
            jnp.zeros((1, 5), jnp.int32), jnp.asarray([4]),
        )["params"]

    if args.adm_ckpt:
        adm_params = convert_adm(load_torch_state_dict(args.adm_ckpt, prefix="adm."), adm_cfg)
    else:
        adm_params = jax.jit(MegaADM(adm_cfg).init)(
            key, jnp.zeros((1, 4, adm_cfg.tc_latent_dim)),
            jnp.zeros((1, 5, 1)), jnp.asarray([4]),
        )["params"]

    # Shared loader handles both families + config-from-training-yaml
    # (a HiFi-GAN trained via the 'vocoder' stage with non-default
    # init_args must be rebuilt with the same config — advisor r2).
    from .models.pretrained import vocoder_from_pretrained

    hifi_cfg, hifi_params = vocoder_from_pretrained(
        args.vocoder, args.vocoder_ckpt, args.hifigan_ckpt, args.vocoder_config
    )

    tts = Megatts(
        g_vars=g_vars, plm_params=plm_params, adm_params=adm_params,
        hifi_params=hifi_params, symbol_table=args.symbol_table,
        g_cfg=g_cfg, plm_cfg=plm_cfg, adm_cfg=adm_cfg, hifi_cfg=hifi_cfg,
        pinyin_dict_path=args.pinyin_dict, max_frames=args.max_frames,
        dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32,
        quant_int8=args.quant_int8, plm_temperature=args.plm_temperature,
        plm_top_k=args.plm_top_k, seed=args.seed,
    )
    pf = None
    if args.plm_prompt_ds:
        from .data import resolve_prompt

        pf = resolve_prompt(
            args.plm_prompt_ds,
            cut_ids=args.plm_prompt_cuts.split(",") if args.plm_prompt_cuts else None,
            speaker=args.plm_prompt_speaker,
            n=args.plm_prompt_n,
            max_tokens=args.plm_prompt_max_tokens,
        )
    wav = tts(args.wavs_dir, args.text, out_path=args.out, prompt_features=pf)
    print(f"wrote {args.out}: {wav.shape[0] / 16000:.2f}s")


if __name__ == "__main__":
    main()
