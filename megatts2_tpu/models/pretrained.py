"""``from_pretrained``-style loaders, mirroring the reference API surface
(``MegaG.from_pretrained(ckpt, config)`` etc., models/megatts2.py:86-117,
183-198, 277-292).  Each accepts EITHER a reference Lightning torch
checkpoint (``.ckpt``/``.pt``/``.pth`` — converted via training/convert.py,
prefixes ``G.``/``plm.``/``adm.`` stripped) OR an orbax checkpoint directory
produced by this framework's trainers.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

from ..config import (
    HiFiGANConfig,
    MegaADMConfig,
    MegaGConfig,
    MegaPLMConfig,
    load_adm_config,
    load_gan_config,
    load_plm_config,
)


def _is_torch(path: str) -> bool:
    return path.endswith((".ckpt", ".pt", ".pth"))


def megag_from_pretrained(ckpt: str, config: str) -> Tuple[MegaGConfig, dict]:
    """→ (cfg, variables {'params','vq_stats'}) for MegaG.apply."""
    g_cfg, _, _ = load_gan_config(config)
    if _is_torch(ckpt):
        from ..training.convert import convert_megag, load_torch_state_dict

        return g_cfg, convert_megag(load_torch_state_dict(ckpt, prefix="G."), g_cfg)
    from ..training.checkpoints import load_generator_from_orbax

    return g_cfg, load_generator_from_orbax(ckpt)


def discriminator_from_pretrained(ckpt: str, config: str):
    """→ (cfg, {'params','batch_stats'}) from a reference GAN Lightning
    checkpoint ('D.'-prefixed keys) — lets GAN training resume with the
    reference discriminator, not a fresh one."""
    _, d_cfg, _ = load_gan_config(config)
    from ..training.convert import convert_discriminator, load_torch_state_dict

    return d_cfg, convert_discriminator(load_torch_state_dict(ckpt, prefix="D."), d_cfg)


def _lm_from_orbax(ckpt: str) -> dict:
    from ..training.checkpoints import latest_checkpoint, restore_pytree
    import os

    if not os.path.basename(ckpt).startswith("step_"):
        latest = latest_checkpoint(ckpt)
        if latest is None:
            raise FileNotFoundError(f"no step_* checkpoints under {ckpt}")
        ckpt = latest
    return restore_pytree(ckpt)["params"]


def plm_from_pretrained(ckpt: str, config: str) -> Tuple[MegaPLMConfig, dict]:
    cfg, _ = load_plm_config(config)
    if _is_torch(ckpt):
        from ..training.convert import convert_plm, load_torch_state_dict

        return cfg, convert_plm(load_torch_state_dict(ckpt, prefix="plm."), cfg)
    return cfg, _lm_from_orbax(ckpt)


def adm_from_pretrained(ckpt: str, config: str) -> Tuple[MegaADMConfig, dict]:
    cfg, _ = load_adm_config(config)
    if _is_torch(ckpt):
        from ..training.convert import convert_adm, load_torch_state_dict

        return cfg, convert_adm(load_torch_state_dict(ckpt, prefix="adm."), cfg)
    return cfg, _lm_from_orbax(ckpt)


def hifigan_from_pretrained(
    ckpt: str, cfg: Optional[HiFiGANConfig] = None
) -> Tuple[HiFiGANConfig, dict]:
    cfg = cfg or HiFiGANConfig()
    from ..training.convert import convert_hifigan, load_torch_state_dict

    return cfg, convert_hifigan(load_torch_state_dict(ckpt), cfg)


def vocoder_from_pretrained(
    vocoder: str = "hifigan",
    vocoder_ckpt: Optional[str] = None,
    hifigan_ckpt: Optional[str] = None,
    vocoder_config: Optional[str] = None,
):
    """→ (voc_cfg, params) for either vocoder family.  ``vocoder_ckpt`` is
    an orbax dir from the cli 'vocoder' training stage; ``hifigan_ckpt`` a
    torch checkpoint (speechbrain/reference lineage); neither → random
    init (mel-faithful smoke runs, audio is noise)."""
    import os

    import jax
    import jax.numpy as jnp

    from ..config import VocosConfig, load_vocoder_config
    from .hifigan import HiFiGAN
    from .vocos import Vocos

    # Both families honor vocoder_config: a HiFi-GAN trained through the
    # 'vocoder' stage with non-default init_args must be rebuilt with the
    # SAME config or the orbax params mismatch the module (advisor r2).
    cfg = None
    if vocoder_config and os.path.exists(vocoder_config):
        cfg, _, _ = load_vocoder_config(vocoder_config)
        loaded_family = "vocos" if isinstance(cfg, VocosConfig) else "hifigan"
        if loaded_family != vocoder:
            cfg = None  # config is for the other family; fall back to defaults
    if vocoder == "vocos":
        cfg, cls = cfg or VocosConfig(), Vocos
    else:
        cfg, cls = cfg or HiFiGANConfig(), HiFiGAN
    if vocoder_ckpt:
        from ..training.checkpoints import load_vocoder_from_orbax

        return cfg, load_vocoder_from_orbax(vocoder_ckpt)
    if hifigan_ckpt and vocoder == "hifigan":
        return hifigan_from_pretrained(hifigan_ckpt, cfg)
    params = jax.jit(cls(cfg).init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, cfg.in_channels))
    )["params"]
    return cfg, params


def megatts_from_pretrained(
    g_ckpt: str,
    g_config: str,
    plm_ckpt: str,
    plm_config: str,
    adm_ckpt: str,
    adm_config: str,
    symbol_table: str,
    hifigan_ckpt: Optional[str] = None,
    vocoder: str = "hifigan",
    vocoder_ckpt: Optional[str] = None,
    vocoder_config: Optional[str] = None,
    **kwargs: Any,
):
    """Reference ``Megatts(...)`` constructor shape (megatts2.py:295-323) →
    a ready inference driver.  Without a vocoder checkpoint the vocoder is
    randomly initialized (outputs are mel-faithful but audio is noise)."""
    from .megatts import Megatts

    g_cfg, g_vars = megag_from_pretrained(g_ckpt, g_config)
    plm_cfg, plm_params = plm_from_pretrained(plm_ckpt, plm_config)
    adm_cfg, adm_params = adm_from_pretrained(adm_ckpt, adm_config)
    hifi_cfg, hifi_params = vocoder_from_pretrained(
        vocoder, vocoder_ckpt, hifigan_ckpt, vocoder_config
    )
    return Megatts(
        g_vars=g_vars,
        plm_params=plm_params,
        adm_params=adm_params,
        hifi_params=hifi_params,
        symbol_table=symbol_table,
        g_cfg=g_cfg,
        plm_cfg=plm_cfg,
        adm_cfg=adm_cfg,
        hifi_cfg=hifi_cfg,
        **kwargs,
    )
