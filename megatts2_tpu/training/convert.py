"""PyTorch-checkpoint → flax-params converters.

Accepts reference Lightning checkpoints (state_dict keys prefixed ``G.`` /
``plm.`` / ``adm.``, reference ``models/megatts2.py:111-117,192-198,286-292``)
and produces this framework's param/vq_stats pytrees, so mel and waveform
outputs match the PyTorch models within numerical tolerance (BASELINE.json).

Weight-layout transforms:
* Linear   (out, in)      → Dense kernel (in, out)          [transpose]
* Conv1d   (out, in, k)   → Conv kernel (k, in, out)        [transpose 2,1,0]
* Conv2d   (out, in, kh, kw) → (kh, kw, in, out)            [transpose 2,3,1,0]
* ConvTranspose1d (in, out, k) → (k, in, out), kernel FLIPPED along k
* Embedding / LayerNorm / BatchNorm → direct (LayerNorm weight → 'scale')
* VQ buffers (inited, cluster_size, embed, embed_avg) → 'vq_stats' collection

Loading uses plain ``torch.load`` when torch is available; tensors are
converted to numpy immediately.
"""
from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def load_torch_state_dict(path: str, prefix: str = "") -> Dict[str, np.ndarray]:
    """Load a torch .ckpt/.pt file → {name: np.ndarray}, stripping
    ``prefix`` (e.g. 'G.') and dropping non-matching keys."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    out = {}
    for k, v in sd.items():
        if prefix:
            if not k.startswith(prefix):
                continue
            k = k[len(prefix) :]
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


def _linear(sd, name):
    p = {"kernel": sd[f"{name}.weight"].T}
    if f"{name}.bias" in sd:
        p["bias"] = sd[f"{name}.bias"]
    return p


def _conv1d(sd, name):
    p = {"kernel": sd[f"{name}.weight"].transpose(2, 1, 0)}
    if f"{name}.bias" in sd:
        p["bias"] = sd[f"{name}.bias"]
    return p


def _conv2d(sd, name):
    p = {"kernel": sd[f"{name}.weight"].transpose(2, 3, 1, 0)}
    if f"{name}.bias" in sd:
        p["bias"] = sd[f"{name}.bias"]
    return p


def _ln(sd, name):
    return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}


def _embed(sd, name):
    return {"embedding": sd[f"{name}.weight"]}


def _conv_block(sd, name):
    return {"conv": _conv1d(sd, f"{name}.conv"), "norm": _ln(sd, f"{name}.norm")}


def _residual_stack(sd, name, n_stacks, n_blocks, scan_stacks: bool = False):
    per = []
    for i in range(n_stacks):
        stack = {}
        for j in range(n_blocks):
            stack[f"blocks_{j}"] = _conv_block(sd, f"{name}.conv_stacks.{i}.blocks.{j}")
        per.append(stack)
    if scan_stacks:
        import jax

        return {
            "conv_stacks": jax.tree_util.tree_map(
                lambda *xs: np.stack(xs, axis=0), *per
            )
        }
    return {f"conv_stacks_{i}": p for i, p in enumerate(per)}


def _convnet(sd, name, n_stacks, n_blocks, scan_stacks: bool = False):
    return {
        "first_layer": _conv1d(sd, f"{name}.first_layer"),
        "conv_stack": _residual_stack(sd, f"{name}.conv_stack", n_stacks, n_blocks, scan_stacks),
        "last_layer": _conv1d(sd, f"{name}.last_layer"),
    }


def _convnet_double(sd, name, n_layers, n_stacks, n_blocks, conv_middle: bool,
                    scan_stacks: bool = False):
    out = {
        "first_layer": _conv1d(sd, f"{name}.first_layer"),
        "last_layer": _conv1d(sd, f"{name}.last_layer"),
    }
    for i in range(n_layers):
        out[f"layers_{i}"] = {
            "conv_stack1": _residual_stack(
                sd, f"{name}.layers.{i}.conv_stack1", n_stacks, n_blocks, scan_stacks),
            "conv_stack2": _residual_stack(
                sd, f"{name}.layers.{i}.conv_stack2", n_stacks, n_blocks, scan_stacks),
        }
    if conv_middle:
        # the torch middle layer is ONE shared Conv1d; it also appears under
        # layers.{i}.middle_layer — read the first occurrence
        out["middle_layer"] = {"conv": _conv1d(sd, f"{name}.layers.0.middle_layer")}
    return out


def _mha(sd, name):
    return {
        "w_q": _linear(sd, f"{name}.w_q"),
        "w_k": _linear(sd, f"{name}.w_k"),
        "w_v": _linear(sd, f"{name}.w_v"),
        "out_proj": _linear(sd, f"{name}.out_proj.0"),
    }


def _encoder_layer(sd, name, conv_ff: bool):
    out = {
        "norm1": _ln(sd, f"{name}.norm1"),
        "norm2": _ln(sd, f"{name}.norm2"),
        "attn": _mha(sd, f"{name}.attn"),
    }
    if conv_ff:
        out["ff_conv1"] = _conv1d(sd, f"{name}.ff.0")
        out["ff_conv2"] = _conv1d(sd, f"{name}.ff.2")
    else:
        out["ff_linear1"] = _linear(sd, f"{name}.ff.0")
        out["ff_linear2"] = _linear(sd, f"{name}.ff.3")
    return out


def _encoder(sd, name, n_layers, conv_ff, scan_layers: bool = True):
    """Per-layer torch weights → our encoder params.  With the default
    scanned encoder (nn/transformer.py), per-layer tensors are STACKED on a
    leading depth axis under a single 'layers' subtree."""
    per_layer = [_encoder_layer(sd, f"{name}.layers.{i}", conv_ff) for i in range(n_layers)]
    if not scan_layers:
        return {f"layers_{i}": p for i, p in enumerate(per_layer)}
    import jax

    return {
        "layers": jax.tree_util.tree_map(lambda *xs: np.stack(xs, axis=0), *per_layer)
    }


def _vq_stats(sd, name, n_q=1):
    out = {}
    for i in range(n_q):
        # reference path: vqpe.vq (RVQ facade) .vq (RVQization) .layers.i
        cb = f"{name}.vq.vq.layers.{i}._codebook"
        out[f"layers_{i}"] = {
            "_codebook": {
                "inited": np.float32(sd[f"{cb}.inited"].reshape(())),
                "cluster_size": sd[f"{cb}.cluster_size"],
                "embed": sd[f"{cb}.embed"],
                "embed_avg": sd[f"{cb}.embed_avg"],
            }
        }
    return out


def convert_megag(
    sd: Mapping[str, np.ndarray], cfg, scan_stacks: bool | None = None
) -> Dict[str, Any]:
    """Reference MegaG state_dict → {'params': ..., 'vq_stats': ...}.
    Param layout follows ``cfg.scan_stacks`` unless overridden."""
    if scan_stacks is None:
        scan_stacks = getattr(cfg, "scan_stacks", False)
    m, v = cfg.mrte, cfg.vqpe
    params = {
        "mrte": {
            "phone_embedding": {"word_embeddings": _embed(sd, "mrte.phone_embedding.word_embeddings")},
            "mel_encoder": _convnet_double(
                sd, "mrte.mel_encoder", m.mel_n_layer, m.mel_n_stack, m.mel_n_block, True,
                scan_stacks,
            ),
            "phone_encoder": _encoder(sd, "mrte.phone_encoder", m.content_n_layers, True),
            "mha": _mha(sd, "mrte.mha"),
            "norm": _ln(sd, "mrte.norm"),
        },
        "vqpe": {
            "convnet": _convnet_double(
                sd, "vqpe.convnet", v.n_layers, v.n_stacks, v.n_blocks, False, scan_stacks
            ),
        },
        "decoder": _convnet(
            sd, "decoder", cfg.decoder_n_stack, cfg.decoder_n_block, scan_stacks
        ),
    }
    vq_stats = {"vqpe": {"vq": _vq_stats(sd, "vqpe")}}
    return {"params": params, "vq_stats": vq_stats}


def convert_plm(sd: Mapping[str, np.ndarray], cfg) -> Dict[str, Any]:
    return {
        "plm": _encoder(sd, "plm", cfg.n_layers, False),
        "predict_layer": {"kernel": sd["predict_layer.weight"].T},
        "pc_embedding": _embed(sd, "pc_embedding"),
    }


def convert_adm(sd: Mapping[str, np.ndarray], cfg) -> Dict[str, Any]:
    return {
        "adm": _encoder(sd, "adm", cfg.n_layers, False),
        "dt_linear_emb": {"kernel": sd["dt_linear_emb.weight"].T},
        "tc_linear_emb": {"kernel": sd["tc_linear_emb.weight"].T},
        "predict_layer": {"kernel": sd["predict_layer.weight"].T},
    }


def convert_discriminator(sd: Mapping[str, np.ndarray], cfg) -> Dict[str, Any]:
    """Reference Discriminator state_dict (prefix 'D.' stripped;
    modules/dscrm.py:11-140) → {'params', 'batch_stats'} for our
    ``models/dscrm.py::Discriminator``.

    Layout notes: torch keys are
    ``discriminator.discriminators.{i}.model.{j}.0`` (Conv2d) / ``.3``
    (BatchNorm2d, j<2) and ``.adv_layer``; the torch adv_layer consumes an
    NCHW flatten (C, T', F') while ours flattens channels-last (T', F', C),
    so the Linear kernel is permuted accordingly."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    fp = (cfg.freq_length + 7) // 8
    for i, wl in enumerate(cfg.time_lengths):
        base = f"discriminator.discriminators.{i}"
        dp: Dict[str, Any] = {}
        ds: Dict[str, Any] = {}
        for j in range(3):
            dp[f"conv_{j}"] = _conv2d(sd, f"{base}.model.{j}.0")
            if j < 2:
                bn = f"{base}.model.{j}.3"
                dp[f"bn_{j}"] = {"scale": sd[f"{bn}.weight"], "bias": sd[f"{bn}.bias"]}
                ds[f"bn_{j}"] = {
                    "mean": sd[f"{bn}.running_mean"],
                    "var": sd[f"{bn}.running_var"],
                }
        w = sd[f"{base}.adv_layer.weight"]  # (1, C*T'*F')
        tp = wl // 8
        c = cfg.hidden_size
        kernel = (
            w.reshape(c, tp, fp).transpose(1, 2, 0).reshape(tp * fp * c)[:, None]
        )
        dp["adv_layer"] = {"kernel": kernel, "bias": sd[f"{base}.adv_layer.bias"]}
        params[f"disc_{i}"] = dp
        stats[f"disc_{i}"] = ds
    return {"params": params, "batch_stats": stats}


def init_gan_state_from_torch(state, ckpt: str, g_cfg, d_cfg):
    """Replace a fresh GANTrainState's model weights with a reference GAN
    Lightning checkpoint (G. + D. prefixes) — optimizer state and step stay
    fresh.  Used by ``cli.py fit --init_from_torch``."""
    g_vars = convert_megag(load_torch_state_dict(ckpt, prefix="G."), g_cfg)
    d_vars = convert_discriminator(load_torch_state_dict(ckpt, prefix="D."), d_cfg)
    return state.replace(
        g_params=g_vars["params"],
        vq_stats=g_vars["vq_stats"],
        d_params=d_vars["params"],
        batch_stats=d_vars["batch_stats"],
    )


def init_lm_state_from_torch(state, ckpt: str, cfg, stage: str):
    """PLM/ADM counterpart of ``init_gan_state_from_torch``."""
    if stage == "plm":
        params = convert_plm(load_torch_state_dict(ckpt, prefix="plm."), cfg)
    else:
        params = convert_adm(load_torch_state_dict(ckpt, prefix="adm."), cfg)
    return state.replace(params=params)


def _fold_weight_norm(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Fold torch weight_norm (weight_g / weight_v) pairs into plain
    weights (HiFi-GAN checkpoints ship weight-normalized)."""
    out = dict(sd)
    for k in list(sd):
        if k.endswith("weight_g"):
            base = k[: -len("weight_g")]
            g, v = sd[k], sd[base + "weight_v"]
            axes = tuple(range(1, v.ndim))
            norm = np.sqrt((v**2).sum(axis=axes, keepdims=True))
            out[base + "weight"] = g * v / np.maximum(norm, 1e-12)
            del out[k], out[base + "weight_v"]
    return out


def convert_hifigan(sd: Mapping[str, np.ndarray], cfg) -> Dict[str, Any]:
    """HiFi-GAN V1 generator torch weights → flax params.  Accepts the
    standard jik876/speechbrain layout (conv_pre, ups.N, resblocks.N
    convs1/convs2, conv_post), weight-norm folded."""
    sd = _fold_weight_norm(dict(sd))
    params: Dict[str, Any] = {
        "conv_pre": _conv1d(sd, "conv_pre"),
        "conv_post": _conv1d(sd, "conv_post"),
    }
    for i in range(len(cfg.upsample_rates)):
        w = sd[f"ups.{i}.weight"]  # ConvTranspose1d (in, out, k)
        params[f"ups_{i}"] = {
            "kernel": w.transpose(2, 0, 1)[::-1].copy(),
            "bias": sd[f"ups.{i}.bias"],
        }
    n_k = len(cfg.resblock_kernel_sizes)
    for r in range(len(cfg.upsample_rates) * n_k):
        block = {}
        for j in range(len(cfg.resblock_dilation_sizes[r % n_k])):
            block[f"convs1_{j}"] = _conv1d(sd, f"resblocks.{r}.convs1.{j}")
            block[f"convs2_{j}"] = _conv1d(sd, f"resblocks.{r}.convs2.{j}")
        params[f"resblocks_{r}"] = block
    return params
