"""Full-path numerical parity: our MRTE.tc_latent vs a functional torch
reconstruction of the reference topology (mrte.py:154-171) sharing the same
weights — phone embedding + sine pos → conv-FF transformer; mel →
ConvNetDouble (shared stride-16 middle conv, branch sum) → single-head
cross-attention → LayerNorm → ReLU.

This is the strongest checkpoint-compatibility guarantee we can test
without the reference's environment: if the converted weights produce the
same tc_latent, the stage-2 latents and the synthesis cascade match.
"""
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from megatts2_tpu.config import MRTEConfig
from megatts2_tpu.models.mrte import MRTE

CFG = MRTEConfig(
    mel_bins=8,
    mel_stride=4,
    mel_n_layer=2,
    mel_n_stack=1,
    mel_n_block=2,
    mel_kernel_size=3,
    content_ff_dim=12,
    content_n_heads=2,
    content_n_layers=2,
    hidden_size=8,
    phone_vocab_size=11,
    dropout=0.0,
)


def t(a):
    return torch.from_numpy(np.asarray(a).copy())


def t_conv1d(p, x, stride=1, padding=0):
    """x (B, T, C) with flax kernel (k, in, out) → (B, T', C')."""
    w = t(p["kernel"]).permute(2, 1, 0)
    return torch.nn.functional.conv1d(
        x.transpose(1, 2), w, t(p["bias"]), stride=stride, padding=padding
    ).transpose(1, 2)


def t_ln(p, x):
    return torch.nn.functional.layer_norm(
        x, (x.shape[-1],), t(p["scale"]), t(p["bias"]), eps=1e-5
    )


def t_lin(p, x):
    y = x @ t(p["kernel"])
    if "bias" in p:
        y = y + t(p["bias"])
    return y


def t_conv_block(p, x):
    # reference ConvBlock: act → dropout → conv → LN (convnet.py:23-31)
    x = torch.relu(x)
    x = t_conv1d(p["conv"], x, padding=(CFG.mel_kernel_size - 1) // 2)
    return t_ln(p["norm"], x)


def t_residual_stack(p, x, n_stacks, n_blocks):
    for i in range(n_stacks):
        y = x
        for j in range(n_blocks):
            y = t_conv_block(p[f"conv_stacks_{i}"][f"blocks_{j}"], y)
        x = x + y
    return x


def t_convnet_double(p, x):
    k = CFG.mel_kernel_size
    x = t_conv1d(p["first_layer"], x, padding=(k - 1) // 2)
    out = None
    for i in range(CFG.mel_n_layer):
        lp = p[f"layers_{i}"]
        y = t_residual_stack(lp["conv_stack1"], x, CFG.mel_n_stack, CFG.mel_n_block)
        y = t_conv1d(
            p["middle_layer"]["conv"], y, stride=CFG.mel_stride,
            padding=CFG.mel_stride // 2,
        )
        y = t_residual_stack(lp["conv_stack2"], y, CFG.mel_n_stack, CFG.mel_n_block)
        out = y if out is None else out + y
    return t_conv1d(p["last_layer"], out, padding=(k - 1) // 2)


def t_mha(p, q, kv, n_heads):
    B, Tq, D = q.shape
    Tk = kv.shape[1]
    dh = D // n_heads
    qh = t_lin(p["w_q"], q).view(B, Tq, n_heads, dh).transpose(1, 2)
    kh = t_lin(p["w_k"], kv).view(B, Tk, n_heads, dh).transpose(1, 2)
    vh = t_lin(p["w_v"], kv).view(B, Tk, n_heads, dh).transpose(1, 2)
    att = torch.nn.functional.scaled_dot_product_attention(qh, kh, vh)
    att = att.transpose(1, 2).reshape(B, Tq, D)
    return t_lin(p["out_proj"], att)


def t_encoder(p, x, n_layers, n_heads, scan_stacked=True):
    for i in range(n_layers):
        lp = (
            jax.tree_util.tree_map(lambda a: np.asarray(a)[i], p["layers"])
            if scan_stacked
            else p[f"layers_{i}"]
        )
        h = t_ln(lp["norm1"], x)
        x = x + t_mha(lp["attn"], h, h, n_heads)
        h2 = t_ln(lp["norm2"], x)
        y = t_conv1d(lp["ff_conv1"], h2, padding=2)
        y = torch.relu(y)
        y = t_conv1d(lp["ff_conv2"], y, padding=2)
        x = h2 + y
    return x


def sine_pe(T, D):
    pos = np.arange(T)[:, None]
    div = np.exp(np.arange(0, D, 2) * -(math.log(10000.0) / D))
    pe = np.zeros((T, D), np.float32)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return torch.from_numpy(pe)


class TestMRTEFullPathParity:
    def test_tc_latent_matches_torch_reconstruction(self):
        B, Tp, Tm = 2, 5, 33
        rng = np.random.RandomState(0)
        phone = rng.randint(0, CFG.phone_vocab_size, (B, Tp))
        mel = rng.randn(B, Tm, CFG.mel_bins).astype(np.float32)

        mrte = MRTE(CFG)
        variables = mrte.init(
            jax.random.PRNGKey(0), jnp.asarray(phone), jnp.asarray(mel)
            , method=MRTE.tc_latent,
        )
        ours = np.asarray(
            mrte.apply(variables, jnp.asarray(phone), jnp.asarray(mel),
                       method=MRTE.tc_latent)
        )

        p = variables["params"]
        emb = t(p["phone_embedding"]["word_embeddings"]["embedding"])
        x = emb[torch.from_numpy(phone).long()]
        x = x + sine_pe(Tp, CFG.hidden_size)[None]
        mel_ctx = t_convnet_double(p["mel_encoder"], torch.from_numpy(mel))
        phone_x = t_encoder(
            p["phone_encoder"], x, CFG.content_n_layers, CFG.content_n_heads
        )
        tc = t_mha(p["mha"], phone_x, mel_ctx, 1)
        tc = torch.relu(t_ln(p["norm"], tc))
        np.testing.assert_allclose(ours, tc.numpy(), atol=3e-5)
        # sanity: mel encoder downsampled by stride
        assert mel_ctx.shape[1] == -(-Tm // CFG.mel_stride)
