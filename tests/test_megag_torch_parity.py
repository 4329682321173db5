"""Full-model numerical parity: MegaG eval forward vs a functional torch
reconstruction of the reference graph (models/megatts2.py:56-73) sharing
the same weights — MRTE (see test_mrte_torch_parity) ∥ VQPE (low-band
ConvNetDouble + MaxPool-8 middle + EMA-VQ lookup + ×8 repeat) → concat →
ConvNet mel decoder.  Passing this means a converted reference checkpoint
reproduces the reference's mel output within tolerance (the BASELINE
mel-L1 parity requirement), modulo the checkpoint weights themselves.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from megatts2_tpu.config import MegaGConfig, MRTEConfig, VQPEConfig
from megatts2_tpu.models import MegaG

from tests.test_mrte_torch_parity import (
    CFG as MRTE_CFG,
    sine_pe,
    t,
    t_conv1d,
    t_encoder,
    t_ln,
    t_mha,
)

VQPE_CFG = VQPEConfig(
    mel_bins=6, stride=8, hidden_size=8, kernel_size=3, n_layers=2, n_stacks=1,
    n_blocks=2, vq_bins=16, vq_dim=4,
)
G_CFG = MegaGConfig(
    mrte=MRTE_CFG, vqpe=VQPE_CFG, kernel_size=3, hidden_size=8,
    decoder_n_stack=1, decoder_n_block=2,
)


def t_conv_block_k(p, x, k):
    x = torch.relu(x)
    x = t_conv1d(p["conv"], x, padding=(k - 1) // 2)
    return t_ln(p["norm"], x)


def t_residual_stack_k(p, x, n_stacks, n_blocks, k):
    for i in range(n_stacks):
        y = x
        for j in range(n_blocks):
            y = t_conv_block_k(p[f"conv_stacks_{i}"][f"blocks_{j}"], y, k)
        x = x + y
    return x


def t_vqpe_convnet(p, x):
    c = VQPE_CFG
    x = t_conv1d(p["first_layer"], x, padding=(c.kernel_size - 1) // 2)
    out = None
    for i in range(c.n_layers):
        lp = p[f"layers_{i}"]
        y = t_residual_stack_k(lp["conv_stack1"], x, c.n_stacks, c.n_blocks, c.kernel_size)
        # MaxPool1d(stride, ceil_mode=True)
        y = torch.nn.functional.max_pool1d(
            y.transpose(1, 2), c.stride, c.stride, ceil_mode=True
        ).transpose(1, 2)
        y = t_residual_stack_k(lp["conv_stack2"], y, c.n_stacks, c.n_blocks, c.kernel_size)
        out = y if out is None else out + y
    return t_conv1d(p["last_layer"], out, padding=(c.kernel_size - 1) // 2)


def t_decoder(p, x):
    k = G_CFG.kernel_size
    x = t_conv1d(p["first_layer"], x, padding=(k - 1) // 2)
    x = t_residual_stack_k(p["conv_stack"], x, G_CFG.decoder_n_stack, G_CFG.decoder_n_block, k)
    return t_conv1d(p["last_layer"], x, padding=(k - 1) // 2)


class TestMegaGFullParity:
    def test_eval_forward_matches_torch_reconstruction(self):
        B, Tp, Tm_prompt, Tm = 2, 5, 33, 32
        rng = np.random.RandomState(0)
        phone = rng.randint(0, MRTE_CFG.phone_vocab_size, (B, Tp))
        dur = rng.randint(2, 8, (B, Tp)).astype(np.int32)
        dur = np.minimum(dur, 7)
        mel_prompt = rng.randn(B, Tm_prompt, MRTE_CFG.mel_bins).astype(np.float32)
        mel_tgt = rng.randn(B, Tm, MRTE_CFG.mel_bins).astype(np.float32)

        g = MegaG(G_CFG)
        variables = g.init(
            {"params": jax.random.PRNGKey(0), "vq": jax.random.PRNGKey(1)},
            jnp.asarray(dur), jnp.asarray(phone), jnp.asarray([Tp, Tp]),
            jnp.asarray(mel_prompt), jnp.asarray(mel_tgt),
        )
        # non-degenerate codebook for the lookup
        embed = rng.randn(VQPE_CFG.vq_bins, VQPE_CFG.vq_dim).astype(np.float32)
        variables = jax.tree_util.tree_map(lambda x: x, variables)
        vq_cb = variables["vq_stats"]["vqpe"]["vq"]["layers_0"]["_codebook"]
        vq_cb["embed"] = jnp.asarray(embed)
        vq_cb["inited"] = jnp.asarray(1.0)

        ours, commit, vq_loss = g.apply(
            variables,
            jnp.asarray(dur), jnp.asarray(phone), jnp.asarray([Tp, Tp]),
            jnp.asarray(mel_prompt), jnp.asarray(mel_tgt), train=False,
        )
        ours = np.asarray(ours)

        # ---- torch reconstruction -------------------------------------
        p = variables["params"]
        # VQPE: low bands → convnet → VQ lookup → ×8 repeat → truncate
        low = torch.from_numpy(mel_tgt[..., : VQPE_CFG.mel_bins])
        ze = t_vqpe_convnet(p["vqpe"]["convnet"], low)  # (B, ceil(Tm/8), vq_dim)
        e = torch.from_numpy(embed)
        d2 = (ze[:, :, None, :] - e[None, None, :, :]).pow(2).sum(-1)
        codes = d2.argmin(-1)
        zq = e[codes]  # (B, T8, vq_dim)
        zq = zq.repeat_interleave(VQPE_CFG.stride, dim=1)[:, :Tm]

        # MRTE tc_latent (masked: lens == Tp so mask is all-ones)
        emb = t(p["mrte"]["phone_embedding"]["word_embeddings"]["embedding"])
        x = emb[torch.from_numpy(phone).long()] + sine_pe(Tp, MRTE_CFG.hidden_size)[None]
        from tests.test_mrte_torch_parity import t_convnet_double

        mel_ctx = t_convnet_double(p["mrte"]["mel_encoder"], torch.from_numpy(mel_prompt))
        phone_x = t_encoder(
            p["mrte"]["phone_encoder"], x, MRTE_CFG.content_n_layers,
            MRTE_CFG.content_n_heads,
        )
        tc = t_mha(p["mrte"]["mha"], phone_x, mel_ctx, 1)
        tc = torch.relu(t_ln(p["mrte"]["norm"], tc))

        # length regulation: dense alignment semantics (mrte.py:23-31)
        expanded = torch.zeros(B, Tm, MRTE_CFG.hidden_size)
        for b in range(B):
            count = 0
            for j in range(Tp):
                for _ in range(int(dur[b, j])):
                    if count < Tm:
                        expanded[b, count] = tc[b, j]
                    count += 1

        xcat = torch.cat([expanded, zq], dim=-1)
        ref = t_decoder(p["decoder"], xcat).numpy()
        np.testing.assert_allclose(ours, ref, atol=5e-5)
