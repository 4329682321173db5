"""Full-model torch parity for the AR models: MegaPLM and MegaADM forward
passes vs functional torch reconstructions of the reference graphs
(models/megatts2.py:148-163, 233-247) sharing the same weights."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from megatts2_tpu.config import MegaADMConfig, MegaPLMConfig
from megatts2_tpu.models import MegaADM, MegaPLM

from tests.test_mrte_torch_parity import sine_pe, t, t_lin, t_ln, t_mha


def t_encoder_linear(p, x, n_layers, n_heads, lens):
    """Linear-FF causal encoder with padding mask (transformer.py:59-133)."""
    B, T, D = x.shape
    kpos = torch.arange(T)
    pad = kpos[None, :] >= torch.as_tensor(lens)[:, None]  # (B, T) True=pad
    causal = torch.triu(torch.ones(T, T, dtype=torch.bool), 1)
    mask = pad[:, None, None, :] | causal[None, None]
    add_mask = torch.zeros(B, 1, T, T).masked_fill(mask, float(-1e9))

    for i in range(n_layers):
        lp = jax.tree_util.tree_map(lambda a: np.asarray(a)[i], p["layers"])
        h = t_ln(lp["norm1"], x)
        dh = D // n_heads
        qh = t_lin(lp["attn"]["w_q"], h).view(B, T, n_heads, dh).transpose(1, 2)
        kh = t_lin(lp["attn"]["w_k"], h).view(B, T, n_heads, dh).transpose(1, 2)
        vh = t_lin(lp["attn"]["w_v"], h).view(B, T, n_heads, dh).transpose(1, 2)
        att = torch.nn.functional.scaled_dot_product_attention(
            qh, kh, vh, attn_mask=add_mask
        )
        att = att.transpose(1, 2).reshape(B, T, D)
        x = x + t_lin(lp["attn"]["out_proj"], att)
        h2 = t_ln(lp["norm2"], x)
        y = torch.relu(t_lin(lp["ff_linear1"], h2))
        x = x + t_lin(lp["ff_linear2"], y)
    return x


class TestPLMTorchParity:
    def test_forward_logits(self):
        cfg = MegaPLMConfig(n_layers=2, n_heads=2, vq_dim=6, tc_latent_dim=10,
                            vq_bins=16, dropout=0.0)
        B, T = 2, 7
        rng = np.random.RandomState(0)
        tc = rng.randn(B, T, cfg.tc_latent_dim).astype(np.float32)
        codes = np.concatenate(
            [np.full((B, 1), cfg.bos_id), rng.randint(0, cfg.vq_bins, (B, T))], 1
        ).astype(np.int32)
        lens = np.full((B,), T, np.int32)

        model = MegaPLM(cfg)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.asarray(tc), jnp.asarray(codes), jnp.asarray(lens)
        )
        logits, target = model.apply(
            variables, jnp.asarray(tc), jnp.asarray(codes), jnp.asarray(lens)
        )

        p = variables["params"]
        pc = t(p["pc_embedding"]["embedding"])[torch.from_numpy(codes[:, :-1]).long()]
        x = torch.cat([torch.from_numpy(tc), pc], -1)
        x = x + sine_pe(T, cfg.d_model)[None]
        x = t_encoder_linear(p["plm"], x, cfg.n_layers, cfg.n_heads, lens)
        ref = x @ t(p["predict_layer"]["kernel"])
        np.testing.assert_allclose(np.asarray(logits), ref.numpy(), atol=3e-5)
        np.testing.assert_array_equal(np.asarray(target), codes[:, 1:])


class TestADMTorchParity:
    def test_forward_predictions(self):
        cfg = MegaADMConfig(n_layers=2, n_heads=2, emb_dim=6, tc_latent_dim=10,
                            tc_emb_dim=6, dropout=0.0)
        B, T = 2, 6
        rng = np.random.RandomState(1)
        tc = rng.randn(B, T, cfg.tc_latent_dim).astype(np.float32)
        dur = np.concatenate(
            [np.zeros((B, 1, 1)), rng.randint(1, 9, (B, T, 1))], 1
        ).astype(np.float32)
        lens = np.full((B,), T, np.int32)

        model = MegaADM(cfg)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.asarray(tc), jnp.asarray(dur), jnp.asarray(lens)
        )
        pred, target = model.apply(
            variables, jnp.asarray(tc), jnp.asarray(dur), jnp.asarray(lens)
        )

        p = variables["params"]
        dt_emb = torch.from_numpy(dur[:, :-1]) @ t(p["dt_linear_emb"]["kernel"])
        tc_emb = torch.from_numpy(tc) @ t(p["tc_linear_emb"]["kernel"])
        x = torch.cat([tc_emb, dt_emb], -1)
        x = x + sine_pe(T, cfg.d_model)[None]
        x = t_encoder_linear(p["adm"], x, cfg.n_layers, cfg.n_heads, lens)
        ref = (x @ t(p["predict_layer"]["kernel"]))[..., 0]
        np.testing.assert_allclose(np.asarray(pred), ref.numpy(), atol=3e-5)
        np.testing.assert_array_equal(np.asarray(target), dur[:, 1:, 0])
