"""Extra numerical-parity tests: fused Pallas mel kernel vs golden path,
full transformer encoder layer vs a torch construction of the reference
topology (pre-LN, conv-FF and linear-FF variants)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

KEY = jax.random.PRNGKey(0)


class TestFusedMel:
    def test_fused_matches_golden(self):
        from jax.experimental.pallas import tpu as pltpu

        from megatts2_tpu.ops import mel_spectrogram
        from megatts2_tpu.ops.mel import mel_spectrogram_fused

        y = jnp.asarray(np.random.RandomState(0).randn(8192).astype(np.float32) * 0.1)
        ref = mel_spectrogram(y)
        with pltpu.force_tpu_interpret_mode():
            got = mel_spectrogram_fused(y)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    def test_fused_batched(self):
        from jax.experimental.pallas import tpu as pltpu

        from megatts2_tpu.ops import mel_spectrogram
        from megatts2_tpu.ops.mel import mel_spectrogram_fused

        y = jnp.asarray(np.random.RandomState(1).randn(2, 4096).astype(np.float32))
        with pltpu.force_tpu_interpret_mode():
            got = mel_spectrogram_fused(y)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(mel_spectrogram(y)), atol=1e-5
        )


class TestEncoderLayerTorchParity:
    @pytest.mark.parametrize("conv_ff", [False, True])
    def test_layer_matches_torch(self, conv_ff):
        """Our TransformerEncoderLayer == the reference layer topology
        (transformer.py:59-102) rebuilt from torch primitives with shared
        weights: pre-LN residual attention, then either
        x+ff(norm2(x)) [linear] or norm2(x)+convff(norm2(x)) [conv]."""
        torch = pytest.importorskip("torch")
        from megatts2_tpu.nn import TransformerEncoderLayer

        B, T, D, H, FF = 2, 6, 16, 4, 24
        x = np.random.RandomState(0).randn(B, T, D).astype(np.float32)
        layer = TransformerEncoderLayer(dim=D, ff_dim=FF, conv_ff=conv_ff, n_heads=H)
        params = layer.init(KEY, jnp.asarray(x))["params"]
        out = np.asarray(layer.apply({"params": params}, jnp.asarray(x)))

        def t(a):
            return torch.from_numpy(np.asarray(a).copy())

        xt = torch.from_numpy(x)

        def ln(name, v):
            return torch.nn.functional.layer_norm(
                v, (D,), t(params[name]["scale"]), t(params[name]["bias"]), eps=1e-5
            )

        def lin(p, v):
            return v @ t(p["kernel"]) + t(p["bias"])

        # attention
        h = ln("norm1", xt)
        q = lin(params["attn"]["w_q"], h).view(B, T, H, D // H).transpose(1, 2)
        k = lin(params["attn"]["w_k"], h).view(B, T, H, D // H).transpose(1, 2)
        v = lin(params["attn"]["w_v"], h).view(B, T, H, D // H).transpose(1, 2)
        att = torch.nn.functional.scaled_dot_product_attention(q, k, v)
        att = att.transpose(1, 2).reshape(B, T, D)
        xt = xt + lin(params["attn"]["out_proj"], att)

        if conv_ff:
            h2 = ln("norm2", xt)
            w1 = t(params["ff_conv1"]["kernel"]).permute(2, 1, 0)  # (out,in,k)
            w2 = t(params["ff_conv2"]["kernel"]).permute(2, 1, 0)
            y = torch.nn.functional.conv1d(
                h2.transpose(1, 2), w1, t(params["ff_conv1"]["bias"]), padding=2
            )
            y = torch.relu(y)
            y = torch.nn.functional.conv1d(
                y, w2, t(params["ff_conv2"]["bias"]), padding=2
            )
            ref = h2 + y.transpose(1, 2)
        else:
            h2 = ln("norm2", xt)
            y = torch.relu(lin(params["ff_linear1"], h2))
            ref = xt + lin(params["ff_linear2"], y)

        np.testing.assert_allclose(out, ref.numpy(), atol=2e-5)


class TestVQDistanceKernel:
    def test_argmin_matches_bruteforce(self):
        """The einsum-argmin quantizer must equal a brute-force nearest
        neighbour search."""
        from megatts2_tpu.quantization import EuclideanCodebook

        bins, dim, n = 32, 8, 100
        rng = np.random.RandomState(0)
        embed = rng.randn(bins, dim).astype(np.float32)
        x = rng.randn(n, dim).astype(np.float32)
        cb = EuclideanCodebook(dim=dim, codebook_size=bins, kmeans_init=False)
        variables = cb.init({"params": KEY, "vq": KEY}, jnp.zeros((1, dim)))
        variables = {
            "vq_stats": {
                **variables["vq_stats"],
                "embed": jnp.asarray(embed),
            }
        }
        codes = cb.apply(variables, jnp.asarray(x), method=EuclideanCodebook.encode)
        brute = np.argmin(
            ((x[:, None, :] - embed[None, :, :]) ** 2).sum(-1), axis=1
        )
        np.testing.assert_array_equal(np.asarray(codes), brute)


class TestFlashAttention:
    @pytest.mark.parametrize("causal", [False, True])
    def test_matches_einsum_attention(self, causal):
        from megatts2_tpu.ops import flash_attention, make_attn_mask

        B, T, H, Dh = 2, 37, 4, 16
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(B, T, H, Dh).astype(np.float32))
        k = jnp.asarray(rng.randn(B, T, H, Dh).astype(np.float32))
        v = jnp.asarray(rng.randn(B, T, H, Dh).astype(np.float32))
        lens = jnp.asarray([20, 37], jnp.int32)

        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (Dh**-0.5)
        logits = logits + make_attn_mask(lens, T, causal=causal)
        ref = jnp.einsum("bhqk,bkhd->bqhd", jax.nn.softmax(logits, -1), v)

        got = flash_attention(q, k, v, k_lens=lens, causal=causal, block_q=16,
                              interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    @pytest.mark.parametrize("causal", [False, True])
    def test_blockwise_backward_matches_einsum_grads(self, causal):
        """The chunked ``_fa_bwd`` (scan over q-blocks, block_q < Tq so the
        scan actually iterates) must equal the grads of a plain einsum
        attention."""
        from megatts2_tpu.ops import make_attn_mask
        from megatts2_tpu.ops.attention_pallas import _fa_bwd

        B, T, H, Dh = 2, 37, 4, 16
        rng = np.random.RandomState(3)
        q = jnp.asarray(rng.randn(B, T, H, Dh).astype(np.float32))
        k = jnp.asarray(rng.randn(B, T, H, Dh).astype(np.float32))
        v = jnp.asarray(rng.randn(B, T, H, Dh).astype(np.float32))
        lens = jnp.asarray([20, 37], jnp.int32)
        g = jnp.asarray(rng.randn(B, T, H, Dh).astype(np.float32))

        def ref_attn(q, k, v):
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (Dh**-0.5)
            logits = logits + make_attn_mask(lens, T, causal=causal)
            return jnp.einsum("bhqk,bkhd->bqhd", jax.nn.softmax(logits, -1), v)

        _, vjp = jax.vjp(ref_attn, q, k, v)
        dq_ref, dk_ref, dv_ref = vjp(g)
        dq, dk, dv, _ = _fa_bwd(causal, (q, k, v, lens), g, block_q=16)
        np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_ref), atol=3e-5)
        np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_ref), atol=3e-5)
        np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_ref), atol=3e-5)

    def test_padded_q_block(self):
        """Tq not a multiple of block_q → output still trimmed/correct."""
        from megatts2_tpu.ops import flash_attention

        B, T, H, Dh = 1, 5, 2, 8
        rng = np.random.RandomState(1)
        q = jnp.asarray(rng.randn(B, T, H, Dh).astype(np.float32))
        k = jnp.asarray(rng.randn(B, T, H, Dh).astype(np.float32))
        v = jnp.asarray(rng.randn(B, T, H, Dh).astype(np.float32))
        out = flash_attention(q, k, v, block_q=16, interpret=True)
        assert out.shape == (B, T, H, Dh)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (Dh**-0.5)
        ref = jnp.einsum("bhqk,bkhd->bqhd", jax.nn.softmax(logits, -1), v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


class TestFlashInEncoder:
    def test_encoder_flash_fwd_bwd_parity(self):
        """use_flash=True encoder == einsum encoder, forward and grads
        (custom_vjp recompute backward)."""
        from jax.experimental.pallas import tpu as pltpu

        from megatts2_tpu.nn import TransformerEncoder

        B, T, D, H = 2, 24, 16, 2
        x = jnp.asarray(np.random.RandomState(0).randn(B, T, D).astype(np.float32))
        lens = jnp.asarray([15, 24], jnp.int32)
        enc_ref = TransformerEncoder(dim=D, ff_dim=32, num_layers=2, n_heads=H)
        p = enc_ref.init(KEY, x, x_lens=lens, causal=True)["params"]
        ref = enc_ref.apply({"params": p}, x, x_lens=lens, causal=True)
        from megatts2_tpu.nn import transformer as tr

        enc_fl = TransformerEncoder(dim=D, ff_dim=32, num_layers=2, n_heads=H,
                                    use_flash=True)
        tr.FLASH_ON_CPU = True
        try:
            with pltpu.force_tpu_interpret_mode():
                got = enc_fl.apply({"params": p}, x, x_lens=lens, causal=True)
                g1 = jax.grad(
                    lambda p: enc_fl.apply({"params": p}, x, x_lens=lens, causal=True).sum()
                )(p)
        finally:
            tr.FLASH_ON_CPU = False
        g2 = jax.grad(
            lambda p: enc_ref.apply({"params": p}, x, x_lens=lens, causal=True).sum()
        )(p)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5)
        for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
