"""Core NN library tests: attention (incl. torch parity + KV-cache
equivalence), transformer layers, convnet stacks, embeddings."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from megatts2_tpu.nn import (
    ConvNet,
    ConvNetDouble,
    MultiHeadAttention,
    SinePositionalEmbedding,
    TokenEmbedding,
    TransformerEncoder,
)

KEY = jax.random.PRNGKey(0)


class TestMHA:
    def test_self_attention_torch_parity(self):
        """Same weights → same output as torch F.scaled_dot_product_attention
        with separate q/k/v linears (reference transformer.py:16-57)."""
        torch = pytest.importorskip("torch")
        B, T, D, H = 2, 5, 16, 4
        x = np.random.RandomState(0).randn(B, T, D).astype(np.float32)
        mha = MultiHeadAttention(qkv_dim=D, n_heads=H)
        params = mha.init(KEY, jnp.asarray(x))["params"]
        out = mha.apply({"params": params}, jnp.asarray(x))

        def lin(name, v):
            w = torch.from_numpy(np.asarray(params[name]["kernel"]))
            b = torch.from_numpy(np.asarray(params[name]["bias"]))
            return v @ w + b

        xt = torch.from_numpy(x)
        q = lin("w_q", xt).view(B, T, H, D // H).transpose(1, 2)
        k = lin("w_k", xt).view(B, T, H, D // H).transpose(1, 2)
        v = lin("w_v", xt).view(B, T, H, D // H).transpose(1, 2)
        att = torch.nn.functional.scaled_dot_product_attention(q, k, v)
        att = att.transpose(1, 2).reshape(B, T, D)
        ref = lin("out_proj", att).numpy()
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    def test_cross_attention_shapes(self):
        q = jnp.zeros((2, 5, 32))
        kv = jnp.zeros((2, 9, 32))
        mha = MultiHeadAttention(qkv_dim=32, n_heads=1)
        params = mha.init(KEY, q, kv)["params"]
        out = mha.apply({"params": params}, q, kv)
        assert out.shape == (2, 5, 32)

    def test_padding_mask_blocks_keys(self):
        """Masked keys must not affect outputs for valid queries."""
        from megatts2_tpu.ops import make_attn_mask

        B, T, D = 1, 6, 16
        rng = np.random.RandomState(3)
        x = rng.randn(B, T, D).astype(np.float32)
        mha = MultiHeadAttention(qkv_dim=D, n_heads=2)
        params = mha.init(KEY, jnp.asarray(x))["params"]
        mask = make_attn_mask(jnp.array([4]), T)
        out1 = mha.apply({"params": params}, jnp.asarray(x), mask=mask)
        x2 = x.copy()
        x2[:, 4:] = rng.randn(B, 2, D)  # change padding content
        out2 = mha.apply({"params": params}, jnp.asarray(x2), mask=mask)
        np.testing.assert_allclose(
            np.asarray(out1[:, :4]), np.asarray(out2[:, :4]), atol=1e-5
        )


class TestDecodeCache:
    def test_incremental_equals_full_causal(self):
        """KV-cache decode, one token at a time, must reproduce the full
        causal forward pass."""
        B, T, D, H = 2, 7, 32, 4
        x = jnp.asarray(np.random.RandomState(1).randn(B, T, D).astype(np.float32))
        enc = TransformerEncoder(dim=D, ff_dim=64, num_layers=2, n_heads=H)
        params = enc.init(KEY, x)["params"]
        full = enc.apply({"params": params}, x, causal=True)

        dec = TransformerEncoder(dim=D, ff_dim=64, num_layers=2, n_heads=H, decode=True)
        outs = []
        cache = {}
        for t in range(T):
            vars_in = {"params": params, **cache}
            y, cache = dec.apply(
                vars_in, x[:, t : t + 1], max_decode_len=T, mutable=["cache"]
            )
            outs.append(y)
        inc = jnp.concatenate(outs, axis=1)
        np.testing.assert_allclose(np.asarray(full), np.asarray(inc), atol=1e-4)


class TestConvNet:
    def test_convnet_shapes(self):
        x = jnp.zeros((2, 24, 12))
        net = ConvNet(12, 10, hidden_size=16, n_stacks=2, n_blocks=2, kernel_size=3,
                      activation="ReLU")
        params = net.init(KEY, x)["params"]
        assert net.apply({"params": params}, x).shape == (2, 24, 10)

    def test_convnet_double_maxpool(self):
        x = jnp.zeros((2, 27, 12))  # 27 → ceil(27/8) = 4
        net = ConvNetDouble(12, 8, hidden_size=16, n_layers=2, n_stacks=1, n_blocks=1,
                            kernel_size=3, activation="ReLU", middle_kind="maxpool",
                            middle_stride=8)
        params = net.init(KEY, x)["params"]
        assert net.apply({"params": params}, x).shape == (2, 4, 8)

    def test_convnet_double_strided_conv_shared_middle(self):
        x = jnp.zeros((2, 35, 12))  # 35 → torch Conv(k=17,s=16,p=8): floor((35+16-17)/16)+1 = 3
        net = ConvNetDouble(12, 8, hidden_size=16, n_layers=3, n_stacks=1, n_blocks=1,
                            kernel_size=3, activation="ReLU", middle_kind="conv",
                            middle_stride=16)
        params = net.init(KEY, x)["params"]
        assert net.apply({"params": params}, x).shape == (2, 3, 8)
        # middle layer params exist ONCE (shared across the 3 branches)
        assert "middle_layer" in params
        assert sum(1 for k in params if k.startswith("middle")) == 1

    def test_conv_torch_padding_parity(self):
        """Strided middle conv matches torch Conv1d(k=s+1, s, p=s//2)."""
        torch = pytest.importorskip("torch")
        from megatts2_tpu.nn import StridedConvMiddle

        B, T, C, s = 1, 35, 4, 16
        x = np.random.RandomState(0).randn(B, T, C).astype(np.float32)
        m = StridedConvMiddle(hidden_size=C, stride=s)
        params = m.init(KEY, jnp.asarray(x))["params"]
        out = m.apply({"params": params}, jnp.asarray(x))

        w = np.asarray(params["conv"]["kernel"])  # (k, in, out)
        conv = torch.nn.Conv1d(C, C, s + 1, stride=s, padding=s // 2)
        with torch.no_grad():
            conv.weight.copy_(torch.from_numpy(w.transpose(2, 1, 0)))
            conv.bias.copy_(torch.from_numpy(np.asarray(params["conv"]["bias"])))
            ref = conv(torch.from_numpy(x.transpose(0, 2, 1))).numpy().transpose(0, 2, 1)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


class TestEmbeddings:
    def test_sine_positional_torch_semantics(self):
        """pe[0::2]=sin, pe[1::2]=cos, x + 1.0*pe."""
        import math

        D, T = 8, 5
        x = jnp.zeros((1, T, D))
        mod = SinePositionalEmbedding(dim_model=D)
        params = mod.init(KEY, x)
        out = np.asarray(mod.apply(params, x))[0]
        pos = np.arange(T)[:, None]
        div = np.exp(np.arange(0, D, 2) * -(math.log(10000.0) / D))
        np.testing.assert_allclose(out[:, 0::2], np.sin(pos * div), atol=1e-5)
        np.testing.assert_allclose(out[:, 1::2], np.cos(pos * div), atol=1e-5)

    def test_offset(self):
        D = 8
        mod = SinePositionalEmbedding(dim_model=D)
        x = jnp.zeros((1, 3, D))
        params = mod.init(KEY, x)
        full = mod.apply(params, jnp.zeros((1, 10, D)))
        shifted = mod.apply(params, x, offset=jnp.asarray(7))
        np.testing.assert_allclose(np.asarray(full[:, 7:10]), np.asarray(shifted), atol=1e-6)

    def test_token_embedding(self):
        mod = TokenEmbedding(dim_model=16, vocab_size=10)
        params = mod.init(KEY, jnp.zeros((2, 3), jnp.int32))
        out = mod.apply(params, jnp.asarray([[1, 2, 3], [0, 0, 9]]))
        assert out.shape == (2, 3, 16)
