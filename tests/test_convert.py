"""Checkpoint-converter tests.

Strategy: synthesize torch-style state dicts with the reference's exact key
naming / tensor layouts (SURVEY.md §2, models/megatts2.py prefix
conventions), run the converters, and check (a) the resulting pytree has
exactly the structure+shapes of our flax ``init`` params, and (b) numerics:
a torch Linear/Conv built from the same weights produces the same outputs
as our flax modules given the converted params.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from megatts2_tpu.config import (
    HiFiGANConfig,
    MegaADMConfig,
    MegaGConfig,
    MegaPLMConfig,
    MRTEConfig,
    VQPEConfig,
)
from megatts2_tpu.training.convert import (
    convert_adm,
    convert_hifigan,
    convert_megag,
    convert_plm,
)

KEY = jax.random.PRNGKey(0)

TINY_MRTE = MRTEConfig(
    mel_bins=8, mel_stride=4, mel_n_layer=2, mel_n_stack=1, mel_n_block=2,
    content_ff_dim=12, content_n_heads=2, content_n_layers=2, hidden_size=8,
    phone_vocab_size=11, dropout=0.0, mel_kernel_size=3,
)
TINY_VQPE = VQPEConfig(
    mel_bins=6, stride=8, hidden_size=8, kernel_size=3, n_layers=2, n_stacks=1,
    n_blocks=1, vq_bins=16, vq_dim=4,
)
TINY_G = MegaGConfig(mrte=TINY_MRTE, vqpe=TINY_VQPE, kernel_size=3,
                     hidden_size=8, decoder_n_stack=1, decoder_n_block=1)


def _rng_tensor(rng, *shape):
    return rng.randn(*shape).astype(np.float32)


def _torch_linear(rng, sd, name, din, dout, bias=True):
    sd[f"{name}.weight"] = _rng_tensor(rng, dout, din)
    if bias:
        sd[f"{name}.bias"] = _rng_tensor(rng, dout)


def _torch_conv1d(rng, sd, name, cin, cout, k):
    sd[f"{name}.weight"] = _rng_tensor(rng, cout, cin, k)
    sd[f"{name}.bias"] = _rng_tensor(rng, cout)


def _torch_ln(rng, sd, name, d):
    sd[f"{name}.weight"] = _rng_tensor(rng, d)
    sd[f"{name}.bias"] = _rng_tensor(rng, d)


def _torch_mha(rng, sd, name, d):
    for p in ("w_q", "w_k", "w_v"):
        _torch_linear(rng, sd, f"{name}.{p}", d, d)
    _torch_linear(rng, sd, f"{name}.out_proj.0", d, d)


def _torch_encoder(rng, sd, name, n_layers, d, ff, conv_ff):
    for i in range(n_layers):
        base = f"{name}.layers.{i}"
        _torch_ln(rng, sd, f"{base}.norm1", d)
        _torch_ln(rng, sd, f"{base}.norm2", d)
        _torch_mha(rng, sd, f"{base}.attn", d)
        if conv_ff:
            _torch_conv1d(rng, sd, f"{base}.ff.0", d, ff, 5)
            _torch_conv1d(rng, sd, f"{base}.ff.2", ff, d, 5)
        else:
            _torch_linear(rng, sd, f"{base}.ff.0", d, ff)
            _torch_linear(rng, sd, f"{base}.ff.3", ff, d)


def _torch_stack(rng, sd, name, h, n_stacks, n_blocks, k):
    for i in range(n_stacks):
        for j in range(n_blocks):
            _torch_conv1d(rng, sd, f"{name}.conv_stacks.{i}.blocks.{j}.conv", h, h, k)
            _torch_ln(rng, sd, f"{name}.conv_stacks.{i}.blocks.{j}.norm", h)


def _torch_convnet_double(rng, sd, name, cin, cout, h, n_layers, n_stacks, n_blocks, k, conv_middle, stride=4):
    _torch_conv1d(rng, sd, f"{name}.first_layer", cin, h, k)
    for i in range(n_layers):
        _torch_stack(rng, sd, f"{name}.layers.{i}.conv_stack1", h, n_stacks, n_blocks, k)
        _torch_stack(rng, sd, f"{name}.layers.{i}.conv_stack2", h, n_stacks, n_blocks, k)
        if conv_middle:
            # shared middle conv appears under each layer in a torch state dict
            if f"{name}.layers.0.middle_layer.weight" not in sd:
                w = _rng_tensor(rng, h, h, stride + 1)
                b = _rng_tensor(rng, h)
            else:
                w = sd[f"{name}.layers.0.middle_layer.weight"]
                b = sd[f"{name}.layers.0.middle_layer.bias"]
            sd[f"{name}.layers.{i}.middle_layer.weight"] = w
            sd[f"{name}.layers.{i}.middle_layer.bias"] = b
    _torch_conv1d(rng, sd, f"{name}.last_layer", h, cout, k)


def make_megag_state_dict(cfg: MegaGConfig, seed=0):
    rng = np.random.RandomState(seed)
    sd = {}
    m, v = cfg.mrte, cfg.vqpe
    sd["mrte.phone_embedding.word_embeddings.weight"] = _rng_tensor(
        rng, m.phone_vocab_size, m.hidden_size
    )
    _torch_convnet_double(rng, sd, "mrte.mel_encoder", m.mel_bins, m.hidden_size,
                          m.hidden_size, m.mel_n_layer, m.mel_n_stack, m.mel_n_block,
                          m.mel_kernel_size, True, m.mel_stride)
    _torch_encoder(rng, sd, "mrte.phone_encoder", m.content_n_layers, m.hidden_size,
                   m.content_ff_dim, True)
    _torch_mha(rng, sd, "mrte.mha", m.hidden_size)
    _torch_ln(rng, sd, "mrte.norm", m.hidden_size)
    _torch_convnet_double(rng, sd, "vqpe.convnet", v.mel_bins, v.vq_dim,
                          v.hidden_size, v.n_layers, v.n_stacks, v.n_blocks,
                          v.kernel_size, False)
    # VQ buffers
    sd["vqpe.vq.vq.layers.0._codebook.inited"] = np.array([1.0], np.float32)
    sd["vqpe.vq.vq.layers.0._codebook.cluster_size"] = np.abs(_rng_tensor(rng, v.vq_bins))
    sd["vqpe.vq.vq.layers.0._codebook.embed"] = _rng_tensor(rng, v.vq_bins, v.vq_dim)
    sd["vqpe.vq.vq.layers.0._codebook.embed_avg"] = _rng_tensor(rng, v.vq_bins, v.vq_dim)
    # decoder ConvNet
    dec_in = m.hidden_size + v.vq_dim
    _torch_conv1d(rng, sd, "decoder.first_layer", dec_in, cfg.hidden_size, cfg.kernel_size)
    _torch_stack(rng, sd, "decoder.conv_stack", cfg.hidden_size,
                 cfg.decoder_n_stack, cfg.decoder_n_block, cfg.kernel_size)
    _torch_conv1d(rng, sd, "decoder.last_layer", cfg.hidden_size, m.mel_bins, cfg.kernel_size)
    return sd


def tree_paths_shapes(tree):
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(p.key for p in path)
        out[key] = tuple(np.shape(leaf))
    return out


class TestMegaGConverter:
    def test_structure_matches_flax_init(self):
        from megatts2_tpu.models import MegaG

        sd = make_megag_state_dict(TINY_G)
        converted = convert_megag(sd, TINY_G)

        g = MegaG(TINY_G)
        B, Tp, Tm = 1, 5, 32
        variables = g.init(
            {"params": KEY, "vq": KEY},
            jnp.ones((B, Tp), jnp.int32), jnp.zeros((B, Tp), jnp.int32),
            jnp.asarray([Tp]), jnp.zeros((B, Tm, TINY_MRTE.mel_bins)),
            jnp.zeros((B, Tm, TINY_MRTE.mel_bins)),
        )
        expect_p = tree_paths_shapes(variables["params"])
        got_p = tree_paths_shapes(converted["params"])
        assert got_p == expect_p
        # vq_stats: scalar 'inited' shape差 handled -> compare keys and shapes
        expect_s = tree_paths_shapes(variables["vq_stats"])
        got_s = tree_paths_shapes(converted["vq_stats"])
        assert set(got_s) == set(expect_s)
        for k in expect_s:
            if not k.endswith("inited"):
                assert got_s[k] == expect_s[k], k

    def test_converted_model_runs_and_vq_embed_used(self):
        from megatts2_tpu.models import MegaG

        sd = make_megag_state_dict(TINY_G)
        converted = convert_megag(sd, TINY_G)
        converted["vq_stats"]["vqpe"]["vq"]["layers_0"]["_codebook"]["inited"] = jnp.asarray(1.0)
        g = MegaG(TINY_G)
        B, Tp, Tm = 1, 5, 32
        rng = np.random.RandomState(0)
        out, commit, vq_loss = g.apply(
            {"params": converted["params"], "vq_stats": converted["vq_stats"]},
            jnp.asarray(rng.randint(1, 9, (B, Tp)), jnp.int32),
            jnp.asarray(rng.randint(0, 11, (B, Tp)), jnp.int32),
            jnp.asarray([Tp]),
            jnp.asarray(rng.randn(B, Tm, 8).astype(np.float32)),
            jnp.asarray(rng.randn(B, Tm, 8).astype(np.float32)),
        )
        assert out.shape == (B, Tm, 8)
        assert np.isfinite(np.asarray(out)).all()


class TestLMConverters:
    def test_plm_structure(self):
        from megatts2_tpu.models import MegaPLM

        cfg = MegaPLMConfig(n_layers=2, n_heads=2, vq_dim=8, tc_latent_dim=8, vq_bins=16)
        rng = np.random.RandomState(1)
        sd = {}
        _torch_encoder(rng, sd, "plm", cfg.n_layers, cfg.d_model, cfg.d_model * 4, False)
        sd["predict_layer.weight"] = _rng_tensor(rng, cfg.vq_bins, cfg.d_model)
        sd["pc_embedding.weight"] = _rng_tensor(rng, cfg.vq_bins + 2, cfg.vq_dim)
        converted = convert_plm(sd, cfg)

        model = MegaPLM(cfg)
        variables = model.init(
            KEY, jnp.zeros((1, 4, cfg.tc_latent_dim)),
            jnp.zeros((1, 5), jnp.int32), jnp.asarray([4]),
        )
        assert tree_paths_shapes(converted) == tree_paths_shapes(variables["params"])
        # numerics flow
        logits, _ = model.apply(
            {"params": converted},
            jnp.asarray(np.random.RandomState(2).randn(1, 4, 8).astype(np.float32)),
            jnp.asarray([[16, 1, 2, 3, 4]], jnp.int32), jnp.asarray([4]),
        )
        assert np.isfinite(np.asarray(logits)).all()

    def test_adm_structure(self):
        from megatts2_tpu.models import MegaADM

        cfg = MegaADMConfig(n_layers=2, n_heads=2, emb_dim=8, tc_latent_dim=12, tc_emb_dim=8)
        rng = np.random.RandomState(1)
        sd = {}
        _torch_encoder(rng, sd, "adm", cfg.n_layers, cfg.d_model, cfg.emb_dim * 4, False)
        sd["dt_linear_emb.weight"] = _rng_tensor(rng, cfg.emb_dim, 1)
        sd["tc_linear_emb.weight"] = _rng_tensor(rng, cfg.tc_emb_dim, cfg.tc_latent_dim)
        sd["predict_layer.weight"] = _rng_tensor(rng, 1, cfg.d_model)
        converted = convert_adm(sd, cfg)

        model = MegaADM(cfg)
        variables = model.init(
            KEY, jnp.zeros((1, 4, cfg.tc_latent_dim)),
            jnp.zeros((1, 5, 1)), jnp.asarray([4]),
        )
        assert tree_paths_shapes(converted) == tree_paths_shapes(variables["params"])


class TestHiFiGANConverter:
    def test_structure_and_weight_norm_folding(self):
        from megatts2_tpu.models import HiFiGAN

        cfg = HiFiGANConfig(
            in_channels=8, upsample_initial_channel=8,
            upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
            resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 2),),
        )
        rng = np.random.RandomState(3)
        sd = {}

        def wn_conv1d(name, cin, cout, k):
            v = _rng_tensor(rng, cout, cin, k)
            g = np.abs(_rng_tensor(rng, cout, 1, 1)) + 0.5
            sd[f"{name}.weight_v"] = v
            sd[f"{name}.weight_g"] = g
            sd[f"{name}.bias"] = _rng_tensor(rng, cout)
            norm = np.sqrt((v**2).sum(axis=(1, 2), keepdims=True))
            return g * v / norm

        w_pre = wn_conv1d("conv_pre", 8, 8, 7)
        # ConvTranspose1d weight layout: (in, out, k)
        for i, (r, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
            cin = 8 // (2**i)
            cout = 8 // (2 ** (i + 1))
            v = _rng_tensor(rng, cin, cout, k)
            g = np.abs(_rng_tensor(rng, cin, 1, 1)) + 0.5
            sd[f"ups.{i}.weight_v"] = v
            sd[f"ups.{i}.weight_g"] = g
            sd[f"ups.{i}.bias"] = _rng_tensor(rng, cout)
        for r in range(2):
            ch = 8 // (2 ** (r + 1))
            for j in range(2):
                wn_conv1d(f"resblocks.{r}.convs1.{j}", ch, ch, 3)
                wn_conv1d(f"resblocks.{r}.convs2.{j}", ch, ch, 3)
        wn_conv1d("conv_post", 8 // 4, 1, 7)

        converted = convert_hifigan(sd, cfg)
        model = HiFiGAN(cfg)
        variables = model.init(KEY, jnp.zeros((1, 10, 8)))
        assert tree_paths_shapes(converted) == tree_paths_shapes(variables["params"])
        # folded conv_pre kernel equals g*v/||v|| transposed
        np.testing.assert_allclose(
            np.asarray(converted["conv_pre"]["kernel"]),
            w_pre.transpose(2, 1, 0), rtol=1e-6,
        )
        wav = model.apply({"params": converted}, jnp.zeros((1, 10, 8)))
        assert wav.shape == (1, 160)

    def test_transposed_conv_matches_torch(self):
        """flax TransposedConv1d with converted weights == torch
        ConvTranspose1d (the HiFiGAN upsampling core)."""
        torch = pytest.importorskip("torch")
        from megatts2_tpu.models import TransposedConv1d

        cin, cout, k, s, T = 4, 3, 8, 4, 12
        rng = np.random.RandomState(5)
        w = _rng_tensor(rng, cin, cout, k)  # torch layout (in, out, k)
        b = _rng_tensor(rng, cout)
        x = _rng_tensor(rng, 1, T, cin)

        conv = torch.nn.ConvTranspose1d(cin, cout, k, stride=s, padding=(k - s) // 2)
        with torch.no_grad():
            conv.weight.copy_(torch.from_numpy(w))
            conv.bias.copy_(torch.from_numpy(b))
            ref = conv(torch.from_numpy(x.transpose(0, 2, 1))).numpy().transpose(0, 2, 1)

        mod = TransposedConv1d(cout, k, s)
        params = {"kernel": jnp.asarray(w.transpose(2, 0, 1)[::-1].copy()),
                  "bias": jnp.asarray(b)}
        out = mod.apply({"params": params}, jnp.asarray(x))
        assert out.shape == ref.shape == (1, T * s, cout)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


class TestTorchCheckpointFile:
    def test_lightning_style_ckpt_file_roundtrip(self, tmp_path):
        """Write a Lightning-style .ckpt (torch.save of {'state_dict':
        {'G.'-prefixed tensors}}) and load through the public path
        (load_torch_state_dict + convert_megag), as infer.py does."""
        torch = pytest.importorskip("torch")
        from megatts2_tpu.models import MegaG, megag_from_pretrained
        from megatts2_tpu.training.convert import load_torch_state_dict

        sd = make_megag_state_dict(TINY_G)
        ckpt = {
            "state_dict": {f"G.{k}": torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
            "epoch": 3,
        }
        path = str(tmp_path / "generator.ckpt")
        torch.save(ckpt, path)

        loaded = load_torch_state_dict(path, prefix="G.")
        assert set(loaded) == set(sd)
        converted = convert_megag(loaded, TINY_G)

        # run through the model
        g = MegaG(TINY_G)
        rng = np.random.RandomState(0)
        out, _, _ = g.apply(
            {"params": converted["params"], "vq_stats": converted["vq_stats"]},
            jnp.asarray(rng.randint(1, 6, (1, 4)), jnp.int32),
            jnp.asarray(rng.randint(0, 11, (1, 4)), jnp.int32),
            jnp.asarray([4]),
            jnp.asarray(rng.randn(1, 16, 8).astype(np.float32)),
            jnp.asarray(rng.randn(1, 16, 8).astype(np.float32)),
        )
        assert np.isfinite(np.asarray(out)).all()

        # the from_pretrained facade consumes the same file via a config yaml
        import yaml

        cfg_yaml = {
            "model": {
                "G": {
                    "init_args": {
                        "mrte": {"init_args": dataclasses_to_dict(TINY_G.mrte)},
                        "vqpe": {"init_args": dataclasses_to_dict(TINY_G.vqpe)},
                        "kernel_size": TINY_G.kernel_size,
                        "hidden_size": TINY_G.hidden_size,
                        "decoder_n_stack": TINY_G.decoder_n_stack,
                        "decoder_n_block": TINY_G.decoder_n_block,
                    }
                }
            }
        }
        cfg_path = str(tmp_path / "g.yaml")
        open(cfg_path, "w").write(yaml.safe_dump(cfg_yaml))
        g_cfg2, g_vars2 = megag_from_pretrained(path, cfg_path)
        assert g_cfg2 == TINY_G
        a = jax.tree_util.tree_leaves(g_vars2["params"])
        b = jax.tree_util.tree_leaves(converted["params"])
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def dataclasses_to_dict(dc):
    import dataclasses

    return dataclasses.asdict(dc)
