"""Multi-device tests on the virtual 8-device CPU mesh (SURVEY.md §4):
DP grad-equivalence, TP param sharding rules, VQ codebook replica
consistency under GSPMD, and the driver's dryrun_multichip path."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from megatts2_tpu.parallel import (
    DATA_AXIS,
    MODEL_AXIS,
    data_sharding,
    make_mesh,
    param_shardings,
    shard_batch,
)


@pytest.fixture(scope="module")
def devices():
    devs = jax.devices()
    assert len(devs) == 8, f"conftest should force 8 CPU devices, got {len(devs)}"
    return devs


class TestMesh:
    def test_mesh_shapes(self, devices):
        mesh = make_mesh(n_model=2)
        assert mesh.shape == {DATA_AXIS: 4, MODEL_AXIS: 2}
        mesh = make_mesh()
        assert mesh.shape == {DATA_AXIS: 8, MODEL_AXIS: 1}

    def test_shard_batch_puts_on_data_axis(self, devices):
        mesh = make_mesh()
        batch = {"x": np.zeros((8, 4), np.float32), "l": np.zeros((8,), np.int32)}
        sb = shard_batch(batch, mesh)
        assert sb["x"].sharding.spec == P(DATA_AXIS, None)
        assert sb["l"].sharding.spec == P(DATA_AXIS)


class TestTPRules:
    def test_transformer_projection_specs(self, devices):
        from megatts2_tpu.nn import TransformerEncoder

        mesh = make_mesh(n_model=2)
        enc = TransformerEncoder(dim=16, ff_dim=32, num_layers=2, n_heads=2)
        params = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 16)))["params"]
        sh = param_shardings(params, mesh)
        l = sh["layers"]  # scan-stacked: leading depth axis
        assert l["attn"]["w_q"]["kernel"].spec == P(None, None, MODEL_AXIS)
        assert l["attn"]["w_q"]["bias"].spec == P(None, MODEL_AXIS)
        assert l["attn"]["out_proj"]["kernel"].spec == P(None, MODEL_AXIS, None)
        assert l["attn"]["out_proj"]["bias"].spec == P()
        assert l["ff_linear1"]["kernel"].spec == P(None, None, MODEL_AXIS)
        assert l["ff_linear2"]["kernel"].spec == P(None, MODEL_AXIS, None)
        assert l["norm1"]["scale"].spec == P()

    def test_tp_forward_matches_replicated(self, devices):
        """Same forward output with TP-sharded vs replicated params."""
        from megatts2_tpu.nn import TransformerEncoder

        enc = TransformerEncoder(dim=16, ff_dim=32, num_layers=2, n_heads=2)
        x = jnp.asarray(np.random.RandomState(0).randn(4, 8, 16).astype(np.float32))
        params = enc.init(jax.random.PRNGKey(0), x)["params"]
        ref = enc.apply({"params": params}, x)

        mesh = make_mesh(n_model=2)
        with mesh:
            sh_params = jax.device_put(params, param_shardings(params, mesh))
            x_sh = jax.device_put(x, data_sharding(mesh, 3))
            out = jax.jit(lambda p, x: enc.apply({"params": p}, x))(sh_params, x_sh)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=1e-5)


class TestDPGradEquivalence:
    def test_sharded_step_equals_single_device(self, devices):
        """One PLM train step on the 8-device data mesh == unsharded step
        (the GSPMD replacement for DDP grad all-reduce)."""
        from megatts2_tpu.config import MegaPLMConfig, TrainConfig
        from megatts2_tpu.training import create_plm_state, make_plm_train_step

        cfg = MegaPLMConfig(n_layers=1, n_heads=2, vq_dim=8, tc_latent_dim=8,
                            vq_bins=16, dropout=0.0)
        tcfg = TrainConfig(max_steps=10, warmup_steps=1, train_dtype="float32")
        rng = np.random.RandomState(0)
        B, T = 8, 6
        batch = {
            "tc_latents": rng.randn(B, T, 8).astype(np.float32),
            "p_codes": rng.randint(0, 16, (B, T + 1)).astype(np.int32),
            "lens": np.full((B,), T, np.int32),
        }
        state, tx = create_plm_state(jax.random.PRNGKey(0), cfg, tcfg, batch)
        step_fn, _ = make_plm_train_step(cfg, tcfg, tx)

        ref_state, ref_metrics = jax.jit(step_fn)(state, batch)

        mesh = make_mesh()  # 8-way data parallel
        with mesh:
            sb = shard_batch(batch, mesh)
            dp_state, dp_metrics = jax.jit(step_fn)(state, sb)
        np.testing.assert_allclose(
            float(ref_metrics["loss"]), float(dp_metrics["loss"]), rtol=1e-5
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(ref_state.params),
            jax.tree_util.tree_leaves(dp_state.params),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


class TestVQReplicaConsistency:
    def test_vq_state_identical_across_replicas(self, devices):
        """Under GSPMD the VQ EMA state is computed from the global batch —
        fetching it from any device yields identical values (the property the
        reference enforces with rank-0 broadcasts, core_vq.py:151,169)."""
        from megatts2_tpu.quantization import VectorQuantization

        vq = VectorQuantization(dim=4, codebook_size=8, kmeans_init=True, kmeans_iters=3)
        x = jnp.asarray(np.random.RandomState(0).randn(8, 16, 4).astype(np.float32))
        variables = vq.init({"params": jax.random.PRNGKey(0), "vq": jax.random.PRNGKey(1)}, x)

        mesh = make_mesh()
        with mesh:
            x_sh = jax.device_put(x, data_sharding(mesh, 3))

            @jax.jit
            def step(v, x):
                (_, codes, _), mut = vq.apply(
                    v, x, train=True, rngs={"vq": jax.random.PRNGKey(2)},
                    mutable=["vq_stats"],
                )
                return codes, mut["vq_stats"]

            codes, stats = step(variables, x_sh)
            embed = stats["_codebook"]["embed"]
            # embed must be fully replicated — identical on every device
            shards = [np.asarray(s.data) for s in embed.addressable_shards]
        for s in shards[1:]:
            np.testing.assert_array_equal(shards[0], s)


class TestShardedInference:
    def test_synthesize_batch_sharded_matches_unsharded(self, devices):
        """Batched synthesis sharded over the 8-device data axis must equal
        the unsharded result (the v5e-8 serving layout)."""
        from megatts2_tpu.config import (
            HiFiGANConfig,
            MegaADMConfig,
            MegaGConfig,
            MegaPLMConfig,
            MRTEConfig,
            VQPEConfig,
        )
        from megatts2_tpu.models import HiFiGAN, MegaADM, MegaG, MegaPLM
        from megatts2_tpu.models.megatts import synthesize

        mrte = MRTEConfig(
            mel_bins=80, mel_stride=16, mel_n_layer=1, mel_n_stack=1, mel_n_block=1,
            content_ff_dim=32, content_n_heads=2, content_n_layers=1, hidden_size=16,
            phone_vocab_size=40, dropout=0.0,
        )
        vqpe = VQPEConfig(mel_bins=20, stride=8, hidden_size=16, kernel_size=3,
                          n_layers=1, n_stacks=1, n_blocks=1, vq_bins=32, vq_dim=8)
        g_cfg = MegaGConfig(mrte=mrte, vqpe=vqpe, kernel_size=3, hidden_size=16,
                            decoder_n_stack=1, decoder_n_block=1)
        plm_cfg = MegaPLMConfig(n_layers=1, n_heads=2, vq_dim=8, tc_latent_dim=16,
                                vq_bins=32, dropout=0.0)
        adm_cfg = MegaADMConfig(n_layers=1, n_heads=2, emb_dim=8, tc_latent_dim=16,
                                tc_emb_dim=8, dropout=0.0)
        hifi_cfg = HiFiGANConfig(
            in_channels=80, upsample_initial_channel=16,
            upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
            resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1,),),
        )
        key = jax.random.PRNGKey(0)
        g = MegaG(g_cfg)
        g_vars = jax.jit(g.init)(
            {"params": key, "vq": key},
            jnp.ones((1, 8), jnp.int32), jnp.zeros((1, 8), jnp.int32),
            jnp.asarray([8]), jnp.zeros((1, 64, 80)), jnp.zeros((1, 64, 80)),
        )
        plm_p = jax.jit(MegaPLM(plm_cfg).init)(
            key, jnp.zeros((1, 4, 16)), jnp.zeros((1, 5), jnp.int32), jnp.asarray([4])
        )["params"]
        adm_p = jax.jit(MegaADM(adm_cfg).init)(
            key, jnp.zeros((1, 4, 16)), jnp.zeros((1, 5, 1)), jnp.asarray([4])
        )["params"]
        hifi_p = jax.jit(HiFiGAN(hifi_cfg).init)(key, jnp.zeros((1, 8, 80)))["params"]

        rng = np.random.RandomState(0)
        B = 8
        phones = jnp.asarray(rng.randint(1, 40, (B, 8)), jnp.int32)
        lens = jnp.full((B,), 8, jnp.int32)
        mels = jnp.asarray(rng.randn(B, 64, 80).astype(np.float32))

        def run(p, l, m):
            return synthesize(
                {"params": g_vars["params"], "vq_stats": g_vars["vq_stats"]},
                plm_p, adm_p, hifi_p, g_cfg, plm_cfg, adm_cfg, hifi_cfg,
                p, l, m, max_frames=64, dtype=jnp.float32,
            )

        wav_ref, _, n_ref = run(phones, lens, mels)

        mesh = make_mesh()
        with mesh:
            sb = shard_batch({"p": phones, "l": lens, "m": mels}, mesh)
            wav_sh, _, n_sh = run(sb["p"], sb["l"], sb["m"])
        np.testing.assert_array_equal(np.asarray(n_ref), np.asarray(n_sh))
        np.testing.assert_allclose(
            np.asarray(wav_ref), np.asarray(wav_sh), atol=2e-5
        )


class TestGraftEntry:
    def test_dryrun_multichip(self, devices):
        import sys

        sys.path.insert(0, ".")
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)


class TestGANShardedEquivalence:
    def test_dp_tp_gan_step_matches_single_device(self, devices):
        """One GAN train step on a 4x2 (data x model) mesh — params
        TP-sharded, batch DP-sharded — must produce the same losses and
        updated params as the unsharded step."""
        from megatts2_tpu.config import (
            DiscriminatorConfig,
            MegaGConfig,
            MRTEConfig,
            TrainConfig,
            VQPEConfig,
        )
        from megatts2_tpu.parallel import param_shardings, replicated_like
        from megatts2_tpu.training import create_gan_state, make_gan_train_step

        g_cfg = MegaGConfig(
            mrte=MRTEConfig(
                mel_bins=80, mel_stride=4, mel_n_layer=1, mel_n_stack=1, mel_n_block=1,
                content_ff_dim=32, content_n_heads=2, content_n_layers=1, hidden_size=16,
                phone_vocab_size=40, dropout=0.0,
            ),
            vqpe=VQPEConfig(mel_bins=20, stride=8, hidden_size=16, kernel_size=3,
                            n_layers=1, n_stacks=1, n_blocks=1, vq_bins=32, vq_dim=8),
            kernel_size=3, hidden_size=16, decoder_n_stack=1, decoder_n_block=1,
        )
        d_cfg = DiscriminatorConfig(time_lengths=(8, 16), freq_length=80, hidden_size=8)
        tcfg = TrainConfig(max_steps=100, warmup_steps=1, train_dtype="float32")
        rng = np.random.RandomState(0)
        B = 8
        batch = {
            "duration_tokens": rng.randint(1, 8, (B, 6)).astype(np.int32),
            "phone_tokens": rng.randint(0, 40, (B, 6)).astype(np.int32),
            "tokens_lens": np.full((B,), 6, np.int32),
            "mel_timbres": rng.randn(B, 48, 80).astype(np.float32),
            "mel_targets": rng.randn(B, 64, 80).astype(np.float32),
            "mel_target_lens": np.full((B,), 64, np.int32),
        }
        state, g_tx, d_tx = create_gan_state(
            jax.random.PRNGKey(0), g_cfg, d_cfg, tcfg, batch
        )
        step = make_gan_train_step(g_cfg, d_cfg, tcfg, g_tx, d_tx)
        ref_state, ref_metrics = jax.jit(step)(state, batch)

        mesh = make_mesh(n_model=2)
        with mesh:
            sh_state = state.replace(
                g_params=jax.device_put(state.g_params, param_shardings(state.g_params, mesh)),
                d_params=jax.device_put(state.d_params, param_shardings(state.d_params, mesh)),
                g_opt=jax.device_put(state.g_opt, replicated_like(state.g_opt, mesh)),
                d_opt=jax.device_put(state.d_opt, replicated_like(state.d_opt, mesh)),
                vq_stats=jax.device_put(state.vq_stats, replicated_like(state.vq_stats, mesh)),
                batch_stats=jax.device_put(
                    state.batch_stats, replicated_like(state.batch_stats, mesh)
                ),
                rng=jax.device_put(state.rng, replicated_like(state.rng, mesh)),
                step=jax.device_put(state.step, replicated_like(state.step, mesh)),
            )
            sb = shard_batch(batch, mesh)
            sh_new, sh_metrics = jax.jit(step)(sh_state, sb)
        for k in ref_metrics:
            np.testing.assert_allclose(
                float(np.asarray(ref_metrics[k])), float(np.asarray(sh_metrics[k])),
                rtol=2e-4, atol=1e-5, err_msg=k,
            )
        for a, b in zip(
            jax.tree_util.tree_leaves(ref_state.g_params),
            jax.tree_util.tree_leaves(sh_new.g_params),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)

        # place_train_state with ZeRO-1 opt sharding: same step outputs,
        # and the Adam moments are actually sharded (not replicated)
        from megatts2_tpu.parallel import place_train_state

        with mesh:
            z_state = place_train_state(state, mesh, zero=True)
            z_new, z_metrics = jax.jit(step)(z_state, sb)
        for k in ref_metrics:
            np.testing.assert_allclose(
                float(np.asarray(ref_metrics[k])), float(np.asarray(z_metrics[k])),
                rtol=2e-4, atol=1e-5, err_msg=k,
            )
        for a, b in zip(
            jax.tree_util.tree_leaves(ref_state.g_params),
            jax.tree_util.tree_leaves(z_new.g_params),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
        from jax.sharding import PartitionSpec as P

        sharded_moments = [
            l
            for l in jax.tree_util.tree_leaves(z_state.g_opt)
            if hasattr(l, "sharding") and l.sharding.spec != P()
        ]
        assert sharded_moments, "ZeRO-1 sharded no optimizer moments"


class TestVocoderShardedEquivalence:
    def test_dp_vocoder_step_matches_single_device(self, devices):
        """One vocoder GAN train step, batch DP-sharded over the 8-device
        mesh, must match the unsharded step (losses + updated generator)."""
        from megatts2_tpu.config import (
            VocoderTrainConfig,
            VocosConfig,
            WaveDiscConfig,
        )
        from megatts2_tpu.parallel import place_train_state
        from megatts2_tpu.training import (
            create_vocoder_state,
            make_vocoder_train_step,
        )

        voc_cfg = VocosConfig(dim=16, intermediate_dim=32, num_layers=1)
        d_cfg = WaveDiscConfig(
            periods=(2, 3), msd_scales=1, mpd_base_ch=4, msd_base_ch=4, max_ch=8
        )
        tcfg = VocoderTrainConfig(segment_frames=8, train_dtype="float32")
        rng = np.random.RandomState(0)
        batch = {"wav": rng.randn(8, 8 * 256).astype(np.float32)}
        state, g_tx, d_tx = create_vocoder_state(
            jax.random.PRNGKey(0), voc_cfg, d_cfg, tcfg, batch
        )
        step = make_vocoder_train_step(voc_cfg, d_cfg, tcfg, g_tx, d_tx)
        ref_state, ref_metrics = jax.jit(step)(state, batch)

        mesh = make_mesh(n_model=2)
        with mesh:
            sh_state = place_train_state(state, mesh, zero=True)
            sh_new, sh_metrics = jax.jit(step)(sh_state, shard_batch(batch, mesh))
        for k in ref_metrics:
            np.testing.assert_allclose(
                float(np.asarray(ref_metrics[k])), float(np.asarray(sh_metrics[k])),
                rtol=2e-4, atol=1e-5, err_msg=k,
            )
        for a, b in zip(
            jax.tree_util.tree_leaves(ref_state.g_params),
            jax.tree_util.tree_leaves(sh_new.g_params),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
