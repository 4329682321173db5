"""Trainer-step tests: GAN two-optimizer step, PLM CE step, ADM MSE step,
cosine-warmup schedule parity, checkpoint save/restore round-trip."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from megatts2_tpu.config import (
    DiscriminatorConfig,
    MegaADMConfig,
    MegaGConfig,
    MegaPLMConfig,
    MRTEConfig,
    TrainConfig,
    VQPEConfig,
)

TINY_G = MegaGConfig(
    mrte=MRTEConfig(
        mel_bins=80, mel_stride=4, mel_n_layer=1, mel_n_stack=1, mel_n_block=1,
        content_ff_dim=32, content_n_heads=2, content_n_layers=1, hidden_size=16,
        phone_vocab_size=40, dropout=0.0,
    ),
    vqpe=VQPEConfig(
        mel_bins=20, stride=8, hidden_size=16, kernel_size=3, n_layers=1,
        n_stacks=1, n_blocks=1, vq_bins=32, vq_dim=8,
    ),
    kernel_size=3, hidden_size=16, decoder_n_stack=1, decoder_n_block=1,
)
TINY_D = DiscriminatorConfig(time_lengths=(8, 16), freq_length=80, hidden_size=8)
TCFG = TrainConfig(max_steps=100, warmup_steps=2, train_dtype="float32")


def gan_batch(B=2, Tp=6, Tm=64):
    rng = np.random.RandomState(0)
    return {
        "duration_tokens": rng.randint(1, 8, (B, Tp)).astype(np.int32),
        "phone_tokens": rng.randint(0, 40, (B, Tp)).astype(np.int32),
        "tokens_lens": np.full((B,), Tp, np.int32),
        "mel_timbres": rng.randn(B, 48, 80).astype(np.float32),
        "mel_targets": rng.randn(B, Tm, 80).astype(np.float32),
    }


class TestSchedule:
    def test_matches_transformers_formula(self):
        import math

        from megatts2_tpu.training import cosine_schedule_with_warmup

        lr, warm, total = 3e-4, 10, 100
        sch = cosine_schedule_with_warmup(lr, warm, total)
        # warmup region
        assert float(sch(0)) == 0.0
        assert abs(float(sch(5)) - lr * 0.5) < 1e-9
        # cosine region — transformers formula
        for step in (10, 30, 55, 99, 100, 120):
            progress = (step - warm) / (total - warm)
            expect = lr * max(0.0, 0.5 * (1 + math.cos(math.pi * progress)))
            assert abs(float(sch(step)) - expect) < 1e-9, step


class TestGANStep:
    def test_one_step_updates_and_metrics(self):
        from megatts2_tpu.training import create_gan_state, make_gan_train_step

        batch = gan_batch()
        state, g_tx, d_tx = create_gan_state(
            jax.random.PRNGKey(0), TINY_G, TINY_D, TCFG, batch
        )
        step_fn = jax.jit(make_gan_train_step(TINY_G, TINY_D, TCFG, g_tx, d_tx))
        new_state, metrics = step_fn(state, batch)
        assert int(new_state.step) == 1
        for k, v in metrics.items():
            assert np.isfinite(np.asarray(v)).all(), k
        # VQ kmeans initialized on first step
        inited = new_state.vq_stats["vqpe"]["vq"]["layers_0"]["_codebook"]["inited"]
        assert float(inited) == 1.0
        # step 0 has lr=0 (warmup, faithful to the reference's LambdaLR);
        # params move from step 2 on
        new_state2, _ = step_fn(new_state, batch)
        assert int(new_state2.step) == 2
        diff = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()), state.g_params, new_state2.g_params
        )
        assert max(jax.tree_util.tree_leaves(diff)) > 0
        d_diff = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()), state.d_params, new_state2.d_params
        )
        assert max(jax.tree_util.tree_leaves(d_diff)) > 0

    def test_eval_step(self):
        from megatts2_tpu.training import (
            create_gan_state,
            make_gan_eval_step,
        )

        batch = gan_batch()
        state, _, _ = create_gan_state(jax.random.PRNGKey(0), TINY_G, TINY_D, TCFG, batch)
        out = jax.jit(make_gan_eval_step(TINY_G))(state, batch)
        assert np.isfinite(float(out["loss_re"]))

    def test_ema_generator(self):
        """g_ema_decay>0: the state carries an EMA copy that follows the
        exact recursion e <- e*d + p*(1-d), the eval step evaluates the
        EMA weights, and the no-EMA default keeps g_ema=None."""
        from megatts2_tpu.training import (
            create_gan_state,
            make_gan_eval_step,
            make_gan_train_step,
        )

        batch = gan_batch()
        d = 0.5  # large 1-d so two steps move the EMA measurably
        tcfg = TrainConfig(max_steps=100, warmup_steps=2,
                           train_dtype="float32", g_ema_decay=d)
        state, g_tx, d_tx = create_gan_state(
            jax.random.PRNGKey(0), TINY_G, TINY_D, tcfg, batch
        )
        assert state.g_ema is not None
        step_fn = jax.jit(make_gan_train_step(TINY_G, TINY_D, tcfg, g_tx, d_tx))
        ema = jax.tree_util.tree_map(lambda x: np.asarray(x), state.g_ema)
        s = state
        for _ in range(3):
            prev_ema = ema
            s, _ = step_fn(s, batch)
            ema = jax.tree_util.tree_map(
                lambda e, p: e * d + np.asarray(p) * (1 - d),
                prev_ema, s.g_params,
            )
        got = jax.tree_util.tree_map(np.asarray, s.g_ema)
        for a, b in zip(jax.tree_util.tree_leaves(got),
                        jax.tree_util.tree_leaves(ema)):
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
        # EMA lags the raw params once they have moved
        diffs = jax.tree_util.tree_map(
            lambda e, p: float(np.abs(e - np.asarray(p)).max()),
            got, s.g_params,
        )
        assert max(jax.tree_util.tree_leaves(diffs)) > 0
        # eval runs on the EMA weights: zero them -> output must change
        out_ema = jax.jit(make_gan_eval_step(TINY_G))(s, batch)
        zeroed = s.replace(g_ema=jax.tree_util.tree_map(
            lambda x: jnp.zeros_like(x), s.g_ema))
        out_zero = jax.jit(make_gan_eval_step(TINY_G))(zeroed, batch)
        assert float(out_ema["loss_re"]) != float(out_zero["loss_re"])
        # default path unchanged
        state0, _, _ = create_gan_state(
            jax.random.PRNGKey(0), TINY_G, TINY_D, TCFG, batch
        )
        assert state0.g_ema is None


class TestPLMStep:
    def test_loss_decreases_on_repeated_batch(self):
        from megatts2_tpu.training import create_plm_state, make_plm_train_step

        cfg = MegaPLMConfig(n_layers=1, n_heads=2, vq_dim=8, tc_latent_dim=8, vq_bins=16, dropout=0.0)
        tcfg = TrainConfig(max_steps=100, warmup_steps=1, initial_learning_rate=1e-3,
                           train_dtype="float32")
        rng = np.random.RandomState(1)
        B, T = 2, 12
        batch = {
            "tc_latents": rng.randn(B, T, 8).astype(np.float32),
            "p_codes": np.concatenate(
                [np.full((B, 1), 16), rng.randint(0, 16, (B, T))], axis=1
            ).astype(np.int32),
            "lens": np.full((B,), T, np.int32),
        }
        state, tx = create_plm_state(jax.random.PRNGKey(0), cfg, tcfg, batch)
        step_fn, eval_fn = make_plm_train_step(cfg, tcfg, tx)
        step_fn = jax.jit(step_fn)
        losses = []
        for _ in range(8):
            state, m = step_fn(state, batch)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0]
        out = jax.jit(eval_fn)(state, batch)
        assert 0.0 <= float(out["ac10"]) <= 1.0

    def test_ce_ignores_eos_padding(self):
        """Rows fully padded with EOS contribute zero loss."""
        from megatts2_tpu.training import create_plm_state, make_plm_train_step

        cfg = MegaPLMConfig(n_layers=1, n_heads=2, vq_dim=8, tc_latent_dim=8, vq_bins=16, dropout=0.0)
        tcfg = TrainConfig(max_steps=10, warmup_steps=1, train_dtype="float32")
        B, T = 1, 6
        batch_pad = {
            "tc_latents": np.zeros((B, T, 8), np.float32),
            "p_codes": np.full((B, T + 1), cfg.eos_id, np.int32),
            "lens": np.zeros((B,), np.int32),
        }
        state, tx = create_plm_state(jax.random.PRNGKey(0), cfg, tcfg, batch_pad)
        _, eval_fn = make_plm_train_step(cfg, tcfg, tx)
        out = eval_fn(state, batch_pad)
        assert float(out["loss"]) == 0.0


class TestADMStep:
    def test_one_step(self):
        from megatts2_tpu.training import create_adm_state, make_adm_train_step

        cfg = MegaADMConfig(n_layers=1, n_heads=2, emb_dim=8, tc_latent_dim=8,
                            tc_emb_dim=8, dropout=0.0)
        tcfg = TrainConfig(max_steps=100, warmup_steps=1, train_dtype="float32")
        rng = np.random.RandomState(2)
        B, T = 2, 7
        batch = {
            "tc_latents": rng.randn(B, T, 8).astype(np.float32),
            "duration_tokens": np.concatenate(
                [np.zeros((B, 1, 1)), rng.randint(1, 9, (B, T, 1))], axis=1
            ).astype(np.float32),
            "lens": np.full((B,), T, np.int32),
        }
        state, tx = create_adm_state(jax.random.PRNGKey(0), cfg, tcfg, batch)
        step_fn, eval_fn = make_adm_train_step(cfg, tcfg, tx)
        step_fn = jax.jit(step_fn)
        losses = []
        for _ in range(6):
            state, m = step_fn(state, batch)
            losses.append(float(m["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]


class TestCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path):
        from megatts2_tpu.training import create_plm_state
        from megatts2_tpu.training.checkpoints import (
            latest_checkpoint,
            restore_checkpoint,
            save_checkpoint,
        )

        cfg = MegaPLMConfig(n_layers=1, n_heads=2, vq_dim=8, tc_latent_dim=8, vq_bins=16)
        tcfg = TrainConfig(max_steps=10, warmup_steps=1)
        batch = {
            "tc_latents": np.zeros((1, 4, 8), np.float32),
            "p_codes": np.zeros((1, 5), np.int32),
            "lens": np.full((1,), 4, np.int32),
        }
        state, _ = create_plm_state(jax.random.PRNGKey(0), cfg, tcfg, batch)
        path = save_checkpoint(str(tmp_path / "ck"), state, 3)
        assert latest_checkpoint(str(tmp_path / "ck")) == path
        restored = restore_checkpoint(path, state)
        a = jax.tree_util.tree_leaves(state.params)
        b = jax.tree_util.tree_leaves(restored.params)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_packed_fetch_equals_device_get(self):
        """The single-transfer pack/unpack path (packed_fetch.fetch_pytree,
        used by save_checkpoint on the tunnel target where per-leaf
        device_get dominates save time) must reproduce jax.device_get
        bit-exactly over mixed dtypes, shapes, scalars and non-arrays."""
        import jax.numpy as jnp

        from megatts2_tpu.training.packed_fetch import fetch_pytree

        rng = np.random.RandomState(0)
        tree = {
            "a": jnp.asarray(rng.randn(3, 5).astype(np.float32)),
            "nested": {
                "b": jnp.asarray(rng.randint(0, 9, (2, 2, 2)).astype(np.int32)),
                "c": jnp.asarray(np.float32(3.25)),  # 0-d scalar
                "d": jnp.asarray(rng.randn(7).astype(np.float32)),
            },
            "bf": jnp.asarray(rng.randn(4, 2), jnp.bfloat16),
            "step": jnp.asarray(17, jnp.int32),
            "none": None,
            "py": 5,
            # host numpy leaves must pass through UNTOUCHED — routing
            # them through the device would silently narrow 64-bit
            # dtypes (x64 off) and pay a pointless tunnel round trip
            "host64": np.asarray([1, 2, 3], np.int64),
            "hostf64": np.float64(0.125),
        }
        got = fetch_pytree(tree)
        want = jax.device_get(tree)
        flat_g, tg = jax.tree_util.tree_flatten(got)
        flat_w, tw = jax.tree_util.tree_flatten(want)
        assert tg == tw
        for g, w in zip(flat_g, flat_w):
            if isinstance(w, np.ndarray) or hasattr(w, "dtype"):
                assert np.asarray(g).dtype == np.asarray(w).dtype
                np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
            else:
                assert g == w
        assert got["py"] == 5
        # cache reuse on a second call with the same structure
        got2 = fetch_pytree(tree)
        np.testing.assert_array_equal(np.asarray(got2["a"]), np.asarray(want["a"]))

    def test_stale_tmp_dir_cleaned_on_resave(self, tmp_path):
        """A SIGKILL mid-save leaves ``step_N.orbax-checkpoint-tmp`` whose
        deterministic name collides when the resumed run re-saves step N
        (observed on the 50k-run kill at step 20000); save_checkpoint must
        clear stale tmp dirs first, and latest_checkpoint must never pick
        them up."""
        import jax.numpy as jnp

        from megatts2_tpu.training.checkpoints import (
            latest_checkpoint,
            save_checkpoint,
        )

        ck = tmp_path / "ck"
        stale = ck / "step_7.orbax-checkpoint-tmp"
        stale.mkdir(parents=True)
        (stale / "junk").write_text("partial write")
        assert latest_checkpoint(str(ck)) is None  # tmp dirs are invisible
        tree = {"w": jnp.arange(4, dtype=jnp.float32)}
        path = save_checkpoint(str(ck), tree, 7)
        assert not stale.exists()
        assert latest_checkpoint(str(ck)) == path
