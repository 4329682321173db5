"""Top-k-by-val-metric checkpoint retention (reference ModelCheckpoint:
top-5 on ``val/loss_re`` + ``save_last: true``, configs/config_gan.yaml:12-18).
A later-but-worse validation must NOT evict an earlier-better checkpoint."""
import os

import jax.numpy as jnp

from megatts2_tpu.training.checkpoints import (
    best_checkpoint,
    latest_checkpoint,
    restore_pytree,
    save_checkpoint,
)


def _dirs(d):
    return sorted(n for n in os.listdir(d) if n.startswith("step_"))


class TestTopKRetention:
    def test_keeps_best_plus_last(self, tmp_path):
        d = str(tmp_path / "ck")
        state = {"w": jnp.arange(4.0)}
        # val curve: improves then diverges
        scores = {10: 1.0, 20: 0.5, 30: 0.2, 40: 0.9, 50: 1.5, 60: 2.0}
        for step, m in scores.items():
            save_checkpoint(d, {**state, "s": jnp.asarray(step)}, step, keep=2, metric=m)
        kept = _dirs(d)
        # top-2 by metric = steps 30 (0.2) and 20 (0.5); latest = 60
        assert kept == ["step_20", "step_30", "step_60"], kept
        assert latest_checkpoint(d).endswith("step_60")
        assert best_checkpoint(d).endswith("step_30")
        assert int(restore_pytree(os.path.join(d, "step_30"))["s"]) == 30

    def test_unscored_final_save_only_kept_as_latest(self, tmp_path):
        d = str(tmp_path / "ck")
        state = {"w": jnp.zeros(2)}
        save_checkpoint(d, state, 5, keep=1, metric=0.3)
        save_checkpoint(d, state, 9, keep=1, metric=None)  # end-of-training save
        assert _dirs(d) == ["step_5", "step_9"]
        # another unscored save: 9 is no longer latest and has no score
        save_checkpoint(d, state, 12, keep=1, metric=None)
        assert _dirs(d) == ["step_12", "step_5"]
        assert best_checkpoint(d).endswith("step_5")

    def test_retention_survives_resume(self, tmp_path):
        d = str(tmp_path / "ck")
        state = {"w": jnp.zeros(2)}
        save_checkpoint(d, state, 1, keep=2, metric=0.1)
        # "restart": a fresh process would re-read scores.json
        save_checkpoint(d, state, 2, keep=2, metric=0.9)
        save_checkpoint(d, state, 3, keep=2, metric=0.8)
        assert _dirs(d) == ["step_1", "step_3"]  # 0.1 best, 3 = top-2 & latest


class TestSaveCadence:
    def test_save_every_n_vals(self, monkeypatch, tmp_path):
        """run_training with save_every_n_vals=2 checkpoints on every 2nd
        validation plus the final save (round-5: full-size saves cost
        ~1.5 min over the remote tunnel; the val curve stays dense)."""
        import flax.struct
        import jax.numpy as jnp

        from megatts2_tpu.training import train_loop

        class S(flax.struct.PyTreeNode):
            step: jnp.ndarray

        saves = []
        monkeypatch.setattr(
            train_loop, "save_checkpoint",
            lambda ckpt_dir, state, step, keep=5, metric=None:
                saves.append((step, metric)),
        )

        def step_fn(state, batch):
            return S(step=state.step + 1), {"loss": jnp.float32(1.0)}

        def loader_factory(epoch):
            return [{"x": jnp.zeros((1,))}] * 10

        train_loop.run_training(
            "t", S(step=jnp.int32(0)), step_fn, loader_factory,
            max_steps=10, log_dir=str(tmp_path), ckpt_dir=str(tmp_path),
            log_every=100, val_every=2,
            eval_step=lambda s, b: {"loss": jnp.float32(0.5)},
            valid_loader_factory=loader_factory,
            save_every_n_vals=2,
        )
        # 5 validations at steps 2,4,6,8,10 -> saves at the 2nd and 4th
        # (steps 4 and 8, with the val metric) plus the final save
        assert saves == [(4, 0.5), (8, 0.5), (10, None)]
