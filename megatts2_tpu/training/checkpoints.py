"""Orbax checkpointing (save/restore full train states).

Replaces Lightning ModelCheckpoint (reference ``configs/*.yaml:12-18``):
``save`` writes the whole train-state pytree (params, opt state, VQ stats,
RNG, step); ``restore`` rebuilds it against an abstract target.  Top-k /
save-last policy is handled by the train loop (``train_loop.py``).
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def save_checkpoint(ckpt_dir: str, state: Any, step: int, keep: int = 5) -> str:
    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, f"step_{step}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    _prune(ckpt_dir, keep)
    return path


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = []
    for name in os.listdir(ckpt_dir):
        if name.startswith("step_"):
            try:
                steps.append((int(name.split("_")[1]), name))
            except ValueError:
                pass
    if not steps:
        return None
    return os.path.join(ckpt_dir, max(steps)[1])


def restore_pytree(path: str) -> Any:
    """Restore a checkpoint as a raw pytree (no target template)."""
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path))


def load_generator_from_orbax(path: str) -> dict:
    """Load a GANTrainState checkpoint (dir of step_N/ or a step dir) and
    return MegaG apply-variables {'params', 'vq_stats'}."""
    if not os.path.basename(path).startswith("step_"):
        latest = latest_checkpoint(path)
        if latest is None:
            raise FileNotFoundError(f"no step_* checkpoints under {path}")
        path = latest
    tree = restore_pytree(path)
    return {"params": tree["g_params"], "vq_stats": tree["vq_stats"]}


def restore_checkpoint(path: str, target: Any) -> Any:
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, target)
    return ckptr.restore(os.path.abspath(path), abstract)


def _prune(ckpt_dir: str, keep: int) -> None:
    steps = sorted(
        (int(n.split("_")[1]), n)
        for n in os.listdir(ckpt_dir)
        if n.startswith("step_") and n.split("_")[1].isdigit()
    )
    import shutil

    for _, name in steps[:-keep]:
        shutil.rmtree(os.path.join(ckpt_dir, name), ignore_errors=True)
