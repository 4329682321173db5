"""Generic training loops for the three stages.

Mirrors the reference trainers' cadence (``models/trainer.py``): periodic
scalar logging, periodic validation (mean loss over the valid loader),
checkpointing (top-k by the monitored val metric + last, matching the
reference's ModelCheckpoint on ``val/loss_re`` / ``val/loss``,
configs/config_gan.yaml:12-18).  Runs the jitted train step over
the device mesh: params replicated (or TP-sharded), batch sharded over
'data' — GSPMD's answer to Lightning DDP.
"""
from __future__ import annotations

import os
from typing import Callable, Dict, Iterable, Optional

import jax
import numpy as np

from ..parallel import make_mesh, shard_batch
from ..utils.logging import MetricsLogger, ProfilerHook, StepTimer
from .checkpoints import save_checkpoint


def _host_rss_gb() -> float:
    """This process' resident set (GB) from /proc/self/statm (no psutil)."""
    try:
        with open("/proc/self/statm") as f:
            pages = int(f.read().split()[1])
        return round(pages * os.sysconf("SC_PAGE_SIZE") / 1e9, 2)
    except Exception:  # non-Linux
        return float("nan")


def run_training(
    name: str,
    state,
    train_step: Callable,
    train_loader_factory: Callable[[int], Iterable],
    max_steps: int,
    log_dir: str = "logs",
    ckpt_dir: Optional[str] = None,
    log_every: int = 100,
    val_every: int = 1500,
    eval_step: Optional[Callable] = None,
    valid_loader_factory: Optional[Callable[[int], Iterable]] = None,
    mesh=None,
    trace_dir: Optional[str] = None,
    keep_ckpts: int = 5,
    artifact_fn: Optional[Callable] = None,
    monitor: str = "loss",
    save_every_n_vals: int = 1,
):
    mesh = mesh or make_mesh()
    logger = MetricsLogger(log_dir, name)
    timer = StepTimer()
    profiler = ProfilerHook(trace_dir)
    jit_step = jax.jit(train_step, donate_argnums=(0,))
    jit_eval = jax.jit(eval_step) if eval_step is not None else None

    step = int(np.asarray(state.step))
    epoch = 0
    n_vals = 0
    while step < max_steps:
        for batch in train_loader_factory(epoch):
            if step >= max_steps:
                break
            profiler.before_step(step)
            state, metrics = jit_step(state, shard_batch(batch, mesh))
            profiler.after_step(step)
            timer.tick()
            step += 1
            if step % log_every == 0:
                m = {k: float(np.asarray(v)) for k, v in metrics.items()}
                m["steps_per_sec"] = timer.steps_per_sec
                # host RSS: long runs on the remote-TPU plugin leak a
                # fraction of upload staging buffers (a 27k-step PLM run
                # reached 130 GB and was OOM-killed before this existed);
                # the curve makes that failure visible long before it kills
                m["host_rss_gb"] = _host_rss_gb()
                logger.log(step, m, prefix="train/")
            if val_every and step % val_every == 0 and jit_eval and valid_loader_factory:
                vals: Dict[str, list] = {}
                first_batch = None
                for vb in valid_loader_factory(epoch):
                    if first_batch is None:
                        first_batch = vb
                    out = jit_eval(state, shard_batch(vb, mesh))
                    for k, v in out.items():
                        if np.ndim(v) == 0:
                            vals.setdefault(k, []).append(float(np.asarray(v)))
                vm = {k: float(np.mean(v)) for k, v in vals.items()}
                logger.log(step, vm, prefix="val/")
                if artifact_fn is not None and first_batch is not None:
                    try:
                        artifact_fn(state, first_batch, step)
                    except Exception as e:  # artifacts must never kill training
                        print(f"[val artifacts] skipped: {e}")
                n_vals += 1
                # a full-size save costs ~1.5 min over the remote tunnel;
                # save_every_n_vals>1 keeps the val curve dense while
                # checkpointing sparsely (the final save below always runs)
                if ckpt_dir and n_vals % max(save_every_n_vals, 1) == 0:
                    save_checkpoint(
                        ckpt_dir, state, step, keep=keep_ckpts,
                        metric=vm.get(monitor),
                    )
        epoch += 1
    if ckpt_dir:
        save_checkpoint(ckpt_dir, state, step, keep=keep_ckpts)
    logger.close()
    return state
