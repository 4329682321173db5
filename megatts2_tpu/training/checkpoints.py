"""Orbax checkpointing (save/restore full train states).

Replaces Lightning ModelCheckpoint (reference ``configs/*.yaml:12-18``):
``save`` writes the whole train-state pytree (params, opt state, VQ stats,
RNG, step).  Retention matches the reference's ModelCheckpoint policy —
top-``keep`` by the monitored validation metric (lower is better, e.g.
``val/loss_re`` for the GAN stage) PLUS the most recent step
(``save_last: true``).  Metric scores persist in a ``scores.json`` sidecar
so the policy survives resume.  Saves without a metric are kept only while
they are the latest.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp


def _scores_path(ckpt_dir: str) -> str:
    return os.path.join(ckpt_dir, "scores.json")


def _load_scores(ckpt_dir: str) -> Dict[str, float]:
    try:
        with open(_scores_path(ckpt_dir)) as f:
            return {k: float(v) for k, v in json.load(f).items()}
    except (OSError, ValueError):
        return {}


def save_checkpoint(
    ckpt_dir: str, state: Any, step: int, keep: int = 5,
    metric: Optional[float] = None,
) -> str:
    """Save ``state`` under ``step_{step}`` and prune to the top-``keep``
    checkpoints by ``metric`` (ascending) + the latest step.

    The state is fetched to host via the packed single-transfer path first
    (``packed_fetch.fetch_pytree``) so orbax only touches host memory —
    on the remote-tunnel TPU target the per-leaf ``device_get`` orbax
    would otherwise do dominates save time (BENCHMARKS.md "Checkpoint
    save cost").  ``MEGATTS2_PACKED_CKPT=0`` restores the direct path.

    Saves into one ``ckpt_dir`` are serialized across PROCESSES by an
    exclusive ``flock`` on ``.save.lock``: two trainers accidentally
    sharing a checkpoint dir (observed in round 5 — a stale driver and
    its relaunch both fitting the same stage) would otherwise destroy
    each other mid-write, because the same-step tmp cleanup below deletes
    the OTHER writer's in-flight ``step_N.orbax-checkpoint-tmp`` dir
    (tensorstore then dies with rename-ENOENT).  The lock converts that
    into a loud wait; the stale-tmp cleanup is only safe while holding it.
    """
    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, f"step_{step}")
    import fcntl as _fcntl
    import glob as _glob
    import logging as _logging
    import shutil as _shutil

    lock_f = open(os.path.join(ckpt_dir, ".save.lock"), "w")
    try:
        try:
            _fcntl.flock(lock_f, _fcntl.LOCK_EX | _fcntl.LOCK_NB)
        except OSError:
            _logging.getLogger("megatts2_tpu.checkpoints").warning(
                "another process is saving into %s (two trainers sharing "
                "one ckpt_dir is almost certainly a launch bug); waiting "
                "for its save to finish.", ckpt_dir)
            _fcntl.flock(lock_f, _fcntl.LOCK_EX)
        return _save_locked(ckpt_dir, path, state, step, keep, metric,
                            _glob, _shutil)
    finally:
        try:
            _fcntl.flock(lock_f, _fcntl.LOCK_UN)
        finally:
            lock_f.close()


def _save_locked(ckpt_dir, path, state, step, keep, metric, _glob, _shutil):
    # Crash-resume hygiene: a save killed mid-write leaves a
    # ``step_N.orbax-checkpoint-tmp*`` dir whose deterministic name
    # collides when the resumed run re-saves the SAME step (observed on
    # the 50k-run SIGKILL-at-20000).  Only this step's tmp dirs can
    # collide, so the glob is scoped to them — a broad ``step_*`` sweep
    # would destroy an in-flight save if a second writer ever shared the
    # dir (advisor r4); a LIVE same-step writer is excluded by the flock.
    for stale in _glob.glob(
        os.path.join(ckpt_dir, f"step_{step}.orbax-checkpoint-tmp*")
    ):
        _shutil.rmtree(stale, ignore_errors=True)
    if os.environ.get("MEGATTS2_PACKED_CKPT", "1") != "0":
        from .packed_fetch import fetch_pytree

        try:
            state = fetch_pytree(state)
        except Exception as e:  # pragma: no cover - device-OOM/tunnel path
            # The packed path materializes one transient copy of the state
            # on device (can OOM) and rides the remote tunnel (can 5xx /
            # time out).  The per-leaf orbax fetch below is ALWAYS safe,
            # so fall back on ANY failure rather than string-matching the
            # error and killing a long run at a save (advisor r4).
            import logging

            logging.getLogger("megatts2_tpu.checkpoints").warning(
                "packed checkpoint fetch failed (%s: %s); falling back to "
                "the per-leaf device_get path for this save.  Set "
                "MEGATTS2_PACKED_CKPT=0 to silence.", type(e).__name__, e,
            )
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    scores = _load_scores(ckpt_dir)
    if metric is not None:
        scores[str(step)] = float(metric)
        with open(_scores_path(ckpt_dir), "w") as f:
            json.dump(scores, f)
    _prune(ckpt_dir, keep, scores)
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
    # EMA runs validate/select on the smoothed weights — export those
    params = tree.get("g_ema") or tree["g_params"]
    return {"params": params, "vq_stats": tree["vq_stats"]}


def load_vocoder_from_orbax(path: str) -> dict:
    """Load a VocoderTrainState checkpoint (training/vocoder_trainer.py)
    and return the generator params (HiFi-GAN or Vocos, per the config the
    stage was trained with)."""
    if not os.path.basename(path).startswith("step_"):
        latest = latest_checkpoint(path)
        if latest is None:
            raise FileNotFoundError(f"no step_* checkpoints under {path}")
        path = latest
    return restore_pytree(path)["g_params"]


def restore_checkpoint(path: str, target: Any) -> Any:
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, target)
    return ckptr.restore(os.path.abspath(path), abstract)


def _prune(ckpt_dir: str, keep: int, scores: Optional[Dict[str, float]] = None) -> None:
    """Keep the ``keep`` best checkpoints by monitored metric (ascending;
    unscored steps rank last) + the latest step; remove the rest."""
    import shutil

    if scores is None:
        scores = _load_scores(ckpt_dir)
    steps = sorted(
        (int(n.split("_")[1]), n)
        for n in os.listdir(ckpt_dir)
        if n.startswith("step_") and n.split("_")[1].isdigit()
    )
    if not steps:
        return
    latest = steps[-1][0]
    inf = float("inf")
    by_score = sorted(steps, key=lambda sn: (scores.get(str(sn[0]), inf), -sn[0]))
    keep_steps = {s for s, _ in by_score[:keep]} | {latest}
    for s, name in steps:
        if s not in keep_steps:
            shutil.rmtree(os.path.join(ckpt_dir, name), ignore_errors=True)
            scores.pop(str(s), None)
    if scores:
        with open(_scores_path(ckpt_dir), "w") as f:
            json.dump(scores, f)


def best_checkpoint(ckpt_dir: str) -> Optional[str]:
    """Path of the best-scored checkpoint (falls back to latest)."""
    scores = _load_scores(ckpt_dir)
    live = {
        n.split("_")[1]: n
        for n in (os.listdir(ckpt_dir) if os.path.isdir(ckpt_dir) else [])
        if n.startswith("step_")
    }
    scored = [(v, k) for k, v in scores.items() if k in live]
    if not scored:
        return latest_checkpoint(ckpt_dir)
    return os.path.join(ckpt_dir, live[min(scored)[1]])
