"""Guard against remote-TPU-compiler crash geometries (round-3 verdict #4).

Certain GAN train-step batch shapes abort the axon remote compiler with an
int32-overflow ``Check failed: llo::CouldLeS32`` (HTTP 500 / SIGABRT) — a
compiler bug, not a framework limit, but one a user-chosen config could
trip through ``data/datasets.py``'s dynamic buckets (the reference's
dynamic batching never crashes its compiler, modules/datamodule.py:346-376).
This module encodes the MEASURED bad geometries
(``tools/probe_crash_geometry.py`` AOT-compiles the real train step over a
(B, T_target, T_timbre) grid) and pads the target-frame bucket up to the
nearest safe shape, logging once per adjustment.

Padding T_target is semantically free: ``mel_targets`` is already
zero-padded to a bucket multiple and every consumer masks by
``mel_target_lens`` (loss sums are over true lengths), so a larger bucket
only costs some extra padded compute — vastly cheaper than a compiler
SIGABRT mid-training.
"""
from __future__ import annotations

import json
import logging
import os
from typing import FrozenSet, Tuple

log = logging.getLogger("megatts2_tpu.shape_guard")

MEL_PAD_MULTIPLE = 64  # keep in sync with datasets.MEL_PAD_MULTIPLE

# Fallbacks if the bundled probe artifact is missing: the two triples
# observed to abort the compiler in rounds 3-4, and the (B, T) anchors
# EXECUTED at scale on the real chip ((8, 320): 1250 stage-2 batches
# across timbre buckets 256/512/1024; (12, 256): the 50k-step GAN run;
# (8, 512): the round-1..3 training benches).
_FALLBACK_BAD: FrozenSet[Tuple[int, int, int]] = frozenset({
    (8, 256, 512),
    (8, 256, 2048),
})
_FALLBACK_GOOD: FrozenSet[Tuple[int, int]] = frozenset({
    (8, 320),
    (12, 256),
    (8, 512),
})


def _load_grid():
    """Load the measured crash-geometry map from the probe artifact
    (``tools/probe_crash_geometry.py --emit``; bundled as
    ``data/crash_grid.json``, overridable via ``MEGATTS2_CRASH_GRID``).
    Returns (bad triples, executed-good (B,T) anchors, compiled-good
    triples)."""
    path = os.environ.get("MEGATTS2_CRASH_GRID") or os.path.join(
        os.path.dirname(__file__), "crash_grid.json")
    if os.path.exists(path):
        try:
            with open(path) as f:
                d = json.load(f)
            return (
                frozenset(tuple(x) for x in d.get("bad", [])),
                frozenset(tuple(x) for x in d.get("good_executed", [])),
                frozenset(tuple(x) for x in d.get("good_compiled", [])),
            )
        except Exception as e:  # corrupt artifact: fail safe, warn once
            log.warning("crash grid artifact %s unreadable (%s); using "
                        "built-in fallbacks", path, e)
    return _FALLBACK_BAD, _FALLBACK_GOOD, frozenset()


KNOWN_BAD, KNOWN_GOOD, KNOWN_GOOD_COMPILED = _load_grid()

_warned: set = set()


def possible_timbre_buckets(max_timbre_frames: int) -> Tuple[int, ...]:
    """The pow2 timbre buckets GANBatchBuilder can emit (128, 256, ...,
    capped at max_timbre_frames), plus the cap itself if not pow2."""
    out = []
    b = 128
    while b < max_timbre_frames:
        out.append(b)
        b *= 2
    out.append(max_timbre_frames)
    return tuple(out)


def is_known_bad(b: int, t_target: int, t_timbre: int) -> bool:
    return (b, t_target, t_timbre) in KNOWN_BAD


def safe_target_frames(b: int, t_target: int, max_timbre_frames: int) -> int:
    """Smallest T' >= t_target (stepping by MEL_PAD_MULTIPLE) such that
    (b, T', tm) is not a known compiler-crash geometry for ANY timbre
    bucket the builder could later pick.  Called before the timbre crop
    is decided, so it must be safe against all reachable buckets."""
    buckets = possible_timbre_buckets(max_timbre_frames)
    t = t_target
    # KNOWN_BAD is finite, so this terminates (bounded by max bad T + 64).
    while any(is_known_bad(b, t, tm) for tm in buckets):
        t += MEL_PAD_MULTIPLE
    # Prefer a MEASURED-GOOD shape over a merely not-known-bad one: an
    # unprobed T' could itself trip the compiler bug.  Executed-at-scale
    # anchors count, and so does a T' whose every reachable timbre bucket
    # compiled clean in the probe grid.  Take the nearest within 2 pad
    # steps.
    def _measured_good(tt: int) -> bool:
        return (b, tt) in KNOWN_GOOD or all(
            (b, tt, tm) in KNOWN_GOOD_COMPILED for tm in buckets)

    if t != t_target and not _measured_good(t):
        for tg in (t + k * MEL_PAD_MULTIPLE for k in (1, 2)):
            if _measured_good(tg):
                t = tg
                break
        else:
            for tg in sorted(tg for (bg, tg) in KNOWN_GOOD
                             if bg == b and t <= tg <= t + 2 * MEL_PAD_MULTIPLE):
                t = tg
                break
    if t != t_target and (b, t_target) not in _warned:
        _warned.add((b, t_target))
        log.warning(
            "batch shape (B=%d, T=%d) is a known remote-compiler crash "
            "geometry with reachable timbre buckets %s; padding the "
            "target bucket to T=%d (%s; semantically free — losses mask "
            "by mel_target_lens).  See BENCHMARKS.md 'Input pipeline' "
            "and tools/probe_crash_geometry.py.",
            b, t_target, buckets, t,
            "a measured-good shape" if _measured_good(t)
            else "not known bad, but unprobed — consider extending the "
                 "grid with tools/probe_crash_geometry.py",
        )
    return t
