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

import logging
from typing import FrozenSet, Tuple

log = logging.getLogger("megatts2_tpu.shape_guard")

MEL_PAD_MULTIPLE = 64  # keep in sync with datasets.MEL_PAD_MULTIPLE

# (B, T_target, T_timbre) triples measured to abort the remote compiler
# (tools/probe_crash_geometry.py --out ...; BENCHMARKS.md "Input pipeline"
# caveat).  The timbre bucket is the pow2 value datasets.py emits.
KNOWN_BAD: FrozenSet[Tuple[int, int, int]] = frozenset({
    (8, 256, 512),
    (8, 256, 2048),
})

# Measured-good (B, T_target) anchors — shapes EXECUTED (not just
# compiled) at scale on the real chip, safe for every reachable timbre
# bucket ≤ 2048: (8, 320) ran 1250 stage-2 batches across timbre buckets
# 256/512/1024 (round-4 10k-utterance extraction); (12, 256) ran the
# 50k-step GAN training; (8, 512) ran the round-1..3 training benches.
KNOWN_GOOD: FrozenSet[Tuple[int, int]] = frozenset({
    (8, 320),
    (12, 256),
    (8, 512),
})

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
    # Prefer a MEASURED-GOOD anchor over a merely not-known-bad shape: an
    # unprobed T' could itself trip the compiler bug.  If an executed-at-
    # scale anchor for this B sits within 2 pad steps, take it.
    if t != t_target and (b, t) not in KNOWN_GOOD:
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
            "a measured-good anchor" if (b, t) in KNOWN_GOOD
            else "not known bad, but unprobed — consider extending the "
                 "grid with tools/probe_crash_geometry.py",
        )
    return t
