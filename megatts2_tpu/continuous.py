"""Continuous-batching synthesis engine.

No reference counterpart (the reference is a single-utterance script,
``models/megatts2.py:326-375``); this is the serving pattern LLM engines
use (iteration-level scheduling), adapted to the TTS cascade and TPU
static shapes:

* ``S`` fixed slots share one per-slot-position KV cache
  (``MegaPLM(per_slot=True)`` — every batch row sits at its own decode
  position, scattered cache writes, per-row causal masks).
* A request is admitted into a free slot at any chunk boundary: its
  content path (MRTE → ADM → length-regulate, ``stream_prep``) runs once,
  then the slot's cache/codes are reset in place.
* ``tick`` advances ALL slots ``F/8`` prosody codes in one dispatch
  (per-token host loops would pay the tunnel round trip per token);
  finished slots freeze their code buffer (cache junk is irrelevant —
  emits read codes, and the slot is reset at the next admission).
* ``emit_slots`` produces one F-frame audio chunk per slot per tick with
  the same RF-exact windows as models/streaming.py, batched over slots.

Per-request output is bit-equal to the one-shot ``synthesize`` at the
engine's frame budget (tests/test_continuous.py), so continuous batching
is purely a throughput/latency scheduling change, not a quality change.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import HIFIGAN_HOP_LENGTH
from .config import HiFiGANConfig, MegaADMConfig, MegaGConfig, MegaPLMConfig
from .models.megatts import vocode
from .models.megag import MegaG
from .models.plm import MegaPLM
from .models.streaming import (
    _roundup,
    decoder_rf_frames,
    vocoder_rf_frames,
    stream_prep,
)


@functools.partial(
    jax.jit, static_argnames=("n_layers", "S", "Tc", "HD", "dtype")
)
def engine_init(n_layers: int, S: int, Tc: int, HD: int, dtype):
    """Allocate the per-slot KV cache: per-layer (S, Tc, HD) buffer
    tuples (the fast_decode layout — separate loop carries, in-place
    one-token writes).  ``Tc`` is the full cache length — generated-code
    budget plus the engine's prompt budget when prompting is enabled."""
    k = tuple(jnp.zeros((S, Tc, HD), dtype) for _ in range(n_layers))
    v = tuple(jnp.zeros((S, Tc, HD), dtype) for _ in range(n_layers))
    return {"k": k, "v": v}


@functools.partial(
    jax.jit, static_argnames=("plm_cfg", "Tc_total", "dtype", "quant")
)
def prefill_slots(
    plm_params,
    prompt_tc: jnp.ndarray,  # (A, Pe, D) code-rate content latents
    prev_prompt: jnp.ndarray,  # (A, Pe) int32: BOS ++ prompt_codes[:-1]
    plm_cfg: MegaPLMConfig,
    Tc_total: int,
    dtype,
    quant: bool,
):
    """Batched block-causal prompt prefill for an admission wave.

    Runs the ordinary (non-per-slot) ``MegaPLM.prefill`` over the wave —
    every admitted request's prompt occupies cache positions [0, Pe), so
    the rows can then be scattered into the per-slot engine cache
    (``admit_slots_prompted``).  The cache pytree leaf shapes match the
    engine cache exactly because ``max_decode_len`` is the same.

    int8-only when ``quant``: prefill runs through flax QDense, which
    rejects nibble-packed int4 trees (the engine guards at construction,
    quantization/weight_only.py::is_int4_tree)."""
    model = MegaPLM(
        plm_cfg, dtype=dtype, decode=True, max_decode_len=Tc_total, quant=quant
    )
    _, cache = model.apply(
        {"params": plm_params},
        prompt_tc,
        prev_prompt,
        method=MegaPLM.prefill,
        mutable=["cache"],
    )
    att = cache["cache"]["plm"]["layers"]["attn"]
    return {"k": att["k"], "v": att["v"]}  # (num_layers, A, L, HD) stacks


def _admit_select(carry, slots):
    """(match helpers) per engine slot: does the wave write it, and which
    wave row wins (first match — duplicate padding rows are idempotent)."""
    S = carry["prev"].shape[0]
    match = slots[None, :] == jnp.arange(S, dtype=slots.dtype)[:, None]  # (S, A)
    return match.any(axis=1), jnp.argmax(match, axis=1)


def _admit_common(carry, has, wi, tc_plm_a, tc_expand_a, total_codes_a, prev_a):
    S = has.shape[0]

    def sel(new, old, n_extra):
        m = has.reshape((S,) + (1,) * n_extra)
        return jnp.where(m, new, old)

    return dict(
        carry,
        tc_plm=sel(jnp.take(tc_plm_a, wi, axis=0).astype(carry["tc_plm"].dtype),
                   carry["tc_plm"], 2),
        tc_expand=sel(jnp.take(tc_expand_a, wi, axis=0).astype(carry["tc_expand"].dtype),
                      carry["tc_expand"], 2),
        codes=sel(jnp.zeros_like(carry["codes"]), carry["codes"], 1),
        prev=sel(jnp.take(prev_a, wi), carry["prev"], 0),
        pos=sel(jnp.zeros_like(carry["pos"]), carry["pos"], 0),
        total=sel(jnp.take(total_codes_a, wi), carry["total"], 0),
    )


def _total_codes(nf: jnp.ndarray, Tc: int, Tmax: int, rv: int, rd: int):
    """Codes a slot must generate to emit ``nf`` frames (receptive-field
    lookahead included) — computed IN-GRAPH from the device ``n_frames``
    so admission never needs an ``n_frames`` host sync on its critical
    path (the online loop defers that sync past the next tick dispatch)."""
    return jnp.minimum(Tc, -(-jnp.minimum(nf + rv + rd, Tmax) // 8)).astype(
        jnp.int32
    )


@functools.partial(
    jax.jit,
    static_argnames=("Tc", "Tmax", "rv", "rd"),
    donate_argnums=(0,),
)
def admit_slots(
    carry: dict,
    slots: jnp.ndarray,  # (A,) int32 target slots (may repeat — first wins)
    tc_plm_a: jnp.ndarray,  # (A, Tc, D)
    tc_expand_a: jnp.ndarray,  # (A, Tf, H)
    nf_a: jnp.ndarray,  # (A,) int32 generated-frame counts (device)
    bos: jnp.ndarray,  # scalar int32
    Tc: int,
    Tmax: int,
    rv: int,
    rd: int,
):
    """Reset A slots in place and install their new requests' content —
    ONE dispatch per admission group (prep is batched by the caller).
    Cache rows need no zeroing: the per-row causal mask attends positions
    <= the slot's own decode position, every one of which the slot's own
    steps rewrite first."""
    has, wi = _admit_select(carry, slots)
    prev_a = jnp.full(slots.shape, bos, jnp.int32)
    carry = _admit_common(carry, has, wi, tc_plm_a, tc_expand_a,
                          _total_codes(nf_a, Tc, Tmax, rv, rd), prev_a)
    if "plen" in carry:
        carry["plen"] = jnp.where(has, 0, carry["plen"])
    return carry


@functools.partial(
    jax.jit,
    static_argnames=("Tc", "Tmax", "rv", "rd"),
    donate_argnums=(0,),
)
def admit_slots_prompted(
    carry: dict,
    slots: jnp.ndarray,  # (A,) int32 target slots (may repeat — first wins)
    tc_plm_a: jnp.ndarray,  # (A, Tc, D)
    tc_expand_a: jnp.ndarray,  # (A, Tf, H)
    nf_a: jnp.ndarray,  # (A,) int32 generated-frame counts (device)
    prev_a: jnp.ndarray,  # (A,) int32: BOS, or last prompt code
    plen_a: jnp.ndarray,  # (A,) int32 prompt length (0 = unprompted)
    pf_cache: dict,  # prefill_slots output: flax stacks (num_layers, A, L, HD)
    Tc: int,
    Tmax: int,
    rv: int,
    rd: int,
):
    """Admission with in-context prosody prompts: install each request's
    content AND its prefilled prompt KV rows in one dispatch.

    Vectorized gather-select: for each engine slot, find its writer row
    in the wave (first match wins — duplicate padding rows are
    idempotent) and masked-select new vs old.  Unprompted rows (plen 0)
    carry junk prefill K/V, which is safe: the per-row causal mask
    attends positions ``<= plen+pos`` and every position below is
    rewritten by the slot's own decode steps before being attended."""
    has, wi = _admit_select(carry, slots)
    S = has.shape[0]
    plen_s = jnp.take(plen_a, wi)

    k_stack, v_stack = pf_cache["k"], pf_cache["v"]  # (num_layers, A, L, HD)

    def scatter(buf, stack, l):
        new = jnp.take(stack[l], wi, axis=0).astype(buf.dtype)  # (S, L, HD)
        return jnp.where(has[:, None, None], new, buf)

    cache = {
        "k": tuple(scatter(b, k_stack, l) for l, b in enumerate(carry["cache"]["k"])),
        "v": tuple(scatter(b, v_stack, l) for l, b in enumerate(carry["cache"]["v"])),
    }
    carry = _admit_common(carry, has, wi, tc_plm_a, tc_expand_a,
                          _total_codes(nf_a, Tc, Tmax, rv, rd), prev_a)
    carry["cache"] = cache
    carry["plen"] = jnp.where(has, plen_s, carry["plen"])
    return carry


@functools.partial(
    jax.jit,
    static_argnames=("plm_cfg", "K", "Tc", "Pe", "dtype", "quant"),
    donate_argnums=(1,),
)
def engine_tick(
    plm_params,
    carry: dict,
    plm_cfg: MegaPLMConfig,
    K: int,
    Tc: int,
    dtype,
    quant: bool,
    Pe: int = 0,
):
    """Advance every live slot K prosody codes (greedy).  Done slots
    freeze their code buffer; their cache keeps absorbing junk writes at
    the clamped last position, which nothing reads.  ``Pe`` is the static
    prompt budget: the cache is ``Tc + Pe`` long and a prompted slot's
    decode runs at absolute positions ``plen + pos`` (prompt in [0, plen),
    written at admission by ``prefill_slots``/``admit_slots_prompted``).

    Body = ``fast_decode.plm_fast_tick`` (unrolled layers, per-layer
    cache buffers as loop carries) — same re-schedule that took the batch
    decode 25.4 → 17.1 ms on v5e (models/fast_decode.py)."""
    from .models.fast_decode import plm_fast_tick

    cks, cvs, codes, prev, pos = plm_fast_tick(
        plm_params, plm_cfg, carry["tc_plm"],
        carry["cache"]["k"], carry["cache"]["v"],
        carry["codes"], carry["prev"], carry["pos"], carry["plen"],
        carry["total"], K, dtype=dtype, quant=quant,
    )
    return dict(carry, cache={"k": cks, "v": cvs}, prev=prev, pos=pos,
                codes=codes)


@functools.partial(
    jax.jit,
    static_argnames=(
        "g_cfg", "adm_cfg", "plm_cfg", "Tmax", "Tc", "rv", "rd", "dtype",
        "quant", "prompted", "Pe",
    ),
    donate_argnums=(4,),
)
def prep_admit(
    g_vars,
    adm_params,
    plm_params,
    bos,  # scalar int32 array
    carry: dict,
    slots: jnp.ndarray,  # (A,)
    phone: jnp.ndarray,  # (A, Tp) — ONE shared static bucket
    lens: jnp.ndarray,  # (A,)
    mels: jnp.ndarray,  # (A, Tm, 80)
    ptc: jnp.ndarray,  # (A, Pe, D) prompt latents (zeros when unprompted)
    prev_prompt: jnp.ndarray,  # (A, Pe)
    prev_a: jnp.ndarray,  # (A,)
    plen_a: jnp.ndarray,  # (A,)
    g_cfg: MegaGConfig,
    adm_cfg: MegaADMConfig,
    plm_cfg: MegaPLMConfig,
    Tmax: int,
    Tc: int,
    rv: int,
    rd: int,
    dtype,
    quant: bool,
    prompted: bool,
    Pe: int,
):
    """Fused admission: content prep (MRTE → ADM → regulate → pool)
    [+ prompt prefill] + slot install in ONE dispatch.

    Requires a single static phone bucket for the whole wave
    (``ContinuousEngine(admit_tp_bucket=...)``) — per-request pow-16
    buckets need one prep dispatch per bucket, which dominated offline
    engine wall time on the tunnel target (~3 dispatches per admission
    wave).  Returns ``(carry, n_frames)`` — the host syncs only the tiny
    ``n_frames`` vector to plan emits."""
    tce, tcp, nf = stream_prep.__wrapped__(
        g_vars, adm_params, g_cfg, adm_cfg, phone, lens, mels, Tmax, dtype
    )
    if prompted:
        pf = prefill_slots.__wrapped__(
            plm_params, ptc, prev_prompt, plm_cfg, Tc + Pe, dtype, quant
        )
        carry = admit_slots_prompted.__wrapped__(
            carry, slots, tcp, tce, nf, prev_a, plen_a, pf, Tc, Tmax, rv, rd
        )
    else:
        carry = admit_slots.__wrapped__(
            carry, slots, tcp, tce, nf, bos, Tc, Tmax, rv, rd
        )
    return carry, nf


@functools.partial(
    jax.jit,
    static_argnames=(
        "plm_cfg", "g_cfg", "hifi_cfg", "K", "Tc", "F", "rv", "rd", "N",
        "dtype", "quant", "Pe",
    ),
    donate_argnums=(3,),
)
def engine_tick_emit_multi(
    plm_params,
    g_vars,
    hifi_params,
    carry: dict,
    a_mat: jnp.ndarray,  # (N, S) per-tick, per-slot emit frame starts
    plm_cfg: MegaPLMConfig,
    g_cfg: MegaGConfig,
    hifi_cfg: HiFiGANConfig,
    K: int,
    Tc: int,
    F: int,
    rv: int,
    rd: int,
    N: int,
    dtype,
    quant: bool,
    Pe: int = 0,
):
    """``N`` fused ticks in ONE dispatch → wavs (N, S, F·hop).

    The per-tick schedule is deterministic (codes advance exactly K per
    tick), so when no admission can occur for the next N ticks the host
    precomputes every tick's emit plan (``a_mat``) and pays ONE dispatch
    round trip instead of N — on this tunnel target each saved dispatch
    is ~75 ms, which is what made the offline engine 3× slower than
    bucketed batches (BENCHMARKS.md round-2 honest numbers)."""

    def one(carry, a_vec):
        carry = engine_tick.__wrapped__(
            plm_params, carry, plm_cfg, K, Tc, dtype, quant, Pe
        )
        wavs = emit_slots.__wrapped__(
            g_vars, hifi_params, g_cfg, hifi_cfg, carry, a_vec, F, rv, rd, dtype
        )
        return carry, wavs

    return jax.lax.scan(one, carry, a_mat)


@functools.partial(
    jax.jit,
    static_argnames=("g_cfg", "hifi_cfg", "F", "rv", "rd", "dtype"),
)
def emit_slots(
    g_vars: dict,
    hifi_params: dict,
    g_cfg: MegaGConfig,
    hifi_cfg: HiFiGANConfig,
    carry: dict,
    a_vec: jnp.ndarray,  # (S,) per-slot frame starts (multiples of F)
    F: int,
    rv: int,
    rd: int,
    dtype,
):
    """One F-frame audio chunk per slot, frames [a_s, a_s+F) — the batched
    twin of streaming.emit_chunk (slots without a ready chunk pass a junk
    ``a`` and the host discards the row)."""
    Tmax = carry["tc_expand"].shape[1]
    W = F + 2 * (rv + rd)
    s_vec = jnp.clip(a_vec - rv - rd, 0, Tmax - W)
    tc_win = jax.vmap(
        lambda tc, s: jax.lax.dynamic_slice_in_dim(tc, s, W, axis=0)
    )(carry["tc_expand"], s_vec)  # (S, W, H)
    codes_win = jax.vmap(
        lambda c, s: jax.lax.dynamic_slice_in_dim(c, s // 8, W // 8, axis=0)
    )(carry["codes"], s_vec)  # (S, W/8)

    g = MegaG(g_cfg, dtype=dtype)
    zq = g.apply(g_vars, codes_win[None], method=lambda m, c: m.vqpe.vq.decode(c))
    zq = jnp.repeat(zq, 8, axis=1)
    mel_win = g.apply(
        g_vars, tc_win, zq, method=lambda m, x, z: m.decode_latents(x, z)
    )  # (S, W, 80)

    mv = jnp.clip(a_vec - rv, s_vec, s_vec + W - (F + 2 * rv))
    mel_v = jax.vmap(
        lambda m, o: jax.lax.dynamic_slice_in_dim(m, o, F + 2 * rv, axis=0)
    )(mel_win, mv - s_vec)
    wav = vocode(hifi_params, hifi_cfg, mel_v.astype(jnp.float32), dtype)
    # (S, (F+2rv)*hop)
    off = (a_vec - mv) * HIFIGAN_HOP_LENGTH
    return jax.vmap(
        lambda w, o: jax.lax.dynamic_slice_in_dim(w, o, F * HIFIGAN_HOP_LENGTH, axis=0)
    )(wav, off).astype(jnp.float32)


class ContinuousEngine:
    """Host-side scheduler over the jitted engine graphs.

    >>> eng = ContinuousEngine(g_vars, plm_params, adm_params, hifi_params,
    ...                        g_cfg, plm_cfg, adm_cfg, hifi_cfg,
    ...                        slots=4, max_frames=1024)
    >>> for req_id, wav in eng.run(requests):  # requests: iterable of dicts
    ...     ...

    A request is ``{"id": ..., "phone": (1,Tp) int32, "lens": (1,),
    "mels_prompt": (1,Tm,80)}``, optionally plus ``prompt_tc`` (P,D) /
    ``prompt_codes`` (P,) — the in-context prosody prompt (requires
    ``prompt_tokens`` > 0 at engine construction).  ``run`` yields
    ``(id, full_wav)`` in completion order.  One tick = one PLM advance +
    one batched emit = two dispatches for up to ``slots`` concurrent
    requests.
    """

    def __init__(
        self,
        g_vars, plm_params, adm_params, hifi_params,
        g_cfg: MegaGConfig = MegaGConfig(),
        plm_cfg: MegaPLMConfig = MegaPLMConfig(),
        adm_cfg: MegaADMConfig = MegaADMConfig(),
        hifi_cfg: HiFiGANConfig = HiFiGANConfig(),
        slots: int = 8,
        max_frames: int = 2048,
        chunk_frames: int = 256,
        dtype: Any = jnp.bfloat16,
        quant: bool = False,
        prompt_tokens: int = 0,
        max_fused_ticks: int = 8,
        admit_tp_bucket: int = 0,
    ):
        """``prompt_tokens`` > 0 enables in-context prosody prompting: a
        request may carry ``prompt_tc``/``prompt_codes`` (stage-2 features,
        see data.datasets.prompt_features), which are fitted to the static
        ``prompt_tokens`` budget (tiled + tail-truncated), block-causally
        prefilled into the slot's KV cache at admission, and decoded past —
        exactly plm_infer's prompt path, per slot."""
        self.params = (g_vars, plm_params, adm_params, hifi_params)
        self.cfgs = (g_cfg, plm_cfg, adm_cfg, hifi_cfg)
        self.S = slots
        self.F = _roundup(chunk_frames, 8)
        self.rv = _roundup(vocoder_rf_frames(hifi_cfg), 8)
        self.rd = _roundup(decoder_rf_frames(g_cfg), 8)
        self.Tmax = max(
            _roundup(max_frames, self.F), self.F + 2 * (self.rv + self.rd)
        )
        self.Tc = self.Tmax // 8
        self.Pe = _roundup(prompt_tokens, 8) if prompt_tokens > 0 else 0
        self.dtype = dtype
        self.quant = quant
        if quant and self.Pe > 0:
            from .quantization.weight_only import is_int4_tree

            if is_int4_tree(plm_params):
                raise NotImplementedError(
                    "prompt prefill (prompt_tokens > 0) runs through flax "
                    "QDense and needs the int8 layout; re-quantize with "
                    "quantize_tree(bits=8) or build with prompt_tokens=0"
                )
        D = plm_cfg.tc_latent_dim
        H = g_cfg.mrte.hidden_size
        n_layers = plm_params["plm"]["layers"]["norm1"]["scale"].shape[0]
        self.carry = dict(
            cache=engine_init(
                n_layers, slots, self.Tc + self.Pe, plm_cfg.d_model, dtype
            ),
            tc_plm=jnp.zeros((slots, self.Tc, D), jnp.float32),
            tc_expand=jnp.zeros((slots, self.Tmax, H), jnp.float32),
            codes=jnp.zeros((slots, self.Tc), jnp.int32),
            prev=jnp.full((slots,), plm_cfg.bos_id, jnp.int32),
            pos=jnp.zeros((slots,), jnp.int32),
            total=jnp.zeros((slots,), jnp.int32),
            plen=jnp.zeros((slots,), jnp.int32),
        )
        # host-side slot table
        self.slot_req: List[Optional[dict]] = [None] * slots
        self.slot_emitted: List[int] = [0] * slots
        self.slot_frames: List[int] = [0] * slots
        self.slot_codes: List[int] = [0] * slots
        self.n_ticks = 0
        # offline mode fuses up to this many ticks per dispatch (each
        # distinct N compiles once; online serving always single-ticks)
        self.max_fused_ticks = max(1, int(max_fused_ticks))
        # >0: pad every admission to ONE static phone bucket and fuse
        # prep+prefill+admit into a single dispatch (_admit_many_fused)
        self.admit_tp_bucket = int(admit_tp_bucket)
        # prep_admit prompted-variants already warmed, keyed by
        # (prompted, Tp, Tm) — see _warm_admit_variant; _warming_admit
        # tracks in-flight warms (initialized here, not lazily, so two
        # concurrent callers can never each create a set and double-warm)
        self._warmed_admit: set = set()
        self._warming_admit: set = set()
        # online loop: the admission wave's n_frames sync is deferred past
        # the next tick dispatch (slot_frames -1 = not yet known; the
        # device-side total comes from admit_slots' in-graph total_codes)
        self._defer_nf = False
        self._pending_nf: Optional[Tuple[Any, list]] = None

    @property
    def slots_busy(self) -> int:
        """Occupied decode slots right now (serving observability —
        exported by ``serve.py --http`` ``/metrics``)."""
        return sum(r is not None for r in self.slot_req)

    def _install(self, pairs, nf_vec) -> None:
        """Fill the host slot table for an admitted wave.  ``nf_vec`` is
        the (S,) DEVICE n_frames vector whose row k corresponds to
        ``pairs[k]``.  Online (``_defer_nf``) the host sync is deferred —
        the next tick dispatches first and ``_resolve_nf`` syncs after."""
        for slot, req in pairs:
            self.slot_req[slot] = req
            self.slot_emitted[slot] = 0
            self.slot_codes[slot] = 0
            self.slot_frames[slot] = -1
        if self._defer_nf:
            self._pending_nf = (nf_vec, list(pairs))
        else:
            nf_host = np.asarray(nf_vec)
            for k, (slot, _) in enumerate(pairs):
                self.slot_frames[slot] = int(nf_host[k])

    def _resolve_nf(self) -> list:
        """Sync a deferred admission wave's n_frames (if pending); returns
        ``[(req, frames)]`` for the caller's totals bookkeeping."""
        if self._pending_nf is None:
            return []
        nf_vec, pairs = self._pending_nf
        self._pending_nf = None
        nf_host = np.asarray(nf_vec)
        out = []
        for k, (slot, req) in enumerate(pairs):
            if self.slot_req[slot] is req:
                self.slot_frames[slot] = int(nf_host[k])
            out.append((req, int(nf_host[k])))
        return out

    def _tick_plan(self) -> Tuple[list, list, bool]:
        """Plan ONE tick: advance the host-side code counters, decide the
        per-slot emit starts, free slots that schedule their final chunk.
        Returns ``(a_vec, [(req, chunk_j, slot)], freed_any)``."""
        Cc = self.F // 8
        for s in range(self.S):
            if self.slot_req[s] is not None:
                self.slot_codes[s] = min(self.slot_codes[s] + Cc, self.Tc)
        a_vec, items, freed = [0] * self.S, [], False
        for s in range(self.S):
            req = self.slot_req[s]
            if req is None:
                continue
            j = self.slot_emitted[s]
            need = min(
                self.Tc,
                -(-min((j + 1) * self.F + self.rv + self.rd, self.Tmax) // 8),
            )
            # slot_frames -1 = deferred-nf admission still unresolved: no
            # emit can be due yet (chunk 0 needs rv+rd lookahead codes,
            # which take >1 tick, and the sync resolves every tick)
            if self.slot_frames[s] < 0:
                continue
            if self.slot_codes[s] >= need and j * self.F < self.slot_frames[s]:
                a_vec[s] = j * self.F
                items.append((req, j, s))
                self.slot_emitted[s] = j + 1
                if (j + 1) * self.F >= self.slot_frames[s]:
                    self.slot_req[s] = None  # free at dispatch time
                    freed = True
        return a_vec, items, freed

    def _prompt_arrays(self, pairs, order):
        """(ptc, prev_prompt, prev, plen) for an admission wave, fitted to
        the engine's static prompt budget (zeros/BOS for unprompted)."""
        from .data.datasets import fit_prompt

        _, plm_cfg, _, _ = self.cfgs
        D = plm_cfg.tc_latent_dim
        S = len(order)
        ptc = np.zeros((S, self.Pe, D), np.float32)
        pcodes = np.zeros((S, self.Pe), np.int32)
        plen = np.zeros((S,), np.int32)
        prev = np.full((S,), plm_cfg.bos_id, np.int32)
        for k, i in enumerate(order):
            r = pairs[i][1]
            if r.get("prompt_codes") is None:
                continue  # unprompted: plen 0, BOS prev, junk prefill row
            t, c = fit_prompt(r["prompt_tc"], r["prompt_codes"], self.Pe)
            ptc[k], pcodes[k] = t[0], c[0]
            plen[k] = self.Pe
            prev[k] = c[0, -1]
        prev_prompt = np.concatenate(
            [np.full((S, 1), plm_cfg.bos_id, np.int32), pcodes[:, :-1]], axis=1
        )
        return ptc, prev_prompt, prev, plen

    def _admit_many_fused(self, pairs: List[Tuple[int, dict]]) -> None:
        """Single-dispatch admission (``admit_tp_bucket`` set): every wave
        request pads to ONE engine-wide static phone bucket, so content
        prep [+ prompt prefill] + slot install fuse into one jit call
        (``prep_admit``) — per-request pow-16 buckets cost one prep
        dispatch per bucket, which dominated offline engine wall time on
        the tunnel target.  Output stays deterministic per request
        because the bucket is an engine constant, not a group property."""
        g_vars, plm_params, adm_params, _ = self.params
        g_cfg, plm_cfg, adm_cfg, _ = self.cfgs
        Tp = self.admit_tp_bucket
        for _, r in pairs:
            if r["phone"].shape[1] > Tp:
                raise ValueError(
                    f"request has {r['phone'].shape[1]} phones > "
                    f"admit_tp_bucket={Tp}"
                )
        # same detection as _prompt_arrays: explicit prompt_codes=None is
        # the unprompted placeholder, not a prompt
        wave_prompted = any(
            r.get("prompt_codes") is not None for _, r in pairs
        )
        if self.Pe == 0 and wave_prompted:
            raise ValueError("request carries a prosody prompt but the "
                             "engine was built with prompt_tokens=0")
        order = list(range(len(pairs))) + [0] * (self.S - len(pairs))
        phone = np.zeros((self.S, Tp), np.int32)
        lens = np.zeros((self.S,), np.int32)
        mels = np.stack([pairs[i][1]["mels_prompt"][0] for i in order])
        for k, i in enumerate(order):
            r = pairs[i][1]
            phone[k, : r["phone"].shape[1]] = r["phone"][0]
            lens[k] = int(r["lens"][0])
        if wave_prompted:
            ptc, prev_prompt, prev, plen = self._prompt_arrays(pairs, order)
        else:  # dummies (static prompted=False path ignores them) — an
            # all-unprompted wave on a prompt-enabled engine skips the
            # 12-layer S×Pe prefill entirely (its rows would all be junk)
            ptc = np.zeros((self.S, 1, plm_cfg.tc_latent_dim), np.float32)
            prev_prompt = np.zeros((self.S, 1), np.int32)
            prev = np.full((self.S,), plm_cfg.bos_id, np.int32)
            plen = np.zeros((self.S,), np.int32)
        self.carry, nf = prep_admit(
            g_vars, adm_params, plm_params,
            jnp.asarray(plm_cfg.bos_id, jnp.int32), self.carry,
            jnp.asarray([pairs[i][0] for i in order], jnp.int32),
            jnp.asarray(phone), jnp.asarray(lens), jnp.asarray(mels),
            jnp.asarray(ptc), jnp.asarray(prev_prompt), jnp.asarray(prev),
            jnp.asarray(plen),
            g_cfg, adm_cfg, plm_cfg, self.Tmax, self.Tc, self.rv, self.rd,
            self.dtype, self.quant, wave_prompted, self.Pe,
        )
        if self.Pe > 0:
            # `prompted` is a static argname, so a prompt-enabled engine
            # has TWO prep_admit variants; warm the one this wave did NOT
            # take so a later variant flip doesn't pay a cold remote
            # compile mid-serving (advisor round-3 finding)
            self._warm_admit_variant(not wave_prompted, Tp, mels.shape[1])
        self._install(pairs, nf)

    def _warm_admit_variant(self, prompted: bool, Tp: int, Tm: int) -> None:
        """AOT-compile the other ``prep_admit`` prompted-variant at this
        wave's shapes, in a background thread (compile only, never
        executed).  The persistent compilation cache makes the later real
        jit call a cache hit instead of a multi-minute remote compile.
        Marked warmed only on SUCCESS: a transient compile failure (tunnel
        5xx/timeout) must not permanently disable warming for the shape —
        the next wave retries.  Failures are logged but non-fatal (the
        real call would just compile cold, the pre-fix behavior)."""
        key = (prompted, Tp, Tm)
        if key in self._warmed_admit:
            return
        inflight = self._warming_admit
        if key in inflight:  # a warm thread for this shape is already up
            return
        inflight.add(key)
        g_vars, plm_params, adm_params, _ = self.params
        g_cfg, plm_cfg, adm_cfg, _ = self.cfgs
        P = self.Pe if prompted else 1
        D = plm_cfg.tc_latent_dim

        def sds(shape, dt):
            return jax.ShapeDtypeStruct(shape, dt)

        carry_sds = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), self.carry
        )

        def work():
            try:
                prep_admit.lower(
                    g_vars, adm_params, plm_params,
                    sds((), jnp.int32), carry_sds,
                    sds((self.S,), jnp.int32), sds((self.S, Tp), jnp.int32),
                    sds((self.S,), jnp.int32),
                    sds((self.S, Tm, 80), jnp.float32),
                    sds((self.S, P, D), jnp.float32),
                    sds((self.S, P), jnp.int32),
                    sds((self.S,), jnp.int32), sds((self.S,), jnp.int32),
                    g_cfg, adm_cfg, plm_cfg, self.Tmax, self.Tc,
                    self.rv, self.rd, self.dtype, self.quant,
                    prompted, self.Pe,
                ).compile()
                self._warmed_admit.add(key)
            except Exception as e:
                import logging

                logging.getLogger("megatts2_tpu.continuous").warning(
                    "prep_admit variant warm failed for %s (%s); will "
                    "retry on the next admission wave", key, type(e).__name__,
                )
            finally:
                self._warming_admit.discard(key)

        import threading

        threading.Thread(target=work, daemon=True).start()

    def _admit_many(self, pairs: List[Tuple[int, dict]]) -> None:
        """Admit several requests with a FIXED compile surface.

        Two rules keep the remote-compile count bounded and the output
        deterministic per request:

        * phones pad to each request's OWN next-multiple-of-16 bucket (NOT
          the group max) — the MRTE conv-FF leaks a few positions past
          ``lens`` into padding, so the bucket must be a per-request
          property or the output would depend on co-admitted requests;
        * every prep batch and the admit call are padded to the full slot
          count ``S`` by DUPLICATING entries — duplicate slot writes are
          idempotent (same content re-written), so ONE admit graph and ONE
          prep graph per Tp bucket serve every group composition.
        """
        g_vars, _, adm_params, _ = self.params
        g_cfg, plm_cfg, adm_cfg, _ = self.cfgs
        if self.admit_tp_bucket:
            return self._admit_many_fused(pairs)
        buckets: Dict[int, List[int]] = {}
        for i, (_, r) in enumerate(pairs):
            tp = -(-int(r["phone"].shape[1]) // 16) * 16
            buckets.setdefault(tp, []).append(i)
        tc_plm = [None] * len(pairs)
        tc_expand = [None] * len(pairs)
        nf_rows = [None] * len(pairs)  # lazy 0-d device slices
        # dispatch EVERY bucket's prep before syncing any n_frames: the
        # preps run back-to-back on device and the host pays ONE round
        # trip for the whole wave, not one per bucket — and in the online
        # loop NO round trip at all (total_codes is computed in-graph by
        # admit_slots; the nf sync defers past the next tick dispatch)
        pending = []
        for Tp, idxs in buckets.items():
            pad_idxs = idxs + [idxs[0]] * (self.S - len(idxs))  # fixed batch
            phone = np.zeros((self.S, Tp), np.int32)
            lens = np.zeros((self.S,), np.int32)
            mels = np.stack([pairs[i][1]["mels_prompt"][0] for i in pad_idxs])
            for k, i in enumerate(pad_idxs):
                r = pairs[i][1]
                phone[k, : r["phone"].shape[1]] = r["phone"][0]
                lens[k] = int(r["lens"][0])
            tce, tcp, nf = stream_prep(
                g_vars, adm_params, g_cfg, adm_cfg,
                jnp.asarray(phone), jnp.asarray(lens), jnp.asarray(mels),
                self.Tmax, self.dtype,
            )
            pending.append((idxs, tce, tcp, nf))
        for idxs, tce, tcp, nf in pending:
            for k, i in enumerate(idxs):  # only the real rows
                tc_plm[i] = tcp[k]
                tc_expand[i] = tce[k]
                nf_rows[i] = nf[k]
        # pad the admit batch to S by duplicating entry 0 (idempotent);
        # nf_vec row i corresponds to pairs[i] for i < len(pairs)
        order = list(range(len(pairs))) + [0] * (self.S - len(pairs))
        nf_vec = jnp.stack([nf_rows[i] for i in order])
        wave_prompted = any(
            r.get("prompt_codes") is not None for _, r in pairs
        )
        if self.Pe == 0 and wave_prompted:
            raise ValueError(
                "request carries a prosody prompt but the engine was "
                "built with prompt_tokens=0"
            )
        if not wave_prompted:
            # all-unprompted wave: skip the prompt prefill dispatch even
            # on a prompt-enabled engine (admit_slots resets plen to 0)
            self.carry = admit_slots(
                self.carry,
                jnp.asarray([pairs[i][0] for i in order], jnp.int32),
                jnp.stack([tc_plm[i] for i in order]),
                jnp.stack([tc_expand[i] for i in order]),
                nf_vec,
                jnp.asarray(plm_cfg.bos_id, jnp.int32),
                self.Tc, self.Tmax, self.rv, self.rd,
            )
        else:
            _, plm_params, _, _ = self.params
            ptc, prev_prompt, prev, plen = self._prompt_arrays(pairs, order)
            pf_cache = prefill_slots(
                plm_params, jnp.asarray(ptc), jnp.asarray(prev_prompt),
                plm_cfg, self.Tc + self.Pe, self.dtype, self.quant,
            )
            self.carry = admit_slots_prompted(
                self.carry,
                jnp.asarray([pairs[i][0] for i in order], jnp.int32),
                jnp.stack([tc_plm[i] for i in order]),
                jnp.stack([tc_expand[i] for i in order]),
                nf_vec,
                jnp.asarray(prev),
                jnp.asarray(plen),
                pf_cache,
                self.Tc, self.Tmax, self.rv, self.rd,
            )
        self._install(pairs, nf_vec)

    def run(self, requests: List[dict]) -> Iterator[Tuple[Any, np.ndarray]]:
        """Drive the engine over a fixed request list, yielding
        ``(id, wav)`` in completion order (see ``_run``)."""
        yield from self._run(list(requests), live=None)

    def run_live(self, rq, stop) -> Iterator[Tuple[Any, np.ndarray]]:
        """Long-running serving loop: requests arrive on a
        ``queue.Queue`` (``rq``) while the engine runs; admitted into free
        slots at the next tick boundary.  Ends when ``stop`` (a
        ``threading.Event``) is set AND all in-flight work has drained.
        Used by ``serve.py --http``."""
        yield from self._run([], live=(rq, stop))

    def _run(self, queue: List[dict], live) -> Iterator[Tuple[Any, np.ndarray]]:
        """Core loop, yielding ``(id, wav)`` in completion order.

        Transfer/compute overlap: each tick's emitted chunks stay ON
        DEVICE while the next admission+tick dispatch; the previous tick's
        samples are pulled to the host only then.  Slot bookkeeping
        (emitted counters, freeing) happens at dispatch time, so a freed
        slot can be re-admitted immediately — the in-flight emit read its
        data before the admit's donated overwrite executes (runtime data
        dependency)."""
        g_vars, plm_params, _, hifi_params = self.params
        g_cfg, plm_cfg, _, hifi_cfg = self.cfgs
        bufs: Dict[int, List[np.ndarray]] = {}
        totals: Dict[int, int] = {}
        Cc = self.F // 8
        pending = None  # (device wavs, [(req, chunk j, batch row)])
        # online: defer each admission wave's n_frames sync until after
        # the NEXT tick has been dispatched (one fewer blocking round trip
        # on the request's time-to-first-audio path); offline keeps the
        # immediate sync (the fused-tick planner wants known frame counts)
        self._defer_nf = live is not None
        self._pending_nf = None

        def live_slots():
            return [s for s in range(self.S) if self.slot_req[s] is not None]

        def flush(p):
            wavs = np.asarray(p[0])  # (N_ticks, S, F*hop)
            for req, j, row, n in p[1]:
                total = totals[id(req)]
                w = wavs[n, row]
                if (j + 1) * self.F > total:
                    w = w[: (total - j * self.F) * HIFIGAN_HOP_LENGTH]
                bufs[id(req)].append(w)
                if (j + 1) * self.F >= total:
                    totals.pop(id(req))
                    yield req["id"], np.concatenate(bufs.pop(id(req)))

        def drain_live() -> bool:
            """Move arrived requests into ``queue``; True while the live
            source may still produce more."""
            if live is None:
                return False
            rq, stop = live
            while True:
                try:
                    queue.append(rq.get_nowait())
                except Exception:
                    break
            return not stop.is_set()

        more = drain_live()
        while queue or live_slots() or pending or more:
            more = drain_live()
            if live is not None and not queue and not live_slots() and not pending:
                # idle serving loop: block briefly for the next request
                # instead of spinning
                rq, stop = live
                try:
                    queue.append(rq.get(timeout=0.05))
                except Exception:
                    pass  # timeout — loop around and re-check stop
                if not queue:
                    continue
            # fill free slots (one batched admission per loop)
            pairs = []
            for s in range(self.S):
                if self.slot_req[s] is None and queue:
                    pairs.append((s, queue.pop(0)))
            if pairs:
                self._admit_many(pairs)
                for s, req in pairs:
                    bufs[id(req)] = []
                    if self.slot_frames[s] >= 0:
                        totals[id(req)] = self.slot_frames[s]
            # the schedule is deterministic (each tick adds exactly Cc
            # codes), so emit plans are computed up front and MULTIPLE
            # ticks + emits run as ONE fused dispatch whenever no
            # admission can occur inside the block (offline mode; online
            # keeps single ticks for admission latency).  Every saved
            # dispatch is ~75 ms on a tunneled target.
            new_pending = None
            if live_slots():
                a_rows, items_all = [], []
                for n in range(self.max_fused_ticks):
                    if not live_slots():
                        break
                    a_vec, items, freed = self._tick_plan()
                    a_rows.append(a_vec)
                    items_all.extend((req, j, s, n) for req, j, s in items)
                    if live is not None:
                        break  # online: admit at every tick boundary
                    if freed and queue:
                        break  # a slot opened and work is waiting
                N = len(a_rows)
                self.carry, wavs = engine_tick_emit_multi(
                    plm_params, g_vars, hifi_params, self.carry,
                    jnp.asarray(a_rows, jnp.int32), plm_cfg, g_cfg, hifi_cfg,
                    Cc, self.Tc, self.F, self.rv, self.rd, N, self.dtype,
                    self.quant, self.Pe,
                )
                self.n_ticks += N
                if items_all:
                    new_pending = (wavs, items_all)
            # resolve a deferred admission's n_frames AFTER dispatching
            # the tick it overlapped with (the sync rides the same device
            # round trip the flush below pays anyway)
            for req, frames in self._resolve_nf():
                totals[id(req)] = frames
            # pull the PREVIOUS tick's samples while this one computes
            if pending is not None:
                yield from flush(pending)
            pending = new_pending
        if pending is not None:
            yield from flush(pending)
