"""Parameter sharding rules: tensor parallelism for the transformer stacks.

Megascale recipe (How-to-Scale-Your-Model style): column-parallel first
projection (shard the output features over 'model'), row-parallel second
projection (shard the input features), attention q/k/v column-parallel /
out-proj row-parallel (= head sharding).  Conv stacks, embeddings, VQ
codebooks and norms are replicated — at d_model ≤ 1024 their cost is small
and LayerNorm-over-channels wants full features.  GSPMD inserts the
all-reduce at the row-parallel outputs over ICI.
"""
from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS

# path substrings → (kernel PartitionSpec factory, bias PartitionSpec factory)
_COLUMN = ("w_q", "w_k", "w_v", "ff_linear1", "ff_conv1", "predict_layer")
_ROW = ("out_proj", "ff_linear2", "ff_conv2")


def _spec_for(path: str, shape: tuple, n_model: int) -> P:
    """Specs are expressed from the trailing axes so they hold for both
    plain params and scan-stacked params with a leading depth axis
    (Dense kernel (in,out) or (L,in,out); bias (out,) or (L,out)).
    Dims not divisible by the model-axis size stay replicated (e.g. the
    ADM's scalar regression head, out_features=1)."""
    ndim = len(shape)
    is_kernel = path.endswith("/kernel")
    if any(f"/{m}/" in path for m in _COLUMN):
        # column-parallel: shard output features (always the last axis)
        if shape[-1] % n_model == 0:
            return P(*([None] * (ndim - 1)), MODEL_AXIS)
        return P()
    if any(f"/{m}/" in path for m in _ROW):
        if is_kernel and ndim >= 2 and shape[-2] % n_model == 0:
            # row-parallel: shard the contracting (input) dim
            return P(*([None] * (ndim - 2)), MODEL_AXIS, None)
        return P()  # bias after the all-reduce stays replicated
    return P()


def param_shardings(params: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree for a params pytree, applying the TP rules."""

    n_model = mesh.shape.get(MODEL_AXIS, 1)
    flat = jax.tree_util.tree_flatten_with_path(params)
    specs = {}
    for path, leaf in flat[0]:
        key = "/" + "/".join(
            p.key if hasattr(p, "key") else str(p.idx) for p in path
        )
        specs[key] = NamedSharding(mesh, _spec_for(key, leaf.shape, n_model))

    def to_sharding(path, leaf):
        key = "/" + "/".join(p.key if hasattr(p, "key") else str(p.idx) for p in path)
        return specs[key]

    return jax.tree_util.tree_map_with_path(to_sharding, params)


def replicated_like(tree: Any, mesh: Mesh) -> Any:
    rep = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda _: rep, tree)


def opt_shardings(opt_state: Any, params: Any, mesh: Mesh, zero: bool = False) -> Any:
    """Shardings for an optax state: moments (params-shaped sub-trees, e.g.
    Adam mu/nu) get the SAME placement as their params — TP-sharded where
    the param is, so optimizer memory scales with the model axis instead of
    being replicated.  With ``zero=True``, moments of *replicated* params
    are additionally sharded over the data axis on their largest divisible
    dim (ZeRO-1 style; GSPMD inserts the gathers in the update).  Scalars
    (step counts, schedules) stay replicated."""
    from .mesh import DATA_AXIS

    p_struct = jax.tree_util.tree_structure(params)
    p_shards = param_shardings(params, mesh)
    rep = NamedSharding(mesh, P())
    n_data = mesh.shape.get(DATA_AXIS, 1)

    # Flatten-fed Dense kernels (discriminator adv_layer): their input dim
    # is a merged (T', F', C) product.  ZeRO-sharding that dim cannot
    # propagate through the flatten reshape, so the SPMD partitioner falls
    # back to an involuntary FULL REMATERIALIZATION of the activation
    # cotangent every step (XLA spmd_partitioner warning, observed in the
    # r02 multichip dryrun).  They are ≤20k elements at full size — ZeRO
    # gains nothing — so keep their moments replicated.
    _ZERO_EXEMPT = ("adv_layer",)

    def zero_shard(spec_tree):
        if not zero or n_data == 1:
            return spec_tree

        def widen(path, param_leaf, sh):
            if sh.spec != P():  # already TP-sharded: leave it
                return sh
            if any(
                getattr(p, "key", None) in _ZERO_EXEMPT for p in path
            ):
                return sh
            shape = param_leaf.shape
            for ax in sorted(
                range(len(shape)), key=lambda a: -shape[a]
            ):  # largest dim first
                if shape[ax] % n_data == 0 and shape[ax] >= n_data:
                    spec = [None] * len(shape)
                    spec[ax] = DATA_AXIS
                    return NamedSharding(mesh, P(*spec))
            return sh

        return jax.tree_util.tree_map_with_path(widen, params, spec_tree)

    moment_shards = zero_shard(p_shards)

    def rec(node):
        try:
            if jax.tree_util.tree_structure(node) == p_struct:
                return moment_shards
        except Exception:
            pass
        if isinstance(node, tuple):
            mapped = [rec(c) for c in node]
            return type(node)(*mapped) if hasattr(node, "_fields") else tuple(mapped)
        if isinstance(node, list):
            return [rec(c) for c in node]
        return jax.tree_util.tree_map(lambda _: rep, node)

    return rec(opt_state)


def place_train_state(state: Any, mesh: Mesh, zero: bool = False) -> Any:
    """Place a full train state on the mesh: params TP-sharded per the
    rules above, optimizer moments following their params (optionally
    ZeRO-1 over data), everything else replicated.  Handles both the GAN
    state (g_/d_ params+opt, vq_stats, batch_stats) and the LM states
    (params, opt).  No-op placement-wise at mesh (1,1); always commits the
    arrays to the mesh's devices (required after orbax restore, which pins
    to one device)."""
    updates = {}
    if hasattr(state, "params"):
        sh = param_shardings(state.params, mesh)
        updates["params"] = jax.device_put(state.params, sh)
        updates["opt"] = jax.device_put(
            state.opt, opt_shardings(state.opt, state.params, mesh, zero=zero)
        )
    if hasattr(state, "g_params"):
        g_sh = param_shardings(state.g_params, mesh)
        d_sh = param_shardings(state.d_params, mesh)
        updates["g_params"] = jax.device_put(state.g_params, g_sh)
        updates["d_params"] = jax.device_put(state.d_params, d_sh)
        updates["g_opt"] = jax.device_put(
            state.g_opt, opt_shardings(state.g_opt, state.g_params, mesh, zero=zero)
        )
        updates["d_opt"] = jax.device_put(
            state.d_opt, opt_shardings(state.d_opt, state.d_params, mesh, zero=zero)
        )
        for aux in ("vq_stats", "batch_stats"):  # absent on the vocoder state
            if hasattr(state, aux):
                updates[aux] = jax.device_put(
                    getattr(state, aux), replicated_like(getattr(state, aux), mesh)
                )
    rep = NamedSharding(mesh, P())
    for name in ("step", "rng"):
        if hasattr(state, name):
            updates[name] = jax.device_put(getattr(state, name), rep)
    return state.replace(**updates)
