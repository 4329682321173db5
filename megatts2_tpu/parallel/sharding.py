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
