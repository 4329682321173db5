"""Device mesh construction for DP × TP over ICI.

Replaces the reference's distributed stack (Lightning DDP + manual
``utils/distrib.py`` NCCL wrappers) with the JAX-native recipe: build a
``Mesh(('data', 'model'))``, annotate array shardings, and let GSPMD insert
the collectives (grad all-reduce over 'data', activation/weight collectives
over 'model').  The reference's hand-rolled VQ-codebook broadcast
(core_vq.py:151,169) is unnecessary here — see ``quantization/vq.py``.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def maybe_initialize_distributed() -> bool:
    """Multi-host bring-up: call ``jax.distributed.initialize`` when the
    standard env (``MEGATTS2_TPU_COORDINATOR`` + ``MEGATTS2_TPU_NUM_PROCESSES``
    + ``MEGATTS2_TPU_PROCESS_ID``) is present — one JAX process per host over
    DCN, ICI mesh within hosts (SURVEY.md §5 distributed notes).  No-op (and
    returns False) in single-process runs."""
    import os

    coord = os.environ.get("MEGATTS2_TPU_COORDINATOR")
    if not coord:
        return False
    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=int(os.environ["MEGATTS2_TPU_NUM_PROCESSES"]),
        process_id=int(os.environ["MEGATTS2_TPU_PROCESS_ID"]),
    )
    return True


def make_mesh(
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Mesh of shape (n_devices // n_model, n_model) with axes (data, model).
    With n_model=1 this is pure DP."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    assert n % n_model == 0, f"{n} devices not divisible by model={n_model}"
    if n == 1:
        dev_array = np.array(devices).reshape(1, 1)
    else:
        dev_array = mesh_utils.create_device_mesh(
            (n // n_model, n_model), devices=devices
        )
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Device-put a host batch with the leading axis sharded over 'data'.
    Batches whose leading axis is not divisible by the data-axis size fall
    back to replication (correct, just not data-parallel for that batch);
    samplers should prefer emitting divisible batch sizes."""
    n_data = mesh.shape[DATA_AXIS]

    def put(v):
        shape = np.shape(v)
        if shape and shape[0] % n_data == 0:
            return jax.device_put(v, data_sharding(mesh, len(shape)))
        return jax.device_put(v, NamedSharding(mesh, P()))

    return {k: put(v) for k, v in batch.items()}
