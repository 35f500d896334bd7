"""Device-mesh utilities — the TPU-native replacement for the reference's
single-process ``torch.nn.DataParallel`` (SURVEY.md §2.2, §5.8).

Data parallelism is expressed as batch sharding over a named mesh axis:
params stay replicated, batches are split over ``data``, and XLA inserts the
gradient all-reduce over ICI automatically under ``jit``. The candidate
*population* axis of the search trainer (mfas_tpu.search.population) is a
second, communication-free axis ``pop``.

Multi-host (DCN) initialization goes through ``jax.distributed`` —
``initialize_distributed`` is a thin gate that is a no-op on a single host.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None):
    """Multi-host DCN runtime init (no-op when unconfigured)."""
    if coordinator_address is None:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def make_mesh(n_devices=None, axis_names=("data",), shape=None, devices=None):
    """A 1-D data mesh by default; pass shape=(pop, data) for the population
    trainer's 2-D mesh."""
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    if shape is None:
        shape = (len(devices),)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)


def batch_sharding(mesh, axis="data"):
    return NamedSharding(mesh, P(axis))


def replicated(mesh):
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh, axis="data"):
    """Place each array of a (possibly nested) batch with its leading dim
    sharded over ``axis``. Batch sizes must divide the mesh axis size —
    loaders pad to full batches, so this holds by construction."""
    sh = batch_sharding(mesh, axis)

    def place(x):
        return jax.device_put(x, sh)

    return jax.tree_util.tree_map(place, batch)


def replicate_tree(tree, mesh):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
