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

import itertools
import os
import threading

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None):
    """Multi-host DCN runtime init (no-op when unconfigured)."""
    if coordinator_address is None:
        if num_processes is not None or process_id is not None:
            # without the coordinator each process would silently run a
            # standalone single-process job — wrong results, no error
            raise ValueError(
                "--dist_num_processes/--dist_process_id require "
                "--dist_coordinator host:port (process 0's address)")
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def initialize_from_args(args):
    """CLI hook for the additive ``--dist_coordinator/--dist_num_processes/
    --dist_process_id`` flags: call once at the top of main(), BEFORE the
    first jax device query, one process per host. ``make_mesh()`` then
    spans every process's devices, batches shard collective-free from
    each host's (identical, seeded) loader stream via
    ``device_put_global``, and XLA's gradient all-reduce rides DCN —
    the cross-host story of SURVEY.md §5.8.
    No-op without the flags. On a Cloud TPU pod slice the flags may be
    omitted entirely (jax initializes multi-host automatically)."""
    initialize_distributed(getattr(args, "dist_coordinator", None),
                           getattr(args, "dist_num_processes", None),
                           getattr(args, "dist_process_id", None))


def add_dist_args(parser):
    """The additive multi-host flag trio, shared by every CLI."""
    parser.add_argument('--dist_coordinator', type=str, default=None,
                        help='multi-host: host:port of process 0 '
                             '(jax.distributed); run one process per host '
                             'with the same flags and a unique '
                             '--dist_process_id')
    parser.add_argument('--dist_num_processes', type=int, default=None)
    parser.add_argument('--dist_process_id', type=int, default=None)


def data_mesh_from_args(args):
    """The CLIs' DataParallel gate: a 1-D data mesh over all visible
    devices when --use_dataparallel and >1 device, else None."""
    if getattr(args, "use_dataparallel", False) and len(jax.devices()) > 1:
        return make_mesh()
    return None


def require_shared_seed(args):
    """Multi-host searches MUST run the same sampler trajectory on every
    process (collective-free batch placement and single-writer state
    saving assume it); an unseeded global np.random stream is per-process
    OS entropy. Forces seed 0 (with a notice) whenever the run is
    actually multi-process and no --seed was given — gated on
    jax.process_count() rather than the presence of --dist_* flags,
    because on Cloud TPU pod slices jax auto-initializes multi-host with
    no flags at all (MIGRATION.md) and those runs need the guard most."""
    multi = getattr(args, "dist_coordinator", None) is not None
    if not multi:
        try:
            multi = jax.process_count() > 1
        except Exception:
            multi = False
    if multi and getattr(args, "seed", None) is None:
        args.seed = 0
        if is_primary_process():
            print("multi-host search without --seed: forcing --seed 0 so "
                  "every process samples the identical trajectory")


def require_resume_agreement(resume_point):
    """Every process of a multi-host run must resolve the SAME resume
    point: state files are single-writer (is_primary_process) and often
    host-local, so a host missing the file would silently start from
    scratch while the others skip completed work — the processes then
    issue different collective sequences and the mesh deadlocks (or
    trains on divergent schedules). No-op single-process."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils
    mine = np.asarray(resume_point, np.int64).ravel()
    lead = np.asarray(multihost_utils.broadcast_one_to_all(mine)).ravel()
    if not np.array_equal(mine, lead):
        raise RuntimeError(
            f"resume disagreement: process {jax.process_index()} resolved "
            f"resume point {mine.tolist()} but process 0 resolved "
            f"{lead.tolist()} — the state file must be visible to every "
            "host (shared filesystem, or copy it to each host's path)")


def is_primary_process():
    """True on the one process that should WRITE shared-filesystem
    artifacts (checkpoints, search/train state, jsonl telemetry). Params
    and search state are replicated across processes, so a single writer
    loses nothing; concurrent writers to the same path would interleave
    and corrupt the file (runtime/checkpoint.py writes in place)."""
    return jax.process_index() == 0


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


def device_put_global(x, sh):
    """Collective-free placement of a host value onto a (possibly
    multi-process) sharding.

    ``jax.device_put`` of a host/local array onto a sharding that spans
    non-addressable devices issues a hidden ``process_allgather``
    (``multihost_utils.assert_equal``) to verify cross-process value
    equality. That is (a) a full-batch DCN transfer per call and (b) a
    COLLECTIVE: issued from the prefetch producer thread it interleaves
    in a different order than the main thread's train-step collectives on
    different processes and the job deadlocks (observed on the 2-process
    found-AVMNIST CLI). Every process feeds the identical seeded loader
    stream by construction, so the check is redundant —
    ``make_array_from_callback`` builds each process's addressable shards
    locally with zero communication instead. Single-process keeps the
    plain ``device_put`` fast path (async H2D, donation). Set
    ``MFAS_VERIFY_GLOBAL_BATCHES=<dir>`` to re-establish the dropped
    check offline via per-process checksum logs (see below)."""
    if jax.process_count() == 1 or (
            isinstance(x, jax.Array) and not x.is_fully_addressable):
        return jax.device_put(x, sh)
    x = np.asarray(x)
    if _VERIFY_LOG:
        _log_batch_checksum(x)
    if not jax.config.jax_enable_x64:   # device_put's dtype canonicalization
        canon = {np.dtype(np.float64): np.float32,
                 np.dtype(np.int64): np.int32,
                 np.dtype(np.uint64): np.uint32,
                 np.dtype(np.complex128): np.complex64}
        if x.dtype in canon:
            x = x.astype(canon[x.dtype])
    return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])


# MFAS_VERIFY_GLOBAL_BATCHES=<dir>: the collective equality check
# device_put_global skips is replaced by an OFFLINE one — each process
# appends (seq, shape, dtype, sha1) per placed array to
# <dir>/batches.<process_index>.jsonl; diff the files to verify every
# host really fed the identical stream. Checksumming stays local, so the
# debug path cannot reintroduce the producer-thread collective deadlock.
_VERIFY_LOG = os.environ.get("MFAS_VERIFY_GLOBAL_BATCHES", "")
_verify_seq = itertools.count()
_verify_lock = threading.Lock()


def _log_batch_checksum(x):
    import hashlib
    import json
    rec = {"seq": next(_verify_seq), "shape": list(x.shape),
           "dtype": str(x.dtype),
           "sha1": hashlib.sha1(np.ascontiguousarray(x).tobytes())
           .hexdigest()}
    path = os.path.join(_VERIFY_LOG,
                        f"batches.{jax.process_index()}.jsonl")
    with _verify_lock:
        os.makedirs(_VERIFY_LOG, exist_ok=True)
        with open(path, "a") as f:
            f.write(json.dumps(rec) + "\n")


def shard_batch(batch, mesh, axis="data", skip=None):
    """Place each array of a (possibly nested) batch with its leading dim
    sharded over ``axis``. The mesh axis size must divide the batch size —
    loaders pad to full batches, so this holds by construction.
    ``skip(x)`` -> True passes a leaf through untouched (already-placed
    device arrays, e.g. the HBM-resident store)."""
    sh = batch_sharding(mesh, axis)

    def place(x):
        if skip is not None and skip(x):
            return x
        return device_put_global(x, sh)

    return jax.tree_util.tree_map(place, batch)


def replicate_tree(tree, mesh):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: device_put_global(x, sh), tree)
