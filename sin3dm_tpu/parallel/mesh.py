"""Device mesh + sharding utilities.

The reference's distributed layer is a commented-out MPI/NCCL bootstrap
(`/root/reference/src/utils/dist_util.py:19-42`) — single GPU in practice.
The TPU-native replacement is a `jax.sharding.Mesh` over ICI with named
axes; parallelism is expressed as shardings, XLA inserts the collectives:

* `data` axis — data-parallel: the diffusion batch (32 copies of the one
  triplane), the AE's 65k-point batch, and sample-time `n_samples` all
  shard along their leading batch axis.  Gradients are reduced by XLA via
  the sharded-jit partitioner (the psum replaces the reference's dead
  `dist.all_gather` in `resample.py:83-104` and `mpi_weighted_mean`).

A `spatial` axis is reserved for plane-spatial sharding (halo-exchange
convs) if triplanes ever exceed one chip's HBM — not wired up by default
because the model comfortably fits (SURVEY.md §5 notes this is the honest
analog of context parallelism here).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_initialize_distributed() -> bool:
    """Env-gated multi-host bootstrap: `jax.distributed.initialize` over
    DCN — the working TPU-native replacement for the reference's
    commented-out MPI/NCCL/gloo init (`dist_util.py:19-42`).

    Opt-in with `SIN3DM_DIST=1`.  Addressing comes from
    `SIN3DM_COORDINATOR` (host:port) + `SIN3DM_NUM_PROCESSES` +
    `SIN3DM_PROCESS_ID`; on TPU pod slices all three may be omitted and
    JAX auto-detects from the TPU metadata.  Called by the CLIs before
    any device query.  Returns True when running multi-process.

    Pod usage (one process per host):
        SIN3DM_DIST=1 python -m sin3dm_tpu.cli.train --tag T ...
    Manual addressing (e.g. CPU smoke test):
        SIN3DM_DIST=1 SIN3DM_COORDINATOR=10.0.0.1:1234 \
        SIN3DM_NUM_PROCESSES=2 SIN3DM_PROCESS_ID=0 python -m ...
    """
    if os.environ.get("SIN3DM_DIST", "").lower() not in (
            "1", "true", "yes", "on"):
        return False
    # must not touch the backend (jax.process_count would initialize it)
    if jax.distributed.is_initialized():
        return jax.process_count() > 1
    coord = os.environ.get("SIN3DM_COORDINATOR")
    if coord:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["SIN3DM_NUM_PROCESSES"]),
            process_id=int(os.environ["SIN3DM_PROCESS_ID"]))
    else:
        jax.distributed.initialize()  # TPU pod auto-detection
    return jax.process_count() > 1


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("data",)) -> Mesh:
    """1D data mesh over the first n devices (default: all — in
    multi-process runs `jax.devices()` is the GLOBAL device list, so the
    mesh spans all hosts' chips)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    arr = np.array(devs)
    if len(axis_names) > 1:
        raise NotImplementedError("only 1D meshes are wired up")
    return Mesh(arr, axis_names=tuple(axis_names))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch / point) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Place every leaf with its leading axis sharded over 'data'.

    Single-process: a plain device_put.  Multi-process (pod slice): each
    process passes its LOCAL slice and the leaves are assembled into
    global arrays (`jax.make_array_from_process_local_data`) — the global
    batch is num_processes x the per-process batch, the per-host data
    loading analog of the reference's per-rank loader."""
    s = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                s, np.asarray(x)), tree)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def replicate(mesh: Mesh, tree):
    """Replicate every leaf across the mesh.  Multi-process callers must
    pass identical host values on every process (deterministic inits from
    the same PRNGKey satisfy this — the analog of the reference's unused
    `sync_params` broadcast, `dist_util.py:62-68`)."""
    s = replicated(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                s, np.asarray(x)), tree)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def pad_to_multiple(n: int, m: int) -> int:
    return (n + m - 1) // m * m
