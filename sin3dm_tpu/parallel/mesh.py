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

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("data",)) -> Mesh:
    """1D data mesh over the first n devices (default: all)."""
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
    """Place every leaf with its leading axis sharded over 'data'."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def replicate(mesh: Mesh, tree):
    s = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def pad_to_multiple(n: int, m: int) -> int:
    return (n + m - 1) // m * m
