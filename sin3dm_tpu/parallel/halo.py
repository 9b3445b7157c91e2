"""Plane-spatial sharding with halo exchange — the escalation path for
triplanes that exceed one chip's HBM.

The reference has no distributed path at all (SURVEY.md §2.3); its
"long-context" analog is triplane spatial extent, which scales at sample
time via full convolutionality (`/root/reference/src/sample.py:26-30`).
When a retargeted plane no longer fits one chip, the honest TPU analog of
context parallelism is to shard the plane's H axis over a `space` mesh
axis and exchange 1-row halos between neighbors before each 3x3 conv —
collectives ride ICI via `jax.lax.ppermute`, compute stays local.

This module provides the building block (`halo_conv2d`) plus the mesh and
sharding helpers; it is golden-tested against the unsharded conv on an
8-device virtual CPU mesh (tests/test_halo.py).  It is NOT wired into the
default UNet because the model comfortably fits a single chip at the
reference's scales — see `parallel/mesh.py` for the rationale.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS = "space"


def make_spatial_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1D mesh over `space` for plane-spatial (H-axis) sharding."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), axis_names=(AXIS,))


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """Shard [B, H, W, C] planes on H over `space`."""
    return NamedSharding(mesh, P(None, AXIS))


def shard_plane(mesh: Mesh, x):
    return jax.device_put(x, spatial_sharding(mesh))


def _exchange_halos(x, pad: int):
    """Append the `pad` boundary rows of each neighbor shard, zero-filled
    at the global top/bottom edge (zero-'SAME' conv semantics).  x is the
    LOCAL shard [B, h_local, W, C]; runs inside shard_map."""
    n = jax.lax.axis_size(AXIS)
    idx = jax.lax.axis_index(AXIS)
    # rows coming from the previous shard (above) and the next (below)
    top = jax.lax.ppermute(x[:, -pad:], AXIS,
                           [(i, (i + 1) % n) for i in range(n)])
    bot = jax.lax.ppermute(x[:, :pad], AXIS,
                           [(i, (i - 1) % n) for i in range(n)])
    top = jnp.where(idx == 0, jnp.zeros_like(top), top)
    bot = jnp.where(idx == n - 1, jnp.zeros_like(bot), bot)
    return jnp.concatenate([top, x, bot], axis=1)


def halo_conv2d(p, x, mesh: Mesh):
    """`core.nn.conv2d` (stride 1, zero-'SAME') over planes whose H axis
    is sharded across `mesh`'s `space` axis.

    Each shard exchanges (k-1)/2 boundary rows with its neighbors via
    `ppermute`, then convolves locally with VALID row padding (the halos
    provide the context) and SAME column padding.  Bit-identical to the
    unsharded conv for odd kernel sizes and H divisible by the mesh size.
    """
    kh, kw = p["w"].shape[0], p["w"].shape[1]
    assert kh % 2 == 1 and kw % 2 == 1, "odd kernels only"
    pad = (kh - 1) // 2
    n_shards = mesh.shape[AXIS]
    assert x.shape[1] % n_shards == 0, "H must divide the space axis"
    assert x.shape[1] // n_shards >= pad, \
        "local shard must be at least the halo width"

    def local(w, xs):
        if pad:
            xs = _exchange_halos(xs, pad)
        y = jax.lax.conv_general_dilated(
            xs, w.astype(xs.dtype), window_strides=(1, 1),
            padding=((0, 0), ((kw - 1) // 2, (kw - 1) // 2)) if pad else
            "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(None, AXIS)),
        out_specs=P(None, AXIS))
    y = fn(p["w"], x)
    if "b" in p:
        y = y + p["b"].astype(y.dtype)  # elementwise: sharding-preserving
    return y
