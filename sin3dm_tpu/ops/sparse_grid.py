"""Sparse near-surface wire format for dense TSDF grid transfers.

The sample pipeline's device->host boundary ships a 256^3-scale int8
clamped-TSDF grid per sample (~17 MB) over a ~25 MB/s tunnel; the
"grid wait" it causes sits on the decode critical path (RESULTS.md).
Marching cubes, the only consumer, reads voxel MAGNITUDES solely at the
two endpoints of sign-crossing edges — every other voxel contributes
its SIGN alone (cube case index; `geometry/cpp/geometry.cpp` MC).  So
the exact-reconstruction payload is:

* the sign of every voxel, bit-packed            (N/8 bytes), and
* the int8 values of every voxel incident to a sign-crossing edge,
  shipped as fixed-capacity 4^3 blocks (top-K flagged blocks + int32
  block ids).

For real shapes the crossing shell flags ~10% of blocks; the default
capacity is 1/5 of all blocks (~3x total reduction).  If a
pathological surface overflows the budget (`count > capacity`), the
caller falls back to the dense grid — the dense device array is kept
un-fetched, so the fallback costs one transfer, not a re-decode.

Reconstruction contract (tested in tests/test_sparse_grid.py): the
rebuilt fp32 grid is sign-identical to the dense path at EVERY voxel
and value-identical at every voxel whose magnitude marching cubes can
read; the extracted mesh is bit-identical.

Reference context: the torch pipeline materializes the fp32 grid on
one GPU (`src/encoding/model.py:335-349`) — no transfer exists to
optimize there; this module is TPU/tunnel-specific by design.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

BLOCK = 4


class SparseGrid(NamedTuple):
    """Device handles of one encoded grid (fixed shapes, async-copyable)."""
    signs: jax.Array      # [ceil(N/8)] uint8, np.packbits bit order
    block_ids: jax.Array  # [K] int32 (flagged first, ascending; then rest)
    block_vals: jax.Array  # [K, BLOCK**3] int8
    count: jax.Array      # [] int32 — number of flagged blocks
    shape: Tuple[int, int, int]          # unpadded grid shape
    padded: Tuple[int, int, int]         # multiple-of-BLOCK shape


def padded_shape(shape) -> Tuple[int, int, int]:
    """The multiple-of-BLOCK shape `encode` pads to — THE one place the
    padding rule lives (callers reconstructing a SparseGrid from the
    encode arrays must use this, not re-derive it)."""
    return tuple(-(-int(s) // BLOCK) * BLOCK for s in shape)


def _pad_to_block(q: jax.Array) -> jax.Array:
    X, Y, Z = q.shape
    px, py, pz = [(-s) % BLOCK for s in (X, Y, Z)]
    if px or py or pz:
        # edge-replicate: padding never creates a fake sign crossing
        q = jnp.pad(q, ((0, px), (0, py), (0, pz)), mode="edge")
    return q


def default_capacity(padded: Tuple[int, int, int]) -> int:
    # towerruins-scale telemetry: real decodes flag ~10% of blocks
    # (17.8k of 178k at 256^3) — 1/5 leaves ~1.5x headroom while keeping
    # the wire ~3x smaller than the dense int8 grid
    nb = (padded[0] // BLOCK) * (padded[1] // BLOCK) * (padded[2] // BLOCK)
    return max(1, nb // 5)


def encode(q: jax.Array, capacity: int | None = None) -> SparseGrid:
    """Encode an int8 TSDF grid [X, Y, Z] (jit-friendly, fixed shapes)."""
    shape = tuple(int(s) for s in q.shape)
    qp = _pad_to_block(q)
    P = tuple(int(s) for s in qp.shape)
    if capacity is None:
        capacity = default_capacity(P)

    neg = qp < 0

    # a voxel "matters" iff it is an endpoint of a sign-crossing edge
    def matters_along(axis):
        a = jnp.swapaxes(neg, 0, axis)
        cross = a[1:] != a[:-1]
        pad_lo = jnp.pad(cross, ((1, 0), (0, 0), (0, 0)))
        pad_hi = jnp.pad(cross, ((0, 1), (0, 0), (0, 0)))
        return jnp.swapaxes(pad_lo | pad_hi, 0, axis)

    matter = (matters_along(0) | matters_along(1) | matters_along(2))

    # `sdfgrid_to_mesh` pads one layer of +1.0 before MC
    # (`geometry/meshproc.py`): a NEGATIVE voxel on the volume boundary
    # crosses against that pad, so its magnitude is read too.  (The
    # edge-replicated block padding above cannot cross by construction.)
    X, Y, Z = shape
    for axis, size in ((0, X), (1, Y), (2, Z)):
        face_lo = [slice(None)] * 3
        face_lo[axis] = slice(0, 1)
        face_hi = [slice(None)] * 3
        face_hi[axis] = slice(size - 1, size)
        for face in (tuple(face_lo), tuple(face_hi)):
            matter = matter.at[face].set(matter[face] | neg[face])

    bx, by, bz = P[0] // BLOCK, P[1] // BLOCK, P[2] // BLOCK
    mb = matter.reshape(bx, BLOCK, by, BLOCK, bz, BLOCK)
    bflag = jnp.any(mb, axis=(1, 3, 5)).reshape(-1)           # [nb]

    # flagged blocks first, each group in ascending id order
    order = jnp.argsort(~bflag, stable=True).astype(jnp.int32)
    block_ids = order[:capacity]

    blocks = (qp.reshape(bx, BLOCK, by, BLOCK, bz, BLOCK)
              .transpose(0, 2, 4, 1, 3, 5)
              .reshape(-1, BLOCK ** 3))                       # [nb, 64]
    block_vals = jnp.take(blocks, block_ids, axis=0)

    # np.packbits bit order: MSB = first element
    flat = neg.reshape(-1)
    n = flat.shape[0]
    pad = (-n) % 8
    if pad:
        flat = jnp.pad(flat, (0, pad))
    weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
    signs = (flat.reshape(-1, 8).astype(jnp.uint8) * weights).sum(
        axis=-1, dtype=jnp.uint8)

    return SparseGrid(signs, block_ids, block_vals,
                      jnp.sum(bflag, dtype=jnp.int32), shape, P)


def wire_bytes(sg: SparseGrid) -> int:
    return (sg.signs.size + sg.block_ids.size * 4 + sg.block_vals.size + 4)


def occupancy_host(sg: SparseGrid) -> np.ndarray:
    """Occupancy (sdf < 0) [X, Y, Z] bool straight from the sign bitmap —
    what voxel.npz stores; identical to `decode_host(sg, q) < 0` because
    floor quantization keeps every voxel's sign exact."""
    P = sg.padded
    n = P[0] * P[1] * P[2]
    bits = np.unpackbits(np.asarray(sg.signs))[:n].reshape(P)
    X, Y, Z = sg.shape
    return bits[:X, :Y, :Z].astype(bool)


def decode_host(sg: SparseGrid, quant: float) -> np.ndarray:
    """Rebuild the fp32 TSDF grid on the host (numpy; fetches only the
    sparse payload).  Returns [X, Y, Z] float32, dequantized with the
    same bucket-center rule as the dense int8 path
    (`training/ae.py` decode_texmesh_many).  Caller must have checked
    `count <= capacity` (else use the dense fallback)."""
    P = sg.padded
    n = P[0] * P[1] * P[2]
    signs = np.unpackbits(np.asarray(sg.signs))[:n]
    # far-field placeholder: saturated bucket of the correct sign —
    # magnitudes here are unread by MC (sign-only voxels)
    q = np.where(signs, np.int8(-128), np.int8(127)).reshape(P)

    # scatter the shipped blocks straight into the 3D grid (broadcasted
    # fancy index — no full-grid block transpose round trip)
    by, bz = P[1] // BLOCK, P[2] // BLOCK
    count = int(sg.count)
    ids = np.asarray(sg.block_ids)[:count].astype(np.int64)
    vals = np.asarray(sg.block_vals)[:count].reshape(-1, BLOCK, BLOCK,
                                                     BLOCK)
    b0, rem = np.divmod(ids, by * bz)
    b1, b2 = np.divmod(rem, bz)
    r = np.arange(BLOCK)
    q[(b0 * BLOCK)[:, None, None, None] + r[None, :, None, None],
      (b1 * BLOCK)[:, None, None, None] + r[None, None, :, None],
      (b2 * BLOCK)[:, None, None, None] + r[None, None, None, :]] = vals

    X, Y, Z = sg.shape
    q = q[:X, :Y, :Z]
    return (q.astype(np.float32) + 0.5) * (quant / 127.0)
