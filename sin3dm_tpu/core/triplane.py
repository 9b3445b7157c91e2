"""Triplane container — the framework's native tensor type.

The reference packs the three feature planes xy (H,W), xz (H,D), yz (W,D)
into a single 2D map [C, H+D, W+D] with a dead D x D zero block
(`/root/reference/src/utils/triplane_util.py:7-25`) so a stock 2D UNet can
consume them.  On TPU that layout wastes HBM bandwidth on the zero block and
forces channels-first convs, so internally we keep the three planes as
separate channels-last arrays in a pytree and only compose/decompose at
file and test boundaries.

Conventions
-----------
* plane arrays are channels-last: xy [..., H, W, C], xz [..., H, D, C],
  yz [..., W, D, C]  (H indexes x, W indexes y, D indexes z),
* the npz on-disk schema matches the reference exactly: keys
  `feat_xy, feat_xz, feat_yz` with channels-FIRST planes (C, H, W) etc.
  (`triplane_util.py:38-61`), so checkpoints interop at the file level.
"""

from __future__ import annotations

import os
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class Triplane(NamedTuple):
    """Pytree of three channels-last feature planes.

    Shapes (leading batch dims optional but must agree):
      xy: [..., H, W, C]   xz: [..., H, D, C]   yz: [..., W, D, C]
    """

    xy: jax.Array
    xz: jax.Array
    yz: jax.Array

    @property
    def sizes(self) -> Tuple[int, int, int]:
        """(H, W, D) spatial sizes."""
        H, W = self.xy.shape[-3], self.xy.shape[-2]
        D = self.xz.shape[-2]
        return H, W, D

    @property
    def channels(self) -> int:
        return self.xy.shape[-1]

    @property
    def dtype(self):
        return self.xy.dtype

    def astype(self, dtype) -> "Triplane":
        return Triplane(self.xy.astype(dtype), self.xz.astype(dtype),
                        self.yz.astype(dtype))

    def map(self, fn) -> "Triplane":
        """Apply `fn` to each plane."""
        return Triplane(fn(self.xy), fn(self.xz), fn(self.yz))

    def __add__(self, other):
        return _zip_op(jnp.add, self, other)

    def __sub__(self, other):
        return _zip_op(jnp.subtract, self, other)

    def __mul__(self, other):
        return _zip_op(jnp.multiply, self, other)

    __radd__ = __add__
    __rmul__ = __mul__


def _zip_op(op, a: Triplane, b) -> Triplane:
    if isinstance(b, Triplane):
        return Triplane(op(a.xy, b.xy), op(a.xz, b.xz), op(a.yz, b.yz))
    return Triplane(op(a.xy, b), op(a.xz, b), op(a.yz, b))


def zeros_like(t: Triplane) -> Triplane:
    return t.map(jnp.zeros_like)


def randn_like(key: jax.Array, t: Triplane) -> Triplane:
    """Per-plane standard normal noise (the TPU-native analog of
    `th.randn_like(composed_map)` — the composed map's zero block never
    influences the model or loss, see `gaussian_diffusion.py:838-851`)."""
    k1, k2, k3 = jax.random.split(key, 3)
    return Triplane(
        jax.random.normal(k1, t.xy.shape, t.xy.dtype),
        jax.random.normal(k2, t.xz.shape, t.xz.dtype),
        jax.random.normal(k3, t.yz.shape, t.yz.dtype),
    )


def randn(key: jax.Array, batch: int, channels: int,
          sizes: Tuple[int, int, int], dtype=jnp.float32) -> Triplane:
    H, W, D = sizes
    k1, k2, k3 = jax.random.split(key, 3)
    return Triplane(
        jax.random.normal(k1, (batch, H, W, channels), dtype),
        jax.random.normal(k2, (batch, H, D, channels), dtype),
        jax.random.normal(k3, (batch, W, D, channels), dtype),
    )


# ---------------------------------------------------------------------------
# Composed-map interop (file/test boundary only).
# ---------------------------------------------------------------------------

def compose_featmaps(t: Triplane) -> jax.Array:
    """Pack planes into the reference's composed map, channels-last.

    Layout (`triplane_util.py:7-17`):
        [[xy  (H,W) , xz (H,D)],
         [yzT (D,W) , 0  (D,D)]]   -> [..., H+D, W+D, C]
    """
    H, W, D = t.sizes
    lead = t.xy.shape[:-3]
    C = t.channels
    empty = jnp.zeros(lead + (D, D, C), dtype=t.xy.dtype)
    yz_t = jnp.swapaxes(t.yz, -3, -2)  # [..., D, W, C]
    top = jnp.concatenate([t.xy, t.xz], axis=-2)        # [..., H, W+D, C]
    bottom = jnp.concatenate([yz_t, empty], axis=-2)    # [..., D, W+D, C]
    return jnp.concatenate([top, bottom], axis=-3)


def decompose_featmaps(composed: jax.Array,
                       sizes: Tuple[int, int, int]) -> Triplane:
    """Inverse of :func:`compose_featmaps` (`triplane_util.py:20-25`)."""
    H, W, D = sizes
    xy = composed[..., :H, :W, :]
    xz = composed[..., :H, W:, :]
    yz = jnp.swapaxes(composed[..., H:, :W, :], -3, -2)
    return Triplane(xy, xz, yz)


def pad_triplane(t: Triplane, pad_h, pad_w, pad_d) -> Triplane:
    """Zero-pad the three spatial extents (`triplane_util.py:28-35`).

    pad_h/w/d: (before, after) pairs for the H, W, D axes.
    """
    nb = len(t.xy.shape) - 3
    lead = [(0, 0)] * nb
    xy = jnp.pad(t.xy, lead + [pad_h, pad_w, (0, 0)])
    xz = jnp.pad(t.xz, lead + [pad_h, pad_d, (0, 0)])
    yz = jnp.pad(t.yz, lead + [pad_w, pad_d, (0, 0)])
    return Triplane(xy, xz, yz)


# ---------------------------------------------------------------------------
# npz IO — on-disk schema identical to the reference (`triplane_util.py:38-61`).
# ---------------------------------------------------------------------------

def save_triplane_npz(path: str, t_or_xy, xz=None, yz=None) -> None:
    """Save planes as channels-first float arrays, same keys as reference."""
    if isinstance(t_or_xy, Triplane):
        t = t_or_xy
        if len(t.xy.shape) == 4:  # drop batch dim of 1 like the reference CLI
            assert t.xy.shape[0] == 1
            t = Triplane(t.xy[0], t.xz[0], t.yz[0])
        arrs = [np.asarray(p) for p in (t.xy, t.xz, t.yz)]
        arrs = [a.transpose(2, 0, 1) for a in arrs]  # HWC -> CHW
    else:
        arrs = [np.asarray(a) for a in (t_or_xy, xz, yz)]  # already CHW
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    np.savez_compressed(path, feat_xy=arrs[0], feat_xz=arrs[1], feat_yz=arrs[2])


def load_triplane_npz(path: str, dtype=jnp.float32) -> Triplane:
    """Load a reference-format feat.npz into a (no-batch) Triplane."""
    data = np.load(path)
    planes = []
    for k in ("feat_xy", "feat_xz", "feat_yz"):
        a = np.asarray(data[k], dtype=np.float32).transpose(1, 2, 0)  # CHW->HWC
        planes.append(jnp.asarray(a, dtype=dtype))
    return Triplane(*planes)


# NamedTuple is automatically a JAX pytree — no explicit registration needed.
