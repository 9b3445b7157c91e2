"""Bilinear plane sampling with torch `F.grid_sample` parity.

The reference decodes a 3D point by sampling each feature plane at the
point's 2D projection with `F.grid_sample(..., align_corners=False,
padding_mode='border')` after flipping the coordinate order
(`src/encoding/networks.py:182-190`).  With that flip the net effect is:

    coordinate c in [-1, 1] along an axis of size S maps to the unnormalized
    index  u = (c + 1) * S / 2 - 0.5, bilinearly interpolated between
    floor(u) and floor(u)+1 with indices clamped to [0, S-1] (border pad).

Here we take coordinates directly as (row, col) pairs — no flip needed.
SSFID parity hinges on this op, so it is covered by golden tests against
torch CPU (tests/test_gridsample.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_sample_plane(plane: jax.Array, coords: jax.Array) -> jax.Array:
    """Sample a single feature plane at normalized 2D points.

    Args:
      plane: [H, W, C] feature map (channels-last).
      coords: [N, 2] in [-1, 1]; coords[:, 0] indexes H (rows), coords[:, 1]
        indexes W (cols).

    Returns:
      [N, C] sampled features (bilinear, border padding,
      align_corners=False).
    """
    H, W, C = plane.shape
    r = (coords[:, 0] + 1.0) * (H * 0.5) - 0.5
    c = (coords[:, 1] + 1.0) * (W * 0.5) - 0.5

    r0 = jnp.floor(r)
    c0 = jnp.floor(c)
    fr = (r - r0).astype(plane.dtype)[:, None]
    fc = (c - c0).astype(plane.dtype)[:, None]

    r0i = jnp.clip(r0.astype(jnp.int32), 0, H - 1)
    r1i = jnp.clip(r0.astype(jnp.int32) + 1, 0, H - 1)
    c0i = jnp.clip(c0.astype(jnp.int32), 0, W - 1)
    c1i = jnp.clip(c0.astype(jnp.int32) + 1, 0, W - 1)

    flat = plane.reshape(H * W, C)
    p00 = flat[r0i * W + c0i]
    p01 = flat[r0i * W + c1i]
    p10 = flat[r1i * W + c0i]
    p11 = flat[r1i * W + c1i]

    top = p00 * (1.0 - fc) + p01 * fc
    bot = p10 * (1.0 - fc) + p11 * fc
    return top * (1.0 - fr) + bot * fr


def sample_triplane_features(planes, pts_norm: jax.Array) -> jax.Array:
    """Sum of the three plane samples at a batch of 3D points.

    Matches the reference's decode gather: xy plane at (x, y), xz at (x, z),
    yz at (y, z), summed (`src/encoding/networks.py:203-212`).

    Args:
      planes: Triplane with no batch dim ([H, W, C] planes) or any object
        with .xy/.xz/.yz channels-last arrays.
      pts_norm: [N, 3] points already normalized to [-1, 1]^3.

    Returns: [N, C].
    """
    h = grid_sample_plane(planes.xy, pts_norm[:, (0, 1)])
    h = h + grid_sample_plane(planes.xz, pts_norm[:, (0, 2)])
    h = h + grid_sample_plane(planes.yz, pts_norm[:, (1, 2)])
    return h
