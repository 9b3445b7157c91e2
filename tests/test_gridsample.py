"""Golden parity tests for the bilinear plane sampler vs torch
`F.grid_sample(align_corners=False, padding_mode='border')` — the exact op
the reference decoder uses (`src/encoding/networks.py:182-190`)."""

import numpy as np
import jax.numpy as jnp
import pytest

from sin3dm_tpu.core.gridsample import grid_sample_plane

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _torch_reference(plane_hwc, coords_rc):
    """Reference semantics: feat_map [1,C,H,W], x [N,2] as (row,col) normalized
    coords, flipped before grid_sample (`networks.py:185-189`)."""
    fm = torch.from_numpy(plane_hwc.transpose(2, 0, 1)[None])  # [1,C,H,W]
    x = torch.from_numpy(coords_rc)
    N = x.shape[0]
    sample_coords = x.view(1, 1, N, 2)
    out = F.grid_sample(fm, sample_coords.flip(-1), align_corners=False,
                        padding_mode="border")[0, :, 0, :].transpose(0, 1)
    return out.numpy()


@pytest.mark.parametrize("H,W,C", [(16, 16, 4), (7, 13, 8), (128, 88, 12)])
def test_parity_in_range(H, W, C):
    rng = np.random.default_rng(0)
    plane = rng.standard_normal((H, W, C)).astype(np.float32)
    coords = rng.uniform(-1, 1, size=(257, 2)).astype(np.float32)
    ours = np.asarray(grid_sample_plane(jnp.asarray(plane),
                                        jnp.asarray(coords)))
    ref = _torch_reference(plane, coords)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_parity_border_padding():
    rng = np.random.default_rng(1)
    plane = rng.standard_normal((9, 11, 3)).astype(np.float32)
    coords = rng.uniform(-1.8, 1.8, size=(301, 2)).astype(np.float32)
    ours = np.asarray(grid_sample_plane(jnp.asarray(plane),
                                        jnp.asarray(coords)))
    ref = _torch_reference(plane, coords)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_exact_pixel_centers():
    """Sampling at a pixel center must return that pixel exactly."""
    rng = np.random.default_rng(2)
    H, W = 8, 6
    plane = rng.standard_normal((H, W, 2)).astype(np.float32)
    r, c = 3, 4
    coord = np.array([[(r + 0.5) / H * 2 - 1, (c + 0.5) / W * 2 - 1]],
                     dtype=np.float32)
    out = np.asarray(grid_sample_plane(jnp.asarray(plane),
                                       jnp.asarray(coord)))
    np.testing.assert_allclose(out[0], plane[r, c], rtol=1e-6)
