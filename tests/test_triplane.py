"""Triplane container: compose/decompose layout parity and npz IO."""

import numpy as np
import jax.numpy as jnp
import pytest

from sin3dm_tpu.core.triplane import (Triplane, compose_featmaps,
                                      decompose_featmaps, load_triplane_npz,
                                      pad_triplane, save_triplane_npz)


def _rand_triplane(rng, B, C, H, W, D):
    return Triplane(
        jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32),
        jnp.asarray(rng.standard_normal((B, H, D, C)), jnp.float32),
        jnp.asarray(rng.standard_normal((B, W, D, C)), jnp.float32))


def test_compose_decompose_roundtrip():
    rng = np.random.default_rng(0)
    t = _rand_triplane(rng, 2, 12, 16, 12, 10)
    c = compose_featmaps(t)
    assert c.shape == (2, 16 + 10, 12 + 10, 12)
    t2 = decompose_featmaps(c, t.sizes)
    for a, b in zip(t, t2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_compose_layout_matches_reference():
    """Block layout must match `triplane_util.py:7-17`: top row [xy|xz],
    bottom row [yz^T|0]."""
    rng = np.random.default_rng(1)
    t = _rand_triplane(rng, 1, 3, 5, 6, 4)
    c = np.asarray(compose_featmaps(t))[0]  # [H+D, W+D, C]
    H, W, D = 5, 6, 4
    np.testing.assert_array_equal(c[:H, :W], np.asarray(t.xy)[0])
    np.testing.assert_array_equal(c[:H, W:], np.asarray(t.xz)[0])
    np.testing.assert_array_equal(
        c[H:, :W], np.asarray(t.yz)[0].transpose(1, 0, 2))
    np.testing.assert_array_equal(c[H:, W:], 0.0)


def test_compose_matches_torch_reference_impl():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(2)
    t = _rand_triplane(rng, 1, 4, 7, 5, 3)

    # reference semantics, channels-first
    xy = torch.from_numpy(np.asarray(t.xy)[0].transpose(2, 0, 1))
    xz = torch.from_numpy(np.asarray(t.xz)[0].transpose(2, 0, 1))
    yz = torch.from_numpy(np.asarray(t.yz)[0].transpose(2, 0, 1))
    D = xz.shape[-1]
    empty = torch.zeros(list(xy.shape[:-2]) + [D, D])
    ref = torch.cat([torch.cat([xy, xz], dim=-1),
                     torch.cat([yz.transpose(-1, -2), empty], dim=-1)],
                    dim=-2)

    ours = np.asarray(compose_featmaps(t))[0].transpose(2, 0, 1)
    np.testing.assert_allclose(ours, ref.numpy(), rtol=0, atol=0)


def test_pad_triplane():
    rng = np.random.default_rng(3)
    t = _rand_triplane(rng, 1, 2, 4, 5, 6)
    p = pad_triplane(t, (1, 2), (0, 1), (3, 0))
    assert p.sizes == (4 + 3, 5 + 1, 6 + 3)
    np.testing.assert_array_equal(
        np.asarray(p.xy)[0, 1:5, 0:5], np.asarray(t.xy)[0])


def test_npz_roundtrip(tmp_path):
    rng = np.random.default_rng(4)
    t = _rand_triplane(rng, 1, 12, 8, 6, 4)
    path = str(tmp_path / "feat.npz")
    save_triplane_npz(path, t)
    # on-disk schema: channels-first, reference keys
    raw = np.load(path)
    assert raw["feat_xy"].shape == (12, 8, 6)
    assert raw["feat_xz"].shape == (12, 8, 4)
    assert raw["feat_yz"].shape == (12, 6, 4)
    t2 = load_triplane_npz(path)
    np.testing.assert_allclose(np.asarray(t2.xy), np.asarray(t.xy)[0])


def test_arithmetic_ops():
    rng = np.random.default_rng(5)
    a = _rand_triplane(rng, 1, 2, 4, 4, 4)
    b = _rand_triplane(rng, 1, 2, 4, 4, 4)
    s = a + b * 2.0 - a
    np.testing.assert_allclose(np.asarray(s.xy), np.asarray(b.xy) * 2.0,
                               rtol=1e-6)
