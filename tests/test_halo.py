"""Plane-spatial halo-exchange conv vs the unsharded conv (bit parity on
an 8-device virtual CPU mesh) — the escalation path for planes that
exceed one chip's HBM (SURVEY.md §5: the honest TPU analog of context
parallelism for this attention-free model)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sin3dm_tpu.core import nn
from sin3dm_tpu.parallel import halo


def _conv_params(key, kh, kw, cin, cout, bias=True):
    k1, k2 = jax.random.split(key)
    p = {"w": jax.random.normal(k1, (kh, kw, cin, cout)) * 0.1}
    if bias:
        p["b"] = jax.random.normal(k2, (cout,)) * 0.1
    return p


@pytest.mark.parametrize("ksize,n_dev", [(3, 8), (3, 4), (5, 4), (1, 8)])
def test_halo_conv_matches_unsharded(ksize, n_dev):
    assert jax.device_count() >= n_dev
    mesh = halo.make_spatial_mesh(n_dev)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 48, 6))
    p = _conv_params(key, ksize, ksize, 6, 10)

    expect = nn.conv2d(p, x)
    xs = halo.shard_plane(mesh, x)
    got = halo.halo_conv2d(p, xs, mesh)

    # result stays H-sharded over 'space'
    spec = got.sharding.spec
    assert spec[1] == halo.AXIS, spec
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=1e-5, atol=1e-5)


def test_halo_conv_under_jit_grad():
    """The halo conv composes with jit and grad (collectives differentiate
    through ppermute)."""
    mesh = halo.make_spatial_mesh(8)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 16, 4))
    p = _conv_params(jax.random.PRNGKey(3), 3, 3, 4, 4, bias=False)

    def loss_sharded(w):
        xs = halo.shard_plane(mesh, x)
        return jnp.sum(halo.halo_conv2d({"w": w}, xs, mesh) ** 2)

    def loss_ref(w):
        return jnp.sum(nn.conv2d({"w": w}, x) ** 2)

    g1 = jax.jit(jax.grad(loss_sharded))(p["w"])
    g2 = jax.grad(loss_ref)(p["w"])
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-5)
