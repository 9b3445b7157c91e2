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


def test_spatial_unet_forward_matches_unsharded():
    """VERDICT r3 item 3: the FULL UNet forward with planes dim-1-sharded
    over 'space' (halo_conv2d 3x3 self-convs + GSPMD for rollout means /
    GN stats / resampling) matches the single-device forward."""
    from sin3dm_tpu.core.triplane import randn
    from sin3dm_tpu.models.unet import UNetConfig, init_unet, unet_apply

    mesh = halo.make_spatial_mesh(8)
    cfg = UNetConfig(in_channels=4, model_channels=32, out_channels=4)
    params = init_unet(jax.random.PRNGKey(0), cfg)
    # H=32 and W=16 stay divisible by 8 after one 2x down level
    x = randn(jax.random.PRNGKey(1), 1, 4, (32, 16, 48))
    tt = jnp.array([17], jnp.int32)

    expect = jax.jit(lambda xx: unet_apply(params, cfg, xx, tt))(x)
    scfg = cfg._replace(spatial_mesh=mesh)
    got = jax.jit(lambda xx: unet_apply(params, scfg, xx, tt))(x)

    # output planes stay sharded on dim 1
    assert got.xy.sharding.spec[1] == halo.AXIS, got.xy.sharding
    assert got.yz.sharding.spec[1] == halo.AXIS, got.yz.sharding
    for a, b in zip(got, expect):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_spatial_sampler_matches_unsharded():
    """Sampling a retargeted oversized plane with the spatially-sharded
    UNet reproduces the unsharded chain (same per-sample keys)."""
    from sin3dm_tpu.diffusion.gaussian import DiffusionConfig
    from sin3dm_tpu.diffusion.sampling import (make_jit_sampler,
                                               sample_index_keys)
    from sin3dm_tpu.diffusion.schedule import make_schedule
    from sin3dm_tpu.models.unet import UNetConfig, init_unet, unet_apply

    mesh = halo.make_spatial_mesh(8)
    cfg = UNetConfig(in_channels=4, model_channels=32, out_channels=4)
    params = init_unet(jax.random.PRNGKey(0), cfg)
    tables = {k: jnp.asarray(v) for k, v in
              make_schedule("linear", 100, "ddim5").tables_f32().items()}
    dcfg = DiffusionConfig(original_num_steps=100)
    sizes = (32, 16, 48)  # e.g. a 1.5x z-retarget of a (32, 16, 32) train
    keys = sample_index_keys(jax.random.PRNGKey(3), 0, 1)

    plain = make_jit_sampler(
        lambda x, t: unet_apply(params, cfg, x, t), tables, dcfg,
        use_ddim=True)(keys, 1, 4, sizes)
    scfg = cfg._replace(spatial_mesh=mesh)
    sharded = make_jit_sampler(
        lambda x, t: unet_apply(params, scfg, x, t), tables, dcfg,
        use_ddim=True, spatial_mesh=mesh)(keys, 1, 4, sizes)

    for a, b in zip(sharded, plain):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


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
