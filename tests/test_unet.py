"""Triplane UNet: shapes on nondivisible anisotropic sizes, zero-init output,
rollout plumbing, checkpointing (`unet_triplane.py:315-510` parity checks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sin3dm_tpu.core.triplane import randn
from sin3dm_tpu.models.unet import (UNetConfig, _rollout_cat, init_unet,
                                    unet_apply)


def _small_cfg(**kw):
    # model_channels must be a multiple of 32 (GroupNorm32 constraint, like
    # the reference's normalization(), `src/diffusion/nn.py:93-100`)
    kw.setdefault("in_channels", 6)
    kw.setdefault("model_channels", 32)
    kw.setdefault("out_channels", 6)
    return UNetConfig(**kw)


@pytest.mark.parametrize("sizes", [(16, 16, 8), (12, 14, 10), (12, 14, 11),
                                   (9, 7, 5)])
def test_output_shape_matches_input(sizes):
    """Output triplane must mirror the input sizes exactly even for odd /
    anisotropic extents via the bilinear fix-up (`unet_triplane.py:494-505`)."""
    cfg = _small_cfg()
    params = init_unet(jax.random.PRNGKey(0), cfg)
    x = randn(jax.random.PRNGKey(1), 2, cfg.in_channels, sizes)
    t = jnp.array([3, 500])
    y = unet_apply(params, cfg, x, t)
    assert y.sizes == sizes
    assert y.xy.shape == (2, sizes[0], sizes[1], cfg.out_channels)
    assert y.xz.shape == (2, sizes[0], sizes[2], cfg.out_channels)
    assert y.yz.shape == (2, sizes[1], sizes[2], cfg.out_channels)


def test_zero_init_output():
    """The final conv is zero-initialised (`unet_triplane.py:441-445`), so a
    fresh model outputs exactly zero."""
    cfg = _small_cfg()
    params = init_unet(jax.random.PRNGKey(0), cfg)
    x = randn(jax.random.PRNGKey(1), 1, cfg.in_channels, (8, 8, 8))
    y = unet_apply(params, cfg, x, jnp.array([10]))
    for p in y:
        np.testing.assert_array_equal(np.asarray(p), 0.0)


def test_rollout_cat_orientation():
    """Cross-plane rollout must broadcast the correct axis-means
    (`unet_triplane.py:37-46`): xy gets [self, yz z-mean over y-axis cols,
    xz z-mean over x-axis rows]."""
    B, H, W, D, C = 1, 3, 4, 5, 2
    rng = np.random.default_rng(0)
    xy = rng.standard_normal((B, H, W, C)).astype(np.float32)
    xz = rng.standard_normal((B, H, D, C)).astype(np.float32)
    yz = rng.standard_normal((B, W, D, C)).astype(np.float32)
    from sin3dm_tpu.core.triplane import Triplane
    out = _rollout_cat(Triplane(jnp.asarray(xy), jnp.asarray(xz),
                                jnp.asarray(yz)))
    oxy = np.asarray(out.xy)
    assert oxy.shape == (B, H, W, 3 * C)
    # channel block 1: mean of yz over D, indexed by the y (W) axis
    np.testing.assert_allclose(oxy[0, 1, :, C:2 * C], yz.mean(axis=2)[0],
                               rtol=1e-6)
    # channel block 2: mean of xz over D, indexed by the x (H) axis
    np.testing.assert_allclose(oxy[0, :, 2, 2 * C:], xz.mean(axis=2)[0],
                               rtol=1e-6)
    oxz = np.asarray(out.xz)
    # xz gets xy's y-mean (x profile) then yz's y-mean (z profile)
    np.testing.assert_allclose(oxz[0, :, 3, C:2 * C], xy.mean(axis=2)[0],
                               rtol=1e-6)
    np.testing.assert_allclose(oxz[0, 1, :, 2 * C:], yz.mean(axis=1)[0],
                               rtol=1e-6)
    oyz = np.asarray(out.yz)
    np.testing.assert_allclose(oyz[0, :, 3, C:2 * C], xy.mean(axis=1)[0],
                               rtol=1e-6)
    np.testing.assert_allclose(oyz[0, 1, :, 2 * C:], xz.mean(axis=1)[0],
                               rtol=1e-6)


def test_raw_variant_no_rollout():
    cfg = _small_cfg(rollout=False)
    params = init_unet(jax.random.PRNGKey(0), cfg)
    # in_conv of a resblock has cin channels (not 3x) without rollout
    w = params["down"][0][0]["in_conv"]["xy"]["w"]
    assert w.shape[2] == cfg.model_channels  # not tripled
    x = randn(jax.random.PRNGKey(1), 1, cfg.in_channels, (8, 10, 6))
    y = unet_apply(params, cfg, x, jnp.array([0]))
    assert y.sizes == (8, 10, 6)


def test_rollout_channel_width():
    cfg = _small_cfg()
    params = init_unet(jax.random.PRNGKey(0), cfg)
    w = params["down"][0][0]["in_conv"]["xy"]["w"]
    assert w.shape[2] == 3 * cfg.model_channels


def test_jit_and_grad():
    cfg = _small_cfg()
    params = init_unet(jax.random.PRNGKey(0), cfg)
    x = randn(jax.random.PRNGKey(1), 1, cfg.in_channels, (8, 8, 8))
    t = jnp.array([100])

    @jax.jit
    def loss_fn(p):
        y = unet_apply(p, cfg, x, t)
        return sum(jnp.sum(pl ** 2) for pl in y)

    g = jax.grad(loss_fn)(params)
    gnorm = jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.sum(jnp.abs(b)), g, 0.0)
    assert np.isfinite(float(gnorm))


def test_checkpointed_forward_matches():
    cfg = _small_cfg()
    cfg_ckpt = _small_cfg(use_checkpoint=True)
    params = init_unet(jax.random.PRNGKey(0), cfg)
    # perturb out conv so output is nonzero
    params["out"]["conv"]["xy"]["w"] = (
        params["out"]["conv"]["xy"]["w"] + 0.01)
    x = randn(jax.random.PRNGKey(1), 1, cfg.in_channels, (8, 8, 8))
    t = jnp.array([42])
    y1 = unet_apply(params, cfg, x, t)
    y2 = unet_apply(params, cfg_ckpt, x, t)
    np.testing.assert_allclose(np.asarray(y1.xy), np.asarray(y2.xy),
                               rtol=1e-6)


def test_default_config_parameter_structure():
    """Default (12, 64, 12, mult 1,2) builds 2 down levels, 2 up levels,
    matching the reference's printed structure."""
    cfg = UNetConfig()
    params = init_unet(jax.random.PRNGKey(0), cfg)
    assert len(params["down"]) == 2 and len(params["up"]) == 2
    # down level 1: 64 -> 128
    assert params["down"][1][0]["in_conv"]["xy"]["w"].shape == (3, 3, 192, 128)
    # up entry 0 (deepest): 128 -> 128, no skip concat
    assert params["up"][0][0]["in_conv"]["xy"]["w"].shape == (3, 3, 384, 128)
    # up entry 1: 128+64=192 -> 64
    assert params["up"][1][0]["in_conv"]["xy"]["w"].shape == (3, 3, 576, 64)
    # FiLM: emb produces 2*out_channels
    assert params["down"][0][0]["emb"]["w"].shape == (256, 128)


def test_rollout_fast_matches_dense():
    """The 1D-collapsed rollout conv must equal conv(concat(rollout))
    exactly — same math, different factorization."""
    import jax.numpy as jnp
    from sin3dm_tpu.core.triplane import randn
    from sin3dm_tpu.models.unet import (_rollout_cat,
                                        _tconv_apply_rollout_fast,
                                        _tconv_init)
    from sin3dm_tpu.core import nn
    from sin3dm_tpu.core.triplane import Triplane

    for sizes in ((16, 16, 8), (9, 7, 5), (8, 2, 3)):
        key = jax.random.PRNGKey(sum(sizes))
        t = randn(key, 2, 6, sizes)
        p = _tconv_init(jax.random.PRNGKey(1), 6, 10, 3, rollout=True)
        tcat = _rollout_cat(t)
        dense = Triplane(nn.conv2d(p["xy"], tcat.xy),
                         nn.conv2d(p["xz"], tcat.xz),
                         nn.conv2d(p["yz"], tcat.yz))
        fast = _tconv_apply_rollout_fast(p, t)
        for a, b in zip(fast, dense):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)


def test_unet_apply_unchanged_by_fast_rollout():
    """End-to-end UNet output with the fast rollout path == the dense
    path (monkeypatched off)."""
    from sin3dm_tpu.models import unet as U

    cfg = UNetConfig(in_channels=4, model_channels=32, out_channels=4)
    params = init_unet(jax.random.PRNGKey(0), cfg)
    from sin3dm_tpu.core.triplane import randn
    x = randn(jax.random.PRNGKey(1), 2, 4, (12, 10, 6))
    t = jnp.array([3, 500], dtype=jnp.int32)
    y_fast = unet_apply(params, cfg, x, t)

    orig = U._tconv_apply_rollout_fast
    U._tconv_apply_rollout_fast = \
        lambda p, tt, fused=False, spatial_mesh=None, act=None: U.Triplane(
        U.nn.conv2d(p["xy"], U._rollout_cat(tt).xy),
        U.nn.conv2d(p["xz"], U._rollout_cat(tt).xz),
        U.nn.conv2d(p["yz"], U._rollout_cat(tt).yz))
    try:
        y_dense = unet_apply(params, cfg, x, t)
    finally:
        U._tconv_apply_rollout_fast = orig
    for a, b in zip(y_fast, y_dense):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_deep_channel_mult_smoke():
    """channel_mult=(1,2,4) (deeper than the reference default) builds and
    runs — init_unet's key pool is sized to the config (r1 VERDICT weak #8:
    a fixed split(key, 64) iterator)."""
    cfg = UNetConfig(in_channels=4, model_channels=32, out_channels=4,
                     channel_mult=(1, 2, 4), num_res_blocks=2)
    params = init_unet(jax.random.PRNGKey(0), cfg)
    x = randn(jax.random.PRNGKey(1), 1, 4, (16, 16, 8))
    out = unet_apply(params, cfg, x, jnp.array([3]))
    assert out.xy.shape == (1, 16, 16, 4)
    assert out.xz.shape == (1, 16, 8, 4)
    for p in out:
        assert bool(jnp.all(jnp.isfinite(p)))


def test_very_deep_channel_mult_does_not_exhaust_keys():
    """A config needing >64 keys (the old fixed pool) still initializes."""
    cfg = UNetConfig(in_channels=4, model_channels=32, out_channels=4,
                     channel_mult=(1,) * 31, num_res_blocks=1)
    params = init_unet(jax.random.PRNGKey(0), cfg)
    assert len(params["down"]) == 31


def test_fast_norm_training_path_parity_and_grad():
    """cfg.fast_norm=True (compute-dtype GN apply, fp32 stats) matches the
    exact path in fp32 and is differentiable (it is enabled for bf16
    TRAINING, not just inference)."""
    cfg = UNetConfig(in_channels=4, model_channels=32, out_channels=4)
    params = init_unet(jax.random.PRNGKey(0), cfg)
    for pl in ("xy", "xz", "yz"):  # un-zero the output conv
        params["out"]["conv"][pl]["w"] = (
            params["out"]["conv"][pl]["w"] + 0.01)
    from sin3dm_tpu.core.triplane import randn
    x = randn(jax.random.PRNGKey(1), 2, 4, (12, 10, 6))
    t = jnp.array([3, 500], dtype=jnp.int32)
    y_ref = unet_apply(params, cfg, x, t)
    y_fast = unet_apply(params, cfg._replace(fast_norm=True), x, t)
    for a, b in zip(y_fast, y_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)

    def loss(p):
        out = unet_apply(p, cfg._replace(fast_norm=True), x, t)
        return sum(jnp.sum(v ** 2) for v in out)

    g = jax.grad(loss)(params)
    gnorm = jax.tree_util.tree_reduce(
        lambda a, v: a + float(jnp.sum(jnp.abs(v))), g, 0.0)
    assert np.isfinite(gnorm) and gnorm > 0
