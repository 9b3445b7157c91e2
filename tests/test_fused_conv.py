"""Golden tests: pallas fused 3x3 rollout conv == the XLA path.

Run in pallas interpret mode on the CPU backend (conftest forces cpu)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sin3dm_tpu.core import nn
from sin3dm_tpu.core.triplane import Triplane
from sin3dm_tpu.models import unet as U
from sin3dm_tpu.models.unet import UNetConfig, init_unet, unet_apply
from sin3dm_tpu.ops.fused_conv import conv3x3_rollout_fused


@pytest.mark.parametrize("shape", [(1, 12, 20, 32), (2, 9, 17, 32),
                                   (1, 16, 16, 64)])
def test_plain_conv3x3_parity(shape):
    kx, kw, kb = jax.random.split(jax.random.PRNGKey(0), 3)
    B, H, W, C = shape
    Co = 32
    x = jax.random.normal(kx, shape)
    p = {"w": jax.random.normal(kw, (3, 3, C, Co)) * 0.1,
         "b": jax.random.normal(kb, (Co,)) * 0.1}
    ref = nn.conv2d(p, x)
    out = conv3x3_rollout_fused(x, p["w"], p["b"], tile_h=4,
                                mxu_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_plain_conv3x3_no_bias():
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 24, 32))
    w = jax.random.normal(jax.random.PRNGKey(2), (3, 3, 32, 32)) * 0.1
    ref = nn.conv2d({"w": w}, x)
    out = conv3x3_rollout_fused(x, w, None, tile_h=8,
                                mxu_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("sizes", [(12, 20, 8), (9, 17, 5)])
def test_rollout_tconv_parity(sizes):
    """Fused rollout conv == _tconv_apply_rollout_fast (XLA)."""
    H, W, D = sizes
    C, Co = 32, 32
    keys = jax.random.split(jax.random.PRNGKey(3), 4)
    t = Triplane(jax.random.normal(keys[0], (2, H, W, C)),
                 jax.random.normal(keys[1], (2, H, D, C)),
                 jax.random.normal(keys[2], (2, W, D, C)))
    p = U._tconv_init(keys[3], C, Co, 3, rollout=True)
    ref = U._tconv_apply(p, t, rollout=True, fused=False)
    out = U._tconv_apply(p, t, rollout=True, fused=True)
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=2e-5, atol=2e-5)


def test_unet_apply_fused_parity():
    """Full forward with cfg.fused_conv=True matches the XLA forward."""
    cfg = U.UNetConfig(in_channels=4, model_channels=32, out_channels=4)
    params = U.init_unet(jax.random.PRNGKey(0), cfg)
    x = Triplane(jax.random.normal(jax.random.PRNGKey(1), (1, 12, 16, 4)),
                 jax.random.normal(jax.random.PRNGKey(2), (1, 12, 8, 4)),
                 jax.random.normal(jax.random.PRNGKey(3), (1, 16, 8, 4)))
    tsteps = jnp.array([500], jnp.int32)
    ref = U.unet_apply(params, cfg, x, tsteps)
    out = U.unet_apply(params, cfg._replace(fused_conv=True), x, tsteps)
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("C", [32, 64, 192])
def test_fused_act_parity(C):
    """In-kernel pre-activation silu(x*A+B) == activating first and
    convolving (covers the channel-split path at C=192)."""
    Co = 32
    keys = jax.random.split(jax.random.PRNGKey(7), 5)
    x = jax.random.normal(keys[0], (2, 10, 18, C))
    w = jax.random.normal(keys[1], (3, 3, C, Co)) * 0.1
    b = jax.random.normal(keys[2], (Co,)) * 0.1
    A = jax.random.normal(keys[3], (2, C)) * 0.5 + 1.0
    Bc = jax.random.normal(keys[4], (2, C)) * 0.2
    ref = conv3x3_rollout_fused(nn.apply_film_coeffs(x, A, Bc), w, b,
                                tile_h=4, mxu_dtype=jnp.float32)
    out = conv3x3_rollout_fused(x, w, b, tile_h=4,
                                mxu_dtype=jnp.float32, act=(A, Bc))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_rollout_tconv_act_parity():
    """Rollout fast path with folded norm coefficients (raw input + act)
    == activating the triplane first (XLA)."""
    H, W, D = 12, 20, 8
    C, Co = 32, 32
    keys = jax.random.split(jax.random.PRNGKey(8), 4)
    t = Triplane(jax.random.normal(keys[0], (1, H, W, C)),
                 jax.random.normal(keys[1], (1, H, D, C)),
                 jax.random.normal(keys[2], (1, W, D, C)))
    p = U._tconv_init(keys[3], C, Co, 3, rollout=True)
    np_ = U._tnorm_init(C)
    act = U._tnorm_coeffs(np_, t)
    ta = U._act_triplane(t, act)
    ref = U._tconv_apply(p, ta, rollout=True, fused=False)
    out = U._tconv_apply(p, t, rollout=True, fused=True, act=act)
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=2e-5, atol=2e-5)


def test_skip_and_stats_epilogue():
    """In-kernel residual add + (sum, sumsq) stats == XLA skip add +
    fp32 reduces, and the stats feed coefficients matching the direct
    GroupNorm32 fold."""
    B, H, W = 2, 13, 20
    C, Co = 32, 32
    keys = jax.random.split(jax.random.PRNGKey(11), 4)
    x = jax.random.normal(keys[0], (B, H, W, C))
    w = jax.random.normal(keys[1], (3, 3, C, Co)) * 0.1
    b = jax.random.normal(keys[2], (Co,)) * 0.1
    skip = jax.random.normal(keys[3], (B, H, W, Co))

    ref = conv3x3_rollout_fused(x, w, b, tile_h=4,
                                mxu_dtype=jnp.float32) + skip
    out, stats = conv3x3_rollout_fused(x, w, b, tile_h=4,
                                       mxu_dtype=jnp.float32, skip=skip,
                                       emit_stats=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    want_s1 = jnp.sum(ref.astype(jnp.float32), axis=(1, 2))
    want_s2 = jnp.sum(ref.astype(jnp.float32) ** 2, axis=(1, 2))
    np.testing.assert_allclose(np.asarray(stats[:, 0]), np.asarray(want_s1),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(stats[:, 1]), np.asarray(want_s2),
                               rtol=1e-4, atol=1e-4)

    # stats -> GN32 coefficients == the direct reduce-based fold
    gp = nn.group_norm_init(Co)
    A_ref, B_ref = nn.group_norm32_film_coeffs(gp, ref)
    A_got, B_got = nn.group_norm32_coeffs_from_sums(gp, stats, H * W)
    np.testing.assert_allclose(np.asarray(A_got), np.asarray(A_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(B_got), np.asarray(B_ref),
                               rtol=1e-4, atol=1e-4)


def test_stats_with_rollout_and_act():
    """emit_stats composes with the rollout epilogue and act staging."""
    H, W, D = 12, 20, 8
    C, Co = 32, 32
    keys = jax.random.split(jax.random.PRNGKey(12), 4)
    t = Triplane(jax.random.normal(keys[0], (1, H, W, C)),
                 jax.random.normal(keys[1], (1, H, D, C)),
                 jax.random.normal(keys[2], (1, W, D, C)))
    p = U._tconv_init(keys[3], C, Co, 3, rollout=True)
    np_ = U._tnorm_init(C)
    act = U._tnorm_coeffs(np_, t)
    ta = U._act_triplane(t, act)
    ref = U._tconv_apply(p, ta, rollout=True, fused=False)

    from sin3dm_tpu.models.unet import _colvar_vecs, _rowvar_vecs
    ww = p["xy"]["w"]
    m_col = jnp.mean(ta.yz, axis=-2)
    m_row = jnp.mean(ta.xz, axis=-2)
    col3 = _colvar_vecs(m_col, ww[:, :, C:2 * C])
    row3 = _rowvar_vecs(m_row, ww[:, :, 2 * C:])
    out, stats = conv3x3_rollout_fused(
        t.xy, ww[:, :, :C], p["xy"].get("b"), col3, row3, tile_h=4,
        mxu_dtype=jnp.float32, act=act["xy"], emit_stats=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref.xy),
                               rtol=2e-5, atol=2e-5)
    want = jnp.sum(ref.xy.astype(jnp.float32), axis=(1, 2))
    np.testing.assert_allclose(np.asarray(stats[:, 0]), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_unet_stats_chain_parity(monkeypatch):
    """The stats-chained fused inference path (default) matches the
    unchained fused path (SIN3DM_STATS_CHAIN=0) in bfloat16: chained
    GroupNorm statistics + in-kernel act staging + fused skip add are
    numerically equivalent up to bf16 rounding."""
    cfg = UNetConfig(model_channels=32, fused_conv=True, fast_norm=True,
                     compute_dtype=jnp.bfloat16)
    params = init_unet(jax.random.PRNGKey(0), cfg)
    # randomize the zero-init out convs so the output is nontrivial
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(1), len(leaves))
    params = jax.tree_util.tree_unflatten(treedef, [
        l + 0.05 * jax.random.normal(k, jnp.shape(l))
        for l, k in zip(leaves, keys)])
    x = Triplane(jax.random.normal(jax.random.PRNGKey(2), (1, 12, 16, 12)),
                 jax.random.normal(jax.random.PRNGKey(3), (1, 12, 8, 12)),
                 jax.random.normal(jax.random.PRNGKey(4), (1, 16, 8, 12)))
    ts = jnp.asarray([321], jnp.int32)

    monkeypatch.setenv("SIN3DM_STATS_CHAIN", "0")
    ref = unet_apply(params, cfg, x, ts)
    monkeypatch.setenv("SIN3DM_STATS_CHAIN", "1")
    got = unet_apply(params, cfg, x, ts)
    for name, r, o in zip(("xy", "xz", "yz"), ref, got):
        np.testing.assert_allclose(
            np.asarray(o, np.float32), np.asarray(r, np.float32),
            rtol=0.05, atol=0.05, err_msg=f"plane {name}")
        # bf16-scale agreement on average, not just max
        assert np.mean(np.abs(np.asarray(o, np.float32)
                              - np.asarray(r, np.float32))) < 5e-3
