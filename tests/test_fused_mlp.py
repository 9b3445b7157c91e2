"""Pallas fused skip-MLP vs the XLA reference and the model's own head
implementation (runs in interpreter semantics on CPU via pallas' CPU
lowering)."""

import jax
import jax.numpy as jnp
import numpy as np

from sin3dm_tpu.models.autoencoder import _mlp_skip_apply, _mlp_skip_init
from sin3dm_tpu.ops.fused_mlp import skip_mlp_fused, skip_mlp_reference


def _params(key, cin=64, cout=4, hidden=256, n_hidden=4):
    return _mlp_skip_init(key, cin, cout, hidden, n_hidden)


def test_reference_matches_model_head():
    p = _params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (37, 64))
    a = np.asarray(skip_mlp_reference(p, x))
    b = np.asarray(_mlp_skip_apply(p, x))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_fused_kernel_matches_reference():
    p = _params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2048 + 100, 64))
    ref = np.asarray(skip_mlp_reference(p, x))
    fused = np.asarray(skip_mlp_fused(p, x, tile_n=512))
    assert fused.shape == ref.shape
    np.testing.assert_allclose(fused, ref, rtol=2e-4, atol=1e-4)


def test_fused_kernel_small_hidden():
    p = _params(jax.random.PRNGKey(2), cin=32, cout=1, hidden=64,
                n_hidden=4)
    x = jax.random.normal(jax.random.PRNGKey(3), (300, 32))
    ref = np.asarray(skip_mlp_reference(p, x))
    fused = np.asarray(skip_mlp_fused(p, x, tile_n=256))
    np.testing.assert_allclose(fused, ref, rtol=2e-4, atol=1e-4)


def test_decode_points_fused_heads_parity():
    """The wired inference path: decode_points(fused_heads=True) must match
    the XLA head path bit-closely (pallas interpret mode on CPU)."""
    from sin3dm_tpu.core.triplane import Triplane
    from sin3dm_tpu.models import autoencoder as ae

    cfg = ae.AEConfig()
    params = ae.init_autoencoder(jax.random.PRNGKey(0), cfg)
    sizes = (16, 16, 8)
    key = jax.random.PRNGKey(1)
    kf, kp = jax.random.split(key)
    feat = Triplane(
        jax.random.normal(kf, (1, sizes[0], sizes[1], cfg.feat_channels)),
        jax.random.normal(kp, (1, sizes[0], sizes[2], cfg.feat_channels)),
        jax.random.normal(key, (1, sizes[1], sizes[2], cfg.feat_channels)))
    feat = feat.map(jnp.tanh)
    gp, tp = ae.process_planes(params, cfg, feat)
    pts = jax.random.uniform(jax.random.PRNGKey(2), (777, 3),
                             minval=-1, maxval=1)
    aabb = jnp.array([-1, -1, -0.5, 1, 1, 0.5], jnp.float32)
    ref = np.asarray(ae.decode_points(params, cfg, gp, tp, pts, aabb,
                                      fused_heads=False))
    fused = np.asarray(ae.decode_points(params, cfg, gp, tp, pts, aabb,
                                        fused_heads=True))
    np.testing.assert_allclose(fused, ref, rtol=2e-4, atol=1e-4)


def test_decode_grid_dense_fused_heads_parity():
    from sin3dm_tpu.core.triplane import Triplane
    from sin3dm_tpu.models import autoencoder as ae

    cfg = ae.AEConfig()
    params = ae.init_autoencoder(jax.random.PRNGKey(0), cfg)
    sizes = (12, 12, 8)
    keys = jax.random.split(jax.random.PRNGKey(5), 3)
    feat = Triplane(
        jax.random.normal(keys[0], (1, sizes[0], sizes[1],
                                    cfg.feat_channels)),
        jax.random.normal(keys[1], (1, sizes[0], sizes[2],
                                    cfg.feat_channels)),
        jax.random.normal(keys[2], (1, sizes[1], sizes[2],
                                    cfg.feat_channels))).map(jnp.tanh)
    gp, tp = ae.process_planes(params, cfg, feat)
    res = (16, 16, 12)
    ref = np.asarray(ae.decode_grid_dense(params, cfg, gp, tp, res, 4,
                                          False, fused_heads=False))
    fused = np.asarray(ae.decode_grid_dense(params, cfg, gp, tp, res, 4,
                                            False, fused_heads=True))
    np.testing.assert_allclose(fused, ref, rtol=2e-4, atol=1e-4)


def test_fused_mlp_bf16_mxu_close_to_fp32():
    """bf16 MXU operands (the TPU inference default) stay within the int8
    wire precision (~1/127) of the fp32 reference."""
    import jax, jax.numpy as jnp
    from sin3dm_tpu.ops.fused_mlp import skip_mlp_fused, skip_mlp_reference
    from sin3dm_tpu.models.autoencoder import _mlp_skip_init
    p = _mlp_skip_init(jax.random.PRNGKey(0), 12, 256, 4, 1)
    x = jax.random.normal(jax.random.PRNGKey(1), (512, 12))
    ref = skip_mlp_reference(p, x)
    out = skip_mlp_fused(p, x, interpret=True, mxu_dtype=jnp.bfloat16)
    err = float(jnp.max(jnp.abs(out - ref)))
    scale = float(jnp.max(jnp.abs(ref)))
    assert err / max(scale, 1e-6) < 1.0 / 127, (err, scale)
