"""The gather-free dense grid decode must match the point-gather decode
exactly (same bilinear half-pixel semantics)."""

import jax
import jax.numpy as jnp
import numpy as np

from sin3dm_tpu.dataio.grid import grid_resolutions, sample_grid_points_aabb
from sin3dm_tpu.models import autoencoder as ae


def test_dense_grid_decode_matches_point_decode():
    cfg = ae.AEConfig(fdim_up=32, hidden_dim=64)
    params = ae.init_autoencoder(jax.random.PRNGKey(0), cfg)
    # anisotropic aabb like a real shape
    aabb = np.array([-0.75, -1.0, -0.5, 0.75, 1.0, 0.5], np.float32)
    vol = jax.random.normal(jax.random.PRNGKey(1), (1, 12, 16, 8, 4))
    feat = ae.encode(params, cfg, vol)
    geo_planes, tex_planes = ae.process_planes(params, cfg, feat)

    reso = 20
    res = tuple(int(x) for x in grid_resolutions(aabb, reso))
    coords = sample_grid_points_aabb(aabb, reso).reshape(-1, 3)

    ref = ae.decode_points(params, cfg, geo_planes, tex_planes,
                           jnp.asarray(coords), jnp.asarray(aabb))
    ref = np.asarray(ref).reshape(*res, -1)

    dense = np.asarray(ae.decode_grid_dense(params, cfg, geo_planes,
                                            tex_planes, res, slab=4))
    assert dense.shape == ref.shape
    np.testing.assert_allclose(dense, ref, rtol=2e-4, atol=2e-5)


def test_dense_grid_decode_sdf_only():
    cfg = ae.AEConfig(data_type="sdf", fdim_up=32, hidden_dim=64)
    params = ae.init_autoencoder(jax.random.PRNGKey(0), cfg)
    aabb = np.array([-1, -1, -1, 1, 1, 1], np.float32)
    vol = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 8, 1))
    feat = ae.encode(params, cfg, vol)
    geo_planes, tex_planes = ae.process_planes(params, cfg, feat)
    res = (7, 7, 7)  # nondivisible by slab -> exercises padding
    coords = sample_grid_points_aabb(aabb, 7).reshape(-1, 3)
    ref = np.asarray(ae.decode_points(params, cfg, geo_planes, tex_planes,
                                      jnp.asarray(coords),
                                      jnp.asarray(aabb))).reshape(7, 7, 7, 1)
    dense = np.asarray(ae.decode_grid_dense(params, cfg, geo_planes,
                                            tex_planes, res, slab=4))
    np.testing.assert_allclose(dense, ref, rtol=2e-4, atol=2e-5)


def test_decode_texels_matches_point_decode():
    """Tex-only uint8 texel decode == generic point decode's clipped tex
    channels quantized the same way (truncating *255 cast)."""
    cfg = ae.AEConfig(fdim_up=32, hidden_dim=64)
    params = ae.init_autoencoder(jax.random.PRNGKey(0), cfg)
    aabb = np.array([-1, -1, -0.5, 1, 1, 0.5], np.float32)
    vol = jax.random.normal(jax.random.PRNGKey(1), (1, 12, 16, 8, 4))
    feat = ae.encode(params, cfg, vol)
    geo_planes, tex_planes = ae.process_planes(params, cfg, feat)
    pts = jax.random.uniform(jax.random.PRNGKey(2), (513, 3),
                             minval=-1, maxval=1)
    ref = np.asarray(ae.decode_points(params, cfg, geo_planes, tex_planes,
                                      pts, jnp.asarray(aabb)))
    ref_u8 = (np.clip(ref[:, 1:], 0, 1) * 255).astype(np.uint8)
    got = np.asarray(ae.decode_texels(params, cfg, tex_planes, pts,
                                      jnp.asarray(aabb)))
    assert got.dtype == np.uint8 and got.shape == ref_u8.shape
    # fp rounding at the *255 quantization edge can differ by 1 LSB
    assert np.mean(np.abs(got.astype(int) - ref_u8.astype(int)) > 1) == 0


def test_decode_texels_q16_matches_f32_wire():
    """The uint16 AABB-relative texel wire (half the fp32 upload —
    `decode_texels_q16`) reproduces the fp32-wire colors: position
    quantization is 1/65535 of the AABB, far below the texture MLP's
    spatial bandwidth.  Allow a tiny fraction of 1-LSB color flips."""
    cfg = ae.AEConfig(fdim_up=32, hidden_dim=64)
    params = ae.init_autoencoder(jax.random.PRNGKey(0), cfg)
    aabb = np.array([-0.75, -1, -0.5, 0.75, 1, 0.5], np.float32)
    vol = jax.random.normal(jax.random.PRNGKey(1), (1, 12, 16, 8, 4))
    feat = ae.encode(params, cfg, vol)
    _, tex_planes = ae.process_planes(params, cfg, feat)
    pts = np.asarray(jax.random.uniform(
        jax.random.PRNGKey(2), (4097, 3), minval=-0.49, maxval=0.49),
        np.float32) * np.array([1.5, 2.0, 1.0], np.float32)
    ref = np.asarray(ae.decode_texels(params, cfg, tex_planes,
                                      jnp.asarray(pts), jnp.asarray(aabb)))
    lo, span = aabb[:3], aabb[3:] - aabb[:3]
    q = np.clip(np.rint((pts - lo) / span * 65535.0), 0.0,
                65535.0).astype(np.uint16)
    got = np.asarray(ae.decode_texels_q16(params, cfg, tex_planes,
                                          jnp.asarray(q)))
    diff = np.abs(got.astype(int) - ref.astype(int))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.02


def test_dense_grid_out_dtype_fp16():
    cfg = ae.AEConfig(data_type="sdf", fdim_up=32, hidden_dim=64)
    params = ae.init_autoencoder(jax.random.PRNGKey(0), cfg)
    vol = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 8, 1))
    feat = ae.encode(params, cfg, vol)
    gp, tp = ae.process_planes(params, cfg, feat)
    res = (8, 8, 8)
    full = np.asarray(ae.decode_grid_dense(params, cfg, gp, tp, res,
                                           slab=4))
    half = np.asarray(ae.decode_grid_dense(params, cfg, gp, tp, res,
                                           slab=4, out_dtype=jnp.float16))
    assert half.dtype == np.float16
    np.testing.assert_allclose(half.astype(np.float32), full,
                               rtol=2e-3, atol=2e-3)


def test_dense_grid_decode_int8_quant():
    """int8 wire format: dequantized grid within one quant step of fp32
    (the decode pipeline's transfer format, `_dispatch_geo_grid`)."""
    cfg = ae.AEConfig(fdim_up=32, hidden_dim=64)
    params = ae.init_autoencoder(jax.random.PRNGKey(0), cfg)
    vol = jax.random.normal(jax.random.PRNGKey(1), (1, 12, 16, 8, 4))
    feat = ae.encode(params, cfg, vol)
    geo_planes, tex_planes = ae.process_planes(params, cfg, feat)
    res = (10, 10, 10)
    thr = 2.0 / 256 * 3

    ref = np.asarray(ae.decode_grid_dense(params, cfg, geo_planes,
                                          tex_planes, res, slab=4,
                                          geo_only=True))[..., 0]
    q = np.asarray(ae.decode_grid_dense(params, cfg, geo_planes,
                                        tex_planes, res, slab=4,
                                        geo_only=True, quant_scale=thr))
    assert q.dtype == np.int8
    step = thr / 127.0
    deq = (q[..., 0].astype(np.float32) + 0.5) * step  # bucket centers
    np.testing.assert_allclose(deq, np.clip(ref, -thr, thr),
                               atol=0.51 * step)
    # floor quantization preserves the sign of EVERY voxel exactly:
    # voxel.npz occupancy (sdf < 0) is bit-identical to the fp32 grid
    assert ((deq < 0) == (ref < 0)).all()
