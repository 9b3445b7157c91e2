"""Classifier-guidance hooks, VLB/bpd loop, and positional encoding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sin3dm_tpu.core.triplane import randn
from sin3dm_tpu.diffusion import gaussian as gd
from sin3dm_tpu.diffusion.schedule import make_schedule


def _tables(steps=50):
    return {k: jnp.asarray(v)
            for k, v in make_schedule("linear", steps).tables_f32().items()}


def _model(xt, tt):
    return xt.map(lambda p: jnp.tanh(p))


def test_condition_mean_shifts_sample():
    tables = _tables()
    cfg = gd.DiffusionConfig(original_num_steps=50)
    x = randn(jax.random.PRNGKey(0), 2, 4, (8, 8, 8))
    t = jnp.full((2,), 20, jnp.int32)
    key = jax.random.PRNGKey(1)

    def cond_fn(xx, tt):
        return xx.map(lambda p: jnp.ones_like(p))  # constant positive grad

    base = gd.p_sample_step(_model, tables, cfg, x, t, key)
    guided = gd.p_sample_step(_model, tables, cfg, x, t, key,
                              cond_fn=cond_fn)
    diff = np.asarray(guided.xy - base.xy)
    # shift = variance * grad > 0 everywhere
    assert (diff > 0).all()
    var = float(np.asarray(tables["fixed_large_variance"])[20])
    np.testing.assert_allclose(diff, var, rtol=1e-4)


def test_condition_score_ddim():
    tables = _tables()
    cfg = gd.DiffusionConfig(original_num_steps=50)
    x = randn(jax.random.PRNGKey(0), 1, 4, (8, 8, 8))
    t = jnp.full((1,), 30, jnp.int32)
    key = jax.random.PRNGKey(1)

    def cond_fn(xx, tt):
        return xx.map(lambda p: 0.1 * jnp.ones_like(p))

    base = gd.ddim_sample_step(_model, tables, cfg, x, t, key, eta=0.0)
    guided = gd.ddim_sample_step(_model, tables, cfg, x, t, key, eta=0.0,
                                 cond_fn=cond_fn)
    # guidance must change the deterministic DDIM output
    assert float(np.abs(np.asarray(guided.xy - base.xy)).max()) > 1e-5


def test_calc_bpd_loop_shapes_and_prior():
    tables = _tables(20)
    cfg = gd.DiffusionConfig(original_num_steps=20)
    x0 = randn(jax.random.PRNGKey(0), 2, 4, (6, 6, 4)).map(jnp.tanh)
    out = gd.calc_bpd_loop(_model, tables, cfg, x0, jax.random.PRNGKey(1))
    assert out["vb"].shape == (2, 20)
    assert out["total_bpd"].shape == (2,)
    assert np.isfinite(np.asarray(out["total_bpd"])).all()
    # total = sum(vb) + prior
    np.testing.assert_allclose(
        np.asarray(out["total_bpd"]),
        np.asarray(out["vb"]).sum(axis=1) + np.asarray(out["prior_bpd"]),
        rtol=1e-5)
    # prior bpd is tiny when the forward process nearly destroys the data
    assert float(np.asarray(out["prior_bpd"]).max()) < 1.0


def test_posenc_matches_reference_shape_and_values():
    torch = pytest.importorskip("torch")
    from sin3dm_tpu.models.autoencoder import posenc_dim, sinusoidal_encode
    x = np.random.default_rng(0).standard_normal((7, 4)).astype(np.float32)
    deg = 3
    ours = np.asarray(sinusoidal_encode(jnp.asarray(x), deg))
    assert ours.shape == (7, posenc_dim(4, deg))
    # reference semantics (`blocks.py:26-42`): [x, sin(cat[xb, xb+pi/2])]
    import math
    scales = np.array([2 ** i for i in range(deg)], np.float32)
    xb = (x[:, None, :] * scales[:, None]).reshape(7, deg * 4)
    ref = np.concatenate(
        [x, np.sin(np.concatenate([xb, xb + 0.5 * math.pi], -1))], -1)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_posenc_ae_forward():
    from sin3dm_tpu.models import autoencoder as ae
    cfg = ae.AEConfig(fdim_up=32, hidden_dim=64, posenc=2)
    params = ae.init_autoencoder(jax.random.PRNGKey(0), cfg)
    # tex decoder input widened to fdim_up * (1 + 2*posenc)
    assert params["tex_decoder"]["first"][0]["w"].shape[0] == 32 * 5
    vol = jnp.zeros((1, 8, 8, 8, 4))
    pts = jnp.zeros((5, 3))
    aabb = jnp.array([-1, -1, -1, 1, 1, 1], jnp.float32)
    out = ae.forward(params, cfg, vol, pts, aabb)
    assert out.shape == (5, 4)
    # dense decode agrees with point decode under posenc as well
    feat = ae.encode(params, cfg, vol)
    gp, tp = ae.process_planes(params, cfg, feat)
    from sin3dm_tpu.dataio.grid import sample_grid_points_aabb
    coords = sample_grid_points_aabb(np.asarray(aabb), 5).reshape(-1, 3)
    ref = np.asarray(ae.decode_points(params, cfg, gp, tp,
                                      jnp.asarray(coords), aabb))
    dense = np.asarray(ae.decode_grid_dense(params, cfg, gp, tp,
                                            (5, 5, 5), slab=2))
    np.testing.assert_allclose(dense.reshape(-1, 4), ref, rtol=2e-4,
                               atol=2e-5)
