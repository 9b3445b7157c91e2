"""Functional diffusion math on Triplane pytrees: q/p identities, training
losses, DDIM determinism (`gaussian_diffusion.py` parity at the math level)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sin3dm_tpu.core.triplane import Triplane, randn
from sin3dm_tpu.diffusion import gaussian as gd
from sin3dm_tpu.diffusion.schedule import make_schedule


def _tables(steps=100, respace=""):
    return {k: jnp.asarray(v)
            for k, v in make_schedule("linear", steps, respace)
            .tables_f32().items()}


def _cfg(**kw):
    return gd.DiffusionConfig(**kw)


def _x0(key, B=2, C=4, sizes=(8, 6, 4)):
    return randn(key, B, C, sizes)


def test_q_sample_endpoints():
    tables = _tables()
    key = jax.random.PRNGKey(0)
    x0 = _x0(key)
    noise = randn(jax.random.PRNGKey(1), 2, 4, (8, 6, 4))
    t0 = jnp.zeros((2,), jnp.int32)
    xt = gd.q_sample(tables, x0, t0, noise)
    # at t=0, x_t ~= sqrt(1-beta0) x0 + sqrt(beta0) eps, nearly x0
    a0 = float(np.sqrt(1 - 1000 / 100 * 0.0001))
    np.testing.assert_allclose(
        np.asarray(xt.xy),
        a0 * np.asarray(x0.xy)
        + np.sqrt(1 - a0 ** 2) * np.asarray(noise.xy), rtol=1e-4, atol=1e-5)


def test_posterior_mean_identity():
    """q_posterior(x0, x_t = sqrt(acp_t) x0) == sqrt(acp_{t-1}) x0."""
    tables = _tables()
    x0 = _x0(jax.random.PRNGKey(2))
    t = jnp.full((2,), 37, jnp.int32)
    xt = gd.extract(tables, "sqrt_alphas_cumprod", t, x0) * x0
    mean = gd.q_posterior_mean(tables, x0, xt, t)
    expect = gd.extract(tables, "alphas_cumprod_prev", t, x0)
    np.testing.assert_allclose(
        np.asarray(mean.xy),
        np.sqrt(np.asarray(expect.xy)) * np.asarray(x0.xy),
        rtol=1e-4, atol=1e-5)


def test_eps_xstart_inverse():
    tables = _tables()
    x0 = _x0(jax.random.PRNGKey(3))
    noise = randn(jax.random.PRNGKey(4), 2, 4, (8, 6, 4))
    t = jnp.full((2,), 61, jnp.int32)
    xt = gd.q_sample(tables, x0, t, noise)
    eps = gd.predict_eps_from_xstart(tables, xt, t, x0)
    np.testing.assert_allclose(np.asarray(eps.xy), np.asarray(noise.xy),
                               rtol=1e-3, atol=1e-3)
    x0_rec = gd.predict_xstart_from_eps(tables, xt, t, noise)
    np.testing.assert_allclose(np.asarray(x0_rec.xy), np.asarray(x0.xy),
                               rtol=1e-3, atol=1e-3)


def test_p_mean_variance_start_x():
    """With START_X the model output (clipped) IS pred_xstart and the mean is
    the posterior mean (`gaussian_diffusion.py:306-315`)."""
    tables = _tables()
    cfg = _cfg()
    x = _x0(jax.random.PRNGKey(5))
    pred = x.map(lambda p: p * 3.0)  # exceeds [-1,1] to exercise clipping

    def model(xt, tt):
        return pred

    t = jnp.full((2,), 50, jnp.int32)
    out = gd.p_mean_variance(model, tables, cfg, x, t, clip_denoised=True)
    clipped = pred.map(lambda p: jnp.clip(p, -1, 1))
    np.testing.assert_allclose(np.asarray(out.pred_xstart.xy),
                               np.asarray(clipped.xy))
    expect_mean = gd.q_posterior_mean(tables, clipped, x, t)
    np.testing.assert_allclose(np.asarray(out.mean.xy),
                               np.asarray(expect_mean.xy), rtol=1e-5)
    # FIXED_LARGE log-variance table check
    np.testing.assert_allclose(
        np.asarray(out.log_variance.xy)[0, 0, 0, 0],
        np.asarray(tables["fixed_large_log_variance"])[50], rtol=1e-6)


def test_training_losses_per_plane():
    tables = _tables()
    cfg = _cfg()
    x0 = _x0(jax.random.PRNGKey(6))

    def model(xt, tt):
        return xt.map(jnp.zeros_like)  # predicts 0 -> target=x0, mse=E[x0^2]

    t = jnp.full((2,), 10, jnp.int32)
    terms = gd.training_losses(model, tables, cfg, x0, t,
                               jax.random.PRNGKey(7))
    for k in ("mse_xy", "mse_xz", "mse_yz", "loss"):
        assert terms[k].shape == (2,)
    np.testing.assert_allclose(
        np.asarray(terms["mse_xy"]),
        np.mean(np.asarray(x0.xy) ** 2, axis=(1, 2, 3)), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(terms["loss"]),
        np.asarray(terms["mse_xy"] + terms["mse_xz"] + terms["mse_yz"]),
        rtol=1e-6)


def test_ddim_eta0_deterministic():
    tables = _tables()
    cfg = _cfg()
    x = _x0(jax.random.PRNGKey(8))

    def model(xt, tt):
        return xt.map(lambda p: jnp.tanh(p))

    t = jnp.full((2,), 42, jnp.int32)
    s1 = gd.ddim_sample_step(model, tables, cfg, x, t,
                             jax.random.PRNGKey(100), eta=0.0)
    s2 = gd.ddim_sample_step(model, tables, cfg, x, t,
                             jax.random.PRNGKey(999), eta=0.0)
    np.testing.assert_allclose(np.asarray(s1.xy), np.asarray(s2.xy))


def test_p_sample_t0_no_noise():
    """At t=0 no noise is added (`gaussian_diffusion.py:432-439`)."""
    tables = _tables()
    cfg = _cfg()
    x = _x0(jax.random.PRNGKey(9))

    def model(xt, tt):
        return xt.map(lambda p: jnp.tanh(p))

    t0 = jnp.zeros((2,), jnp.int32)
    s1 = gd.p_sample_step(model, tables, cfg, x, t0, jax.random.PRNGKey(0))
    s2 = gd.p_sample_step(model, tables, cfg, x, t0, jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(s1.xy), np.asarray(s2.xy))


def test_masked_ddim_loop_invariants():
    """Masked generation (`gaussian_diffusion.py:566-577`): a keep-all
    mask with is_mask_t0 reproduces y0 exactly; a keep-nothing mask
    reproduces the unmasked chain exactly."""
    from sin3dm_tpu.diffusion.sampling import ddim_sample_loop

    # T=100: the reference's linear schedule scales beta_max by 1000/T,
    # so very small T degenerates (beta_T=1 -> acp=0 -> inf recip tables)
    tables = _tables(100)
    cfg = _cfg()

    def model(xt, tt):
        return xt.map(lambda p: jnp.tanh(p))

    key = jax.random.PRNGKey(11)
    sizes = (8, 6, 4)
    y0 = randn(jax.random.PRNGKey(12), 1, 4, sizes).map(jnp.tanh)
    ones = y0.map(jnp.ones_like)

    kept = ddim_sample_loop(model, tables, cfg, key, 1, 4, sizes,
                            y0=y0, mask=ones, is_mask_t0=True)
    np.testing.assert_allclose(np.asarray(kept.xy), np.asarray(y0.xy),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(kept.yz), np.asarray(y0.yz),
                               atol=1e-6)

    free = ddim_sample_loop(model, tables, cfg, key, 1, 4, sizes,
                            y0=y0, mask=ones.map(jnp.zeros_like))
    plain = ddim_sample_loop(model, tables, cfg, key, 1, 4, sizes)
    np.testing.assert_allclose(np.asarray(free.xy), np.asarray(plain.xy),
                               atol=1e-6)


def test_region_keep_masks_footprints():
    """region_keep_masks: a plane cell is regenerated (0) only when its
    footprint is inside the box AND the box spans the plane's missing
    axis, so kept 3D points never read a regenerated cell."""
    from sin3dm_tpu.diffusion.sampling import region_keep_masks

    # half-H box spanning full y and z
    m = region_keep_masks((8, 6, 4), (0.0, 0.5, 0.0, 1.0, 0.0, 1.0))
    assert m.xy.shape == (8, 6, 1)
    assert m.xz.shape == (8, 4, 1)
    assert m.yz.shape == (6, 4, 1)
    np.testing.assert_array_equal(np.asarray(m.xy[:4, :, 0]), 0.0)
    np.testing.assert_array_equal(np.asarray(m.xy[4:, :, 0]), 1.0)
    np.testing.assert_array_equal(np.asarray(m.xz[:4, :, 0]), 0.0)
    np.testing.assert_array_equal(np.asarray(m.xz[4:, :, 0]), 1.0)
    # box does NOT span all of H -> every yz cell supports kept points
    np.testing.assert_array_equal(np.asarray(m.yz[..., 0]), 1.0)

    # half-D box spanning full x and y: only xz and yz regenerate
    mz = region_keep_masks((8, 6, 4), (0.0, 1.0, 0.0, 1.0, 0.5, 1.0))
    np.testing.assert_array_equal(np.asarray(mz.xy[..., 0]), 1.0)
    np.testing.assert_array_equal(np.asarray(mz.xz[:, :2, 0]), 1.0)
    np.testing.assert_array_equal(np.asarray(mz.xz[:, 2:, 0]), 0.0)
    np.testing.assert_array_equal(np.asarray(mz.yz[:, :2, 0]), 1.0)
    np.testing.assert_array_equal(np.asarray(mz.yz[:, 2:, 0]), 0.0)


def test_respaced_model_timestep_remap():
    tables = _tables(100, "ddim10")
    cfg = _cfg(original_num_steps=100)
    t = jnp.arange(10, dtype=jnp.int32)
    remapped = gd.model_timesteps(tables, cfg, t)
    np.testing.assert_array_equal(np.asarray(remapped),
                                  np.arange(0, 100, 10))


def test_normal_kl_zero():
    kl = gd.normal_kl(1.5, 0.3, 1.5, 0.3)
    assert float(kl) == pytest.approx(0.0, abs=1e-6)


def test_discretized_gaussian_ll_sums_to_one_ish():
    # likelihood of x under its own mean with moderate scale is high
    x = jnp.linspace(-0.9, 0.9, 11)
    ll = gd.discretized_gaussian_log_likelihood(
        x, means=x, log_scales=jnp.full_like(x, -5.0))
    assert np.all(np.asarray(ll) > -3.0)


def test_q_mean_variance():
    """q(x_t|x_0) moments match the schedule tables
    (`gaussian_diffusion.py:172-187`)."""
    tables = _tables()
    x0 = _x0(jax.random.PRNGKey(11))
    t = jnp.full((2,), 33, jnp.int32)
    mean, var, log_var = gd.q_mean_variance(tables, x0, t)
    a = float(tables["sqrt_alphas_cumprod"][33])
    acp = float(tables["alphas_cumprod"][33])
    np.testing.assert_allclose(np.asarray(mean.xy), a * np.asarray(x0.xy),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(var.xz)[0, 0, 0, 0], 1.0 - acp,
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(log_var.yz)[0, 0, 0, 0],
                               float(tables["log_one_minus_alphas_cumprod"][33]),
                               rtol=1e-5)


def _toy_model(xt, tt):
    return xt.map(lambda p: jnp.tanh(p))


@pytest.mark.parametrize("snapshot_every,n_expected", [(1, 20), (7, 3), (50, 1)])
def test_p_sample_loop_progressive_matches_final(snapshot_every, n_expected):
    """Last progressive snapshot is bitwise the plain-loop result; snapshot
    count is ceil(T / snapshot_every) (reference generator semantics,
    `gaussian_diffusion.py:488-536`)."""
    from sin3dm_tpu.diffusion import sampling as sp
    tables = _tables(20)
    cfg = _cfg()
    key = jax.random.PRNGKey(42)
    final = sp.p_sample_loop(_toy_model, tables, cfg, key, 2, 4, (8, 6, 4))
    snaps = sp.p_sample_loop_progressive(_toy_model, tables, cfg, key, 2, 4,
                                         (8, 6, 4),
                                         snapshot_every=snapshot_every)
    assert snaps.xy.shape[0] == n_expected
    np.testing.assert_array_equal(np.asarray(snaps.xy[-1]),
                                  np.asarray(final.xy))
    np.testing.assert_array_equal(np.asarray(snaps.yz[-1]),
                                  np.asarray(final.yz))


def test_ddim_sample_loop_progressive_matches_final():
    from sin3dm_tpu.diffusion import sampling as sp
    tables = _tables(100, "ddim10")
    cfg = _cfg(original_num_steps=100)
    key = jax.random.PRNGKey(7)
    final = sp.ddim_sample_loop(_toy_model, tables, cfg, key, 1, 4, (8, 6, 4))
    snaps = sp.ddim_sample_loop_progressive(_toy_model, tables, cfg, key, 1,
                                            4, (8, 6, 4), snapshot_every=3)
    assert snaps.xy.shape[0] == 4  # ceil(10/3)
    np.testing.assert_array_equal(np.asarray(snaps.xy[-1]),
                                  np.asarray(final.xy))


class TestChunkInvariantKeys:
    """Per-sample index keys make sample j a pure function of (seed, j) —
    invariant to chunking (ADVICE r1: --pipeline_chunk changed samples)."""

    def test_p_sample_loop_chunking_invariance(self):
        from sin3dm_tpu.diffusion import sampling as sp
        tables = _tables(20)
        cfg = _cfg()
        seed_key = jax.random.PRNGKey(3)
        # one batch of 4 vs two chunks of 2 vs four chunks of 1
        full = sp.p_sample_loop(_toy_model, tables, cfg,
                                sp.sample_index_keys(seed_key, 0, 4),
                                4, 4, (8, 6, 4))
        for chunk in (2, 1):
            rows = []
            for i in range(0, 4, chunk):
                out = sp.p_sample_loop(_toy_model, tables, cfg,
                                       sp.sample_index_keys(seed_key, i,
                                                            chunk),
                                       chunk, 4, (8, 6, 4))
                rows.append(out)
            for j in range(4):
                got = rows[j // chunk]
                np.testing.assert_array_equal(
                    np.asarray(got.xy[j % chunk]), np.asarray(full.xy[j]))
                np.testing.assert_array_equal(
                    np.asarray(got.yz[j % chunk]), np.asarray(full.yz[j]))

    def test_ddim_loop_chunking_invariance(self):
        from sin3dm_tpu.diffusion import sampling as sp
        tables = _tables(100, "ddim10")
        cfg = _cfg(original_num_steps=100)
        seed_key = jax.random.PRNGKey(5)
        full = sp.ddim_sample_loop(_toy_model, tables, cfg,
                                   sp.sample_index_keys(seed_key, 0, 3),
                                   3, 4, (8, 6, 4), eta=0.5)
        one = sp.ddim_sample_loop(_toy_model, tables, cfg,
                                  sp.sample_index_keys(seed_key, 2, 1),
                                  1, 4, (8, 6, 4), eta=0.5)
        np.testing.assert_array_equal(np.asarray(one.xz[0]),
                                      np.asarray(full.xz[2]))

    def test_progressive_matches_plain_with_key_batch(self):
        from sin3dm_tpu.diffusion import sampling as sp
        tables = _tables(20)
        cfg = _cfg()
        keys = sp.sample_index_keys(jax.random.PRNGKey(9), 0, 2)
        final = sp.p_sample_loop(_toy_model, tables, cfg, keys, 2, 4,
                                 (8, 6, 4))
        snaps = sp.p_sample_loop_progressive(_toy_model, tables, cfg, keys,
                                             2, 4, (8, 6, 4),
                                             snapshot_every=7)
        np.testing.assert_array_equal(np.asarray(snaps.xy[-1]),
                                      np.asarray(final.xy))

    def test_single_key_path_unchanged(self):
        """Legacy single-key behavior still works (joint batch draws)."""
        from sin3dm_tpu.diffusion import sampling as sp
        tables = _tables(20)
        cfg = _cfg()
        key = jax.random.PRNGKey(1)
        a = sp.p_sample_loop(_toy_model, tables, cfg, key, 2, 4, (8, 6, 4))
        b = sp.p_sample_loop(_toy_model, tables, cfg, key, 2, 4, (8, 6, 4))
        np.testing.assert_array_equal(np.asarray(a.xy), np.asarray(b.xy))
