"""Beta schedules and respacing vs the reference's float64 formulas
(`gaussian_diffusion.py:19-63, 133-170`, `respace.py:7-86`)."""

import numpy as np
import pytest

from sin3dm_tpu.diffusion.schedule import (DiffusionSchedule,
                                           get_named_beta_schedule,
                                           make_schedule, space_timesteps)


def test_linear_schedule_values():
    betas = get_named_beta_schedule("linear", 1000)
    assert betas.dtype == np.float64
    assert betas[0] == pytest.approx(0.0001)
    assert betas[-1] == pytest.approx(0.02)
    # scale-invariance rule: T=500 -> scale 2
    b500 = get_named_beta_schedule("linear", 500)
    assert b500[0] == pytest.approx(0.0002)
    assert b500[-1] == pytest.approx(0.04)


def test_cosine_schedule_bounds():
    betas = get_named_beta_schedule("cosine", 1000)
    assert (betas > 0).all() and (betas <= 0.999).all()


def test_derived_tables_identities():
    sched = make_schedule("linear", 1000)
    acp = sched.alphas_cumprod
    np.testing.assert_allclose(acp, np.cumprod(1.0 - sched.betas))
    np.testing.assert_allclose(sched.alphas_cumprod_prev[1:], acp[:-1])
    assert sched.alphas_cumprod_prev[0] == 1.0
    np.testing.assert_allclose(
        sched.posterior_variance,
        sched.betas * (1 - sched.alphas_cumprod_prev) / (1 - acp))
    # posterior mean coefs sum: c1 + c2*sqrt(acp_t/acp_{t-1})... identity:
    # q_posterior(x0=x0, xt=sqrt(acp)x0) mean should be sqrt(acp_prev) x0
    t = 123
    mean_coef = (sched.posterior_mean_coef1[t]
                 + sched.posterior_mean_coef2[t] * sched.sqrt_alphas_cumprod[t])
    assert mean_coef == pytest.approx(np.sqrt(sched.alphas_cumprod_prev[t]))


def test_space_timesteps_ddim():
    steps = space_timesteps(1000, "ddim100")
    assert steps == set(range(0, 1000, 10))
    with pytest.raises(ValueError):
        space_timesteps(1000, "ddim999")


def test_space_timesteps_sections():
    steps = space_timesteps(300, [10, 15, 20])
    assert len(steps) == 45
    steps = space_timesteps(1000, "250")
    assert len(steps) == 250
    assert 0 in steps and 999 in steps


def test_respaced_alphas_preserved():
    """SpacedDiffusion invariant (`respace.py:78-85`): the respaced process
    hits the same alpha_cumprod values at the kept steps."""
    base = make_schedule("linear", 1000)
    spaced = make_schedule("linear", 1000, "ddim50")
    assert spaced.num_timesteps == 50
    np.testing.assert_allclose(
        spaced.alphas_cumprod,
        base.alphas_cumprod[spaced.timestep_map], rtol=1e-12)
    assert spaced.original_num_steps == 1000


def test_tables_f32_complete():
    tables = make_schedule("linear", 100).tables_f32()
    for k in ("betas", "sqrt_alphas_cumprod", "posterior_mean_coef1",
              "fixed_large_log_variance", "timestep_map", "log_betas"):
        assert k in tables
    assert tables["timestep_map"].dtype == np.int32
    np.testing.assert_array_equal(tables["timestep_map"], np.arange(100))
