"""Sampling PRNG selection (`sampling.sample_seed_key`).

On TPU the sampling root key defaults to the hardware-backed 'rbg' PRNG
(threefry noise generation measured 0.158 ms/step standalone vs rbg's
0.075 at towerruins scale — artifacts/chain_breakdown_r5.txt); CPU keeps
threefry.  Whatever the impl, per-sample keys must stay
chunking-invariant: sample j is a pure function of (seed, j).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sin3dm_tpu.diffusion.gaussian import DiffusionConfig
from sin3dm_tpu.diffusion.sampling import (make_jit_sampler,
                                           sample_index_keys,
                                           sample_seed_key)
from sin3dm_tpu.diffusion.schedule import make_schedule
from sin3dm_tpu.models.unet import UNetConfig, init_unet, unet_apply


def test_default_impl_is_threefry_on_cpu():
    key = sample_seed_key(0)
    assert "fry" in str(jax.random.key_impl(key))


@pytest.mark.parametrize("impl", ["threefry2x32", "rbg"])
def test_chunking_invariance_per_impl(impl, monkeypatch):
    monkeypatch.setenv("SIN3DM_SAMPLE_PRNG", impl)
    ucfg = UNetConfig(model_channels=32)
    params = init_unet(jax.random.PRNGKey(0), ucfg)
    tables = {k: jnp.asarray(v)
              for k, v in make_schedule("linear", 50).tables_f32().items()}
    sampler = make_jit_sampler(
        lambda p, x, t: unet_apply(p, ucfg, x, t), tables,
        DiffusionConfig(), params=params)
    both = sampler(sample_index_keys(sample_seed_key(3), 0, 2),
                   2, 12, (8, 8, 8))
    solo = sampler(sample_index_keys(sample_seed_key(3), 1, 1),
                   1, 12, (8, 8, 8))
    assert bool(jnp.isfinite(both.xy).all())
    for a, b in zip(both, solo):
        np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[0]))


def test_env_override(monkeypatch):
    monkeypatch.setenv("SIN3DM_SAMPLE_PRNG", "rbg")
    assert "rbg" in str(jax.random.key_impl(sample_seed_key(1)))
