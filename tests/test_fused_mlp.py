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
