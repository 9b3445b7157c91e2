"""Fused multi-step training (steps_per_call): K scanned steps must match
K separate dispatches bit-for-bit (same fold_in key schedule)."""

import jax
import jax.numpy as jnp
import numpy as np

from sin3dm_tpu.core.triplane import randn
from sin3dm_tpu.diffusion.gaussian import DiffusionConfig
from sin3dm_tpu.diffusion.schedule import make_schedule
from sin3dm_tpu.models.unet import UNetConfig, init_unet, unet_apply
from sin3dm_tpu.training.diffusion import (DiffusionTrainerConfig,
                                           init_train_state, make_train_step)


def test_fused_steps_match_sequential():
    ucfg = UNetConfig(in_channels=4, model_channels=32, out_channels=4)
    params = init_unet(jax.random.PRNGKey(0), ucfg)
    tables = {k: jnp.asarray(v)
              for k, v in make_schedule("linear", 50).tables_f32().items()}
    dcfg = DiffusionConfig(original_num_steps=50)
    batch = randn(jax.random.PRNGKey(1), 4, 4, (8, 8, 8))
    key = jax.random.PRNGKey(2)
    apply = lambda p, x, t: unet_apply(p, ucfg, x, t)

    K = 4
    tcfg_seq = DiffusionTrainerConfig(lr_anneal_steps=100, batch_size=4)
    state_seq = init_train_state(
        jax.tree_util.tree_map(jnp.copy, params), tcfg_seq, 50)
    step_seq = make_train_step(apply, tables, dcfg, tcfg_seq)
    losses_seq = []
    for i in range(K):
        state_seq, m = step_seq(state_seq, batch, jax.random.fold_in(key, i))
        losses_seq.append(np.asarray(m["loss"]))

    tcfg_fused = DiffusionTrainerConfig(lr_anneal_steps=100, batch_size=4,
                                        steps_per_call=K)
    state_fused = init_train_state(
        jax.tree_util.tree_map(jnp.copy, params), tcfg_fused, 50)
    step_fused = make_train_step(apply, tables, dcfg, tcfg_fused)
    state_fused, mf = step_fused(state_fused, batch, key)

    # per-example losses across all K steps, flattened in step order
    np.testing.assert_allclose(np.asarray(mf["loss"]),
                               np.concatenate(losses_seq), rtol=1e-4,
                               atol=1e-5)
    # final params equal up to scan-vs-loop fusion reassociation (the
    # zero-init out-conv leaves are ~1e-6 after 4 Adam steps, so compare
    # with an absolute floor)
    a = jax.tree_util.tree_leaves(state_seq.params)
    b = jax.tree_util.tree_leaves(state_fused.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-3,
                                   atol=1e-5)
    assert int(state_fused.step) == K
