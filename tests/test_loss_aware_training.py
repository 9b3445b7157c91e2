"""Loss-second-moment schedule sampler wired through the jitted train
step (the reference's LossAwareSampler path, `resample.py:106-154` +
`train_util.py:224-227`)."""

import jax
import jax.numpy as jnp
import numpy as np

from sin3dm_tpu.core.triplane import randn
from sin3dm_tpu.diffusion.gaussian import DiffusionConfig
from sin3dm_tpu.diffusion.schedule import make_schedule
from sin3dm_tpu.models.unet import UNetConfig, init_unet, unet_apply
from sin3dm_tpu.training.diffusion import (DiffusionTrainerConfig,
                                           init_train_state, make_train_step)


def test_loss_aware_sampler_in_train_step():
    ucfg = UNetConfig(in_channels=4, model_channels=32, out_channels=4)
    params = init_unet(jax.random.PRNGKey(0), ucfg)
    T = 20
    tables = {k: jnp.asarray(v)
              for k, v in make_schedule("linear", T).tables_f32().items()}
    tcfg = DiffusionTrainerConfig(lr_anneal_steps=100, batch_size=8,
                                  schedule_sampler="loss-second-moment")
    dcfg = DiffusionConfig(original_num_steps=T)
    state = init_train_state(params, tcfg, T)
    batch = randn(jax.random.PRNGKey(1), 8, 4, (8, 8, 8))
    step = make_train_step(lambda p, x, t: unet_apply(p, ucfg, x, t),
                           tables, dcfg, tcfg)

    counts_before = np.asarray(state.sampler_state.counts)
    assert counts_before.sum() == 0
    for i in range(3):
        state, m = step(state, batch, jax.random.PRNGKey(2 + i))
        assert np.isfinite(float(np.mean(np.asarray(m["loss"]))))
    counts_after = np.asarray(state.sampler_state.counts)
    # history accumulated for the sampled timesteps
    assert counts_after.sum() > 0
    # before warm-up, weights are 1 (uniform regime)
    np.testing.assert_allclose(np.asarray(m["loss_w"]),
                               np.asarray(m["loss"]), rtol=1e-5)
