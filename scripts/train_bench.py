"""Training-throughput microbench (run on the TPU, not part of bench.py):

    PYTHONPATH=.:/root/.axon_site python scripts/train_bench.py

Measures steady-state step time of (a) the fused AE train step at the
reference budget (65,536-point batches, fm_reso-128-scale volume) and
(b) the diffusion train step at batch 32, towerruins-scale planes, with
steps_per_call fusion.  Compare against the reference's single-GPU
25k-iteration budgets (SURVEY.md §6).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench_ae(sizes=(128, 128, 88), n_pts=65536, iters=30,
             steps_per_call=1):
    from sin3dm_tpu.models import autoencoder as ae
    from sin3dm_tpu.training import ae as ae_train

    acfg = ae.AEConfig()
    rng = np.random.default_rng(0)
    grid_shape = tuple(s * 2 for s in sizes)
    n_grid, n_near = 200_000, 500_000
    data = ae_train.AEData(
        input_grid=jnp.asarray(
            rng.standard_normal((1,) + grid_shape + (4,), ), jnp.float32),
        pts_grid=jnp.asarray(rng.uniform(-1, 1, (n_grid, 3)), jnp.float32),
        sdf_grid=jnp.asarray(rng.uniform(-0.02, 0.02, (n_grid, 1)),
                             jnp.float32),
        pts_near_surf=jnp.asarray(rng.uniform(-1, 1, (n_near, 3)),
                                  jnp.float32),
        sdf_near_surf=jnp.asarray(rng.uniform(-0.02, 0.02, (n_near, 1)),
                                  jnp.float32),
        tex_grid=jnp.asarray(rng.uniform(0, 1, (n_grid, 3)), jnp.float32),
        tex_near_surf=jnp.asarray(rng.uniform(0, 1, (n_near, 3)),
                                  jnp.float32),
        pts_on_surf=None, tex_on_surf=None,
        aabb=jnp.asarray([-1, -1, -1, 1, 1, 1], jnp.float32))

    tcfg = ae_train.AETrainerConfig(enc_batch_size=n_pts)
    params = ae.init_autoencoder(jax.random.PRNGKey(0), acfg)
    labels = ae.geo_param_labels(params)
    opt = ae_train.make_optimizer(tcfg, labels)
    state = ae_train.AETrainState(params, opt.init(params),
                                  jnp.zeros((), jnp.int32))
    step = ae_train.make_train_step(acfg, tcfg, data, 0.0234, labels)

    t0 = time.perf_counter()
    state, m = step(state, data, jax.random.PRNGKey(1))
    jax.block_until_ready(m["loss"])
    print(f"AE step compile+first: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, data, jax.random.PRNGKey(2 + i))
    jax.block_until_ready(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    print(f"AE train step: {dt * 1000:.1f} ms  "
          f"(25k iters -> {dt * 25000 / 60:.1f} min)")
    return dt


def bench_diffusion(sizes=(128, 128, 88), batch=32, iters=30,
                    steps_per_call=10):
    from sin3dm_tpu.core.triplane import randn
    from sin3dm_tpu.diffusion.gaussian import DiffusionConfig
    from sin3dm_tpu.diffusion.schedule import make_schedule
    from sin3dm_tpu.models.unet import UNetConfig, init_unet, unet_apply
    from sin3dm_tpu.training.diffusion import (DiffusionTrainerConfig,
                                               init_train_state,
                                               make_train_step)

    ucfg = UNetConfig(compute_dtype=jnp.bfloat16, fast_norm=True)
    params = init_unet(jax.random.PRNGKey(0), ucfg)
    tables = {k: jnp.asarray(v)
              for k, v in make_schedule("linear", 1000).tables_f32().items()}
    tcfg = DiffusionTrainerConfig(batch_size=batch,
                                  steps_per_call=steps_per_call)
    state = init_train_state(params, tcfg, 1000)
    batch_x = randn(jax.random.PRNGKey(1), batch, 12, sizes)
    step = make_train_step(lambda p, x, t: unet_apply(p, ucfg, x, t),
                           tables, DiffusionConfig(), tcfg)

    t0 = time.perf_counter()
    state, m = step(state, batch_x, jax.random.PRNGKey(2))
    jax.block_until_ready(m["grad_norm"])
    print(f"diffusion step compile+first: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, batch_x, jax.random.PRNGKey(3 + i))
    jax.block_until_ready(m["grad_norm"])
    dt = (time.perf_counter() - t0) / (iters * steps_per_call)
    print(f"diffusion train step (batch {batch}, K={steps_per_call}): "
          f"{dt * 1000:.1f} ms  (25k steps -> {dt * 25000 / 60:.1f} min)")
    return dt


if __name__ == "__main__":
    bench_diffusion()
    bench_ae()
