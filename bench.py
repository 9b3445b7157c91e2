"""Headline benchmark: 1000-step DDPM sampling of 4 triplanes on one chip.

Reference baseline (BASELINE.md): generation of 4 samples with default
settings takes 30-50 s on an NVIDIA A6000 (`src/app.py:12`) — that figure
includes mesh decode; until the geometry stage lands in bench we compare
against the sampling-dominated midpoint 40 s (1000 sequential UNet calls
dominate the reference pipeline).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The sampler is a single jitted lax.scan program (no host sync per step);
the UNet torso runs in bfloat16 on the MXU.  Compile time is excluded
(one warmup call), matching how the reference amortizes cuDNN autotune.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp


def main():
    from sin3dm_tpu.diffusion.gaussian import DiffusionConfig
    from sin3dm_tpu.diffusion.sampling import make_jit_sampler
    from sin3dm_tpu.diffusion.schedule import make_schedule
    from sin3dm_tpu.models.unet import UNetConfig, init_unet, unet_apply

    # towerruins-scale triplane (fm_reso 128 -> anisotropic planes)
    sizes = (128, 128, 88)
    batch = 4
    steps = 1000
    baseline_seconds = 40.0

    ucfg = UNetConfig(compute_dtype=jnp.bfloat16)  # 12ch, mc64, mult (1,2)
    params = init_unet(jax.random.PRNGKey(0), ucfg)
    tables = {k: jnp.asarray(v)
              for k, v in make_schedule("linear", steps).tables_f32().items()}
    dcfg = DiffusionConfig()

    sampler = make_jit_sampler(
        lambda x, t: unet_apply(params, ucfg, x, t), tables, dcfg)

    # warmup / compile
    out = sampler(jax.random.PRNGKey(1), batch, ucfg.in_channels, sizes)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    out = sampler(jax.random.PRNGKey(2), batch, ucfg.in_channels, sizes)
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - t0

    print(json.dumps({
        "metric": "ddpm1000_sample_b4_wallclock",
        "value": round(elapsed, 3),
        "unit": "seconds",
        "vs_baseline": round(baseline_seconds / elapsed, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
