"""Per-component breakdown of the 1000-step sampling chain (VERDICT r4:
account for the ~0.68 ms/step gap between the measured 0.80 ms chain step
and the ~0.12 ms v5e MXU ideal for the 23.6 GFLOP UNet call).

Times jitted 1000-iteration `lax.scan` programs over ablated bodies at
the production configuration (batch 1, towerruins planes 92x128x92,
bfloat16 + fast_norm + fused pallas convs):

    full          the shipped p_sample chain (UNet + posterior + noise)
    model_only    x <- unet(x, t) only
    model_xla     same without the pallas fused-conv path
    model_fp32    same as model_only but fp32 compute (no fused conv)
    sampler_only  identity model: posterior math + clipping + noise
    noise_only    per-step per-sample normal draws only (threefry)
    noise_rbg     same draws under the TPU hardware-backed 'rbg' PRNG

Run on the TPU:  python scripts/chain_breakdown.py
Writes the table to stdout (tee into artifacts/ to commit it).
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

SIZES = (92, 128, 92)
C = 12
T = 1000


def main():
    from sin3dm_tpu.core.compile_cache import enable_compilation_cache
    from sin3dm_tpu.core.triplane import Triplane
    from sin3dm_tpu.diffusion.gaussian import DiffusionConfig, p_sample_step
    from sin3dm_tpu.diffusion.sampling import (_init_noise_and_stepper,
                                               sample_index_keys)
    from sin3dm_tpu.diffusion.schedule import make_schedule
    from sin3dm_tpu.models.unet import UNetConfig, init_unet, unet_apply

    enable_compilation_cache()
    tables = {k: jnp.asarray(v)
              for k, v in make_schedule("linear", T).tables_f32().items()}
    dcfg = DiffusionConfig()
    on_tpu = jax.default_backend() != "cpu"
    ucfg = UNetConfig(compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32,
                      fast_norm=True, fused_conv=on_tpu)
    params = jax.device_put(init_unet(jax.random.PRNGKey(0), ucfg))
    keys = sample_index_keys(jax.random.PRNGKey(7), 0, 1)

    def chain(body_of):
        """jit a 1000-step scan whose body is body_of(x, t, step_noise)."""
        def run(params_, keys_):
            x, step_noise = _init_noise_and_stepper(keys_, 1, C, SIZES, None)
            x = x.astype(ucfg.compute_dtype).astype(jnp.float32)

            def body(x2, t):
                return body_of(params_, x2, t, step_noise), None

            ts = jnp.arange(T - 1, -1, -1, dtype=jnp.int32)
            x, _ = jax.lax.scan(body, x, ts)
            return x
        return jax.jit(run)

    def timed(name, fn, *args, reps=4):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        print(f"{name:16s} {best / T * 1e3:8.4f} ms/step   "
              f"(chain {best:6.3f} s, compile+warm {compile_s:6.1f} s)",
              flush=True)
        return best

    model = lambda p, x, t: unet_apply(p, ucfg, x, t)

    # UNet forward only (decay keeps the carry finite over 1000 steps)
    def model_body(p, x, t, step_noise):
        tb = jnp.full((1,), t, dtype=jnp.int32)
        return model(p, x, tb).map(lambda v: v * 0.5) + x.map(
            lambda v: v * 0.5)

    # posterior math + clipping + noise with an identity model
    def sampler_body(p, x, t, step_noise):
        tb = jnp.full((1,), t, dtype=jnp.int32)
        return p_sample_step(lambda xx, tt: xx, tables, dcfg, x, tb, None,
                             clip_denoised=True, noise=step_noise(x, t))

    # per-step noise generation only
    def noise_body(p, x, t, step_noise):
        n = step_noise(x, t)
        return x.map(lambda v: v * 0.999) + n.map(lambda v: v * 1e-3)

    # the shipped chain: the PRODUCTION make_jit_sampler program (hits the
    # persistent compile cache warmed by bench.py, instead of recompiling
    # a near-copy — full-chain scan compiles take minutes via the tunnel)
    from sin3dm_tpu.diffusion.sampling import make_jit_sampler
    sampler = make_jit_sampler(model, tables, dcfg, params=params)
    full_s = timed("full",
                   lambda k: sampler(k, 1, C, SIZES), keys)

    # small programs first: each compile is cheap, and if the remote
    # compile service stalls we still get a partial table
    sampler_s = timed("sampler_only", chain(sampler_body), params, keys)
    noise_s = timed("noise_only", chain(noise_body), params, keys)
    rbg_keys = jax.random.split(jax.random.key(7, impl="rbg"), 1)
    timed("noise_rbg", chain(noise_body), params, rbg_keys)

    model_s = timed("model_only", chain(model_body), params, keys)
    ucfg_xla = ucfg._replace(fused_conv=False)
    model_x = lambda p, x, t: unet_apply(p, ucfg_xla, x, t)

    def model_xla_body(p, x, t, step_noise):
        tb = jnp.full((1,), t, dtype=jnp.int32)
        return model_x(p, x, tb).map(lambda v: v * 0.5) + x.map(
            lambda v: v * 0.5)

    timed("model_xla", chain(model_xla_body), params, keys)

    ucfg_f32 = ucfg._replace(fused_conv=False, compute_dtype=jnp.float32,
                             fast_norm=False)
    model_f = lambda p, x, t: unet_apply(p, ucfg_f32, x, t)

    def model_f32_body(p, x, t, step_noise):
        tb = jnp.full((1,), t, dtype=jnp.int32)
        return model_f(p, x, tb).map(lambda v: v * 0.5) + x.map(
            lambda v: v * 0.5)

    timed("model_fp32", chain(model_f32_body), params, keys)

    resid = full_s - model_s - (sampler_s - noise_s) - noise_s
    print(f"\nfull = model + sampler-math + noise + residual:"
          f"  residual {resid / T * 1e3:.4f} ms/step")


if __name__ == "__main__":
    main()
