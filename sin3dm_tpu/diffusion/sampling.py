"""Jitted `lax.scan` samplers — TPU-native replacement for the reference's
Python-loop `p_sample_loop` / `ddim_sample_loop`
(`/root/reference/src/diffusion/gaussian_diffusion.py:442-536, 640-734`).

The full reverse chain compiles to ONE XLA program: no host round-trip per
step, which is what makes 1000-step DDPM fast on TPU.  The model, tables and
config are closed over; batch/sizes are static per compilation (a new
triplane size — e.g. `--resize` retargeting — triggers exactly one
recompile, then hits the jit cache).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.triplane import Triplane, randn
from .gaussian import (DiffusionConfig, ModelFn, ddim_sample_step,
                       p_sample_step)


def p_sample_loop(model: ModelFn, tables, cfg: DiffusionConfig,
                  key: jax.Array, batch: int, channels: int,
                  sizes: Tuple[int, int, int],
                  noise: Optional[Triplane] = None,
                  clip_denoised: bool = True) -> Triplane:
    """Ancestral DDPM sampling from pure noise. Returns the final sample."""
    T = tables["betas"].shape[0]
    key, nk = jax.random.split(key)
    x = noise if noise is not None else randn(nk, batch, channels, sizes)

    def body(x, t):
        step_key = jax.random.fold_in(key, t)
        tb = jnp.full((batch,), t, dtype=jnp.int32)
        x = p_sample_step(model, tables, cfg, x, tb, step_key,
                          clip_denoised=clip_denoised)
        return x, None

    ts = jnp.arange(T - 1, -1, -1, dtype=jnp.int32)
    x, _ = jax.lax.scan(body, x, ts)
    return x


def ddim_sample_loop(model: ModelFn, tables, cfg: DiffusionConfig,
                     key: jax.Array, batch: int, channels: int,
                     sizes: Tuple[int, int, int],
                     noise: Optional[Triplane] = None,
                     eta: float = 0.0, clip_denoised: bool = True,
                     y0: Optional[Triplane] = None,
                     mask: Optional[Triplane] = None,
                     is_mask_t0: bool = False) -> Triplane:
    """DDIM sampling over the (respaced) schedule, optional masked
    generation (`gaussian_diffusion.py:566-577`)."""
    T = tables["betas"].shape[0]
    key, nk = jax.random.split(key)
    x = noise if noise is not None else randn(nk, batch, channels, sizes)

    def body(x, t):
        step_key = jax.random.fold_in(key, t)
        tb = jnp.full((batch,), t, dtype=jnp.int32)
        x = ddim_sample_step(model, tables, cfg, x, tb, step_key, eta=eta,
                             clip_denoised=clip_denoised, y0=y0, mask=mask,
                             is_mask_t0=is_mask_t0)
        return x, None

    ts = jnp.arange(T - 1, -1, -1, dtype=jnp.int32)
    x, _ = jax.lax.scan(body, x, ts)
    return x


def _chunked_progressive(step, x, ts, snapshot_every: int) -> Triplane:
    """Run `step` over every t in `ts`, emitting the state after each
    `snapshot_every` steps (and always after the final step).  Returns a
    Triplane stack with a leading snapshot axis [S, B, ...].

    TPU-native shape of the reference's per-step generator
    (`gaussian_diffusion.py:488-536`): the chain still compiles to scans
    (no host round-trip per step); only the snapshots are materialized,
    so memory is S x state instead of T x state."""
    T = int(ts.shape[0])
    k = max(1, min(int(snapshot_every), T))
    n_full, rem = divmod(T, k)

    def run(x, ts_slice):
        def body(x2, t):
            return step(x2, t), None
        x, _ = jax.lax.scan(body, x, ts_slice)
        return x

    snaps = None
    if n_full:
        def chunk(x, ts_chunk):
            x = run(x, ts_chunk)
            return x, x
        x, snaps = jax.lax.scan(chunk, x, ts[:n_full * k].reshape(n_full, k))
    if rem:
        x = run(x, ts[n_full * k:])
        tail = jax.tree.map(lambda a: a[None], x)
        snaps = tail if snaps is None else jax.tree.map(
            lambda a, b: jnp.concatenate([a, b], axis=0), snaps, tail)
    return snaps


def p_sample_loop_progressive(model: ModelFn, tables, cfg: DiffusionConfig,
                              key: jax.Array, batch: int, channels: int,
                              sizes: Tuple[int, int, int],
                              noise: Optional[Triplane] = None,
                              clip_denoised: bool = True,
                              snapshot_every: int = 1) -> Triplane:
    """DDPM sampling with intermediate snapshots
    (`gaussian_diffusion.py:488-536`).  Returns a Triplane stack
    [S, B, ...]; the last snapshot is bitwise-identical to
    `p_sample_loop` with the same key."""
    T = tables["betas"].shape[0]
    key, nk = jax.random.split(key)
    x = noise if noise is not None else randn(nk, batch, channels, sizes)

    def step(x, t):
        step_key = jax.random.fold_in(key, t)
        tb = jnp.full((batch,), t, dtype=jnp.int32)
        return p_sample_step(model, tables, cfg, x, tb, step_key,
                             clip_denoised=clip_denoised)

    ts = jnp.arange(T - 1, -1, -1, dtype=jnp.int32)
    return _chunked_progressive(step, x, ts, snapshot_every)


def ddim_sample_loop_progressive(model: ModelFn, tables,
                                 cfg: DiffusionConfig, key: jax.Array,
                                 batch: int, channels: int,
                                 sizes: Tuple[int, int, int],
                                 noise: Optional[Triplane] = None,
                                 eta: float = 0.0,
                                 clip_denoised: bool = True,
                                 y0: Optional[Triplane] = None,
                                 mask: Optional[Triplane] = None,
                                 is_mask_t0: bool = False,
                                 snapshot_every: int = 1) -> Triplane:
    """DDIM sampling with intermediate snapshots
    (`gaussian_diffusion.py:680-734`); same contract as
    :func:`p_sample_loop_progressive`."""
    T = tables["betas"].shape[0]
    key, nk = jax.random.split(key)
    x = noise if noise is not None else randn(nk, batch, channels, sizes)

    def step(x, t):
        step_key = jax.random.fold_in(key, t)
        tb = jnp.full((batch,), t, dtype=jnp.int32)
        return ddim_sample_step(model, tables, cfg, x, tb, step_key, eta=eta,
                                clip_denoised=clip_denoised, y0=y0, mask=mask,
                                is_mask_t0=is_mask_t0)

    ts = jnp.arange(T - 1, -1, -1, dtype=jnp.int32)
    return _chunked_progressive(step, x, ts, snapshot_every)


def make_jit_sampler(model: ModelFn, tables, cfg: DiffusionConfig,
                     use_ddim: bool = False, eta: float = 0.0,
                     clip_denoised: bool = True, mesh=None):
    """Return a jitted `sample(key, batch, channels, sizes) -> Triplane`.

    batch/channels/sizes are static args; tables are captured as constants.

    With a `mesh`, sample-time data parallelism: the initial noise (and
    therefore the whole reverse chain) is sharded over the 'data' axis —
    each chip denoises its slice of the batch independently (SURVEY.md
    §2.3: n_samples shards trivially).
    """
    def fn(key, batch, channels, sizes):
        noise = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from ..core.triplane import randn as _randn
            key, nk = jax.random.split(key)
            noise = _randn(nk, batch, channels, sizes)
            sh = NamedSharding(mesh, P("data"))
            noise = noise.map(
                lambda p: jax.lax.with_sharding_constraint(p, sh))
        if use_ddim:
            return ddim_sample_loop(model, tables, cfg, key, batch, channels,
                                    sizes, noise=noise, eta=eta,
                                    clip_denoised=clip_denoised)
        return p_sample_loop(model, tables, cfg, key, batch, channels, sizes,
                             noise=noise, clip_denoised=clip_denoised)

    return jax.jit(fn, static_argnums=(1, 2, 3))
