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
import numpy as np

from ..core.triplane import Triplane, randn
from .gaussian import (DiffusionConfig, ModelFn, ddim_sample_step,
                       p_sample_step)


def sample_seed_key(seed: int) -> jax.Array:
    """Root sampling key, honoring `SIN3DM_SAMPLE_PRNG`.

    On TPU the default PRNG impl is 'rbg' (hardware-backed counter PRNG):
    the chain draws fresh noise every step, and threefry2x32 generation
    measures 0.158 ms/step standalone vs rbg's 0.075 at towerruins scale
    (artifacts/chain_breakdown_r5.txt) — pure VPU work that competes with
    the UNet.  rbg is deterministic per key, so seed-stability and
    chunking-invariance are unchanged; the drawn bits differ from the
    threefry stream (statistically equivalent noise).
    `SIN3DM_SAMPLE_PRNG=threefry2x32` restores the old stream; CPU keeps
    threefry so committed test goldens are stable.
    """
    import os
    impl = os.environ.get("SIN3DM_SAMPLE_PRNG")
    if impl is None:
        impl = "rbg" if jax.default_backend() == "tpu" else "threefry2x32"
    return jax.random.key(seed, impl=impl)


def sample_index_keys(seed_key: jax.Array, start: int,
                      batch: int) -> jax.Array:
    """Per-sample keys derived from GLOBAL sample indices.

    Passing the resulting key batch to the samplers makes sample `i`
    depend only on `(seed_key, i)` — identical across any chunking of the
    sampling loop (``--pipeline_chunk``, ``--diff_batch_size``) and across
    the mesh/vox CLI paths.
    """
    idx = jnp.arange(start, start + batch)
    return jax.vmap(lambda i: jax.random.fold_in(seed_key, i))(idx)


def _is_key_batch(key: jax.Array, batch: int) -> bool:
    """True when `key` is a [batch] stack of per-sample keys (typed keys
    have shape (batch,), legacy uint32 keys (batch, 2))."""
    if jax.dtypes.issubdtype(key.dtype, jax.dtypes.prng_key):
        return key.ndim == 1 and key.shape[0] == batch
    return key.ndim == 2 and key.shape[0] == batch


def _randn_per_sample(keys: jax.Array, channels: int,
                      sizes: Tuple[int, int, int],
                      dtype=jnp.float32) -> Triplane:
    """Batch of per-sample standard-normal triplanes: row j is a pure
    function of keys[j]."""
    H, W, D = sizes

    def one(k):
        k1, k2, k3 = jax.random.split(k, 3)
        return Triplane(
            jax.random.normal(k1, (H, W, channels), dtype),
            jax.random.normal(k2, (H, D, channels), dtype),
            jax.random.normal(k3, (W, D, channels), dtype))

    return jax.vmap(one)(keys)


def _randn_per_sample_like(keys: jax.Array, x: Triplane) -> Triplane:
    def one(k, xy, xz, yz):
        k1, k2, k3 = jax.random.split(k, 3)
        return Triplane(jax.random.normal(k1, xy.shape, xy.dtype),
                        jax.random.normal(k2, xz.shape, xz.dtype),
                        jax.random.normal(k3, yz.shape, yz.dtype))
    return jax.vmap(one)(keys, x.xy, x.xz, x.yz)


def _init_noise_and_stepper(key, batch, channels, sizes,
                            noise: Optional[Triplane]):
    """Shared key plumbing for the sampling loops.

    Single key (legacy): joint batch draws, step noise from fold_in(key, t).
    Key batch [batch]: per-sample draws — sample j's chain is a pure
    function of key[j], so results are chunking-invariant.
    Returns (x0, step_noise_fn) with step_noise_fn(x, t_scalar) -> Triplane.
    """
    if _is_key_batch(key, batch):
        keys = key
        init_keys = jax.vmap(lambda k: jax.random.fold_in(k, 0xFFFFFFFF))(keys)
        x = (noise if noise is not None
             else _randn_per_sample(init_keys, channels, sizes))

        def step_noise(x, t):
            kt = jax.vmap(lambda k: jax.random.fold_in(k, t))(keys)
            return _randn_per_sample_like(kt, x)

        return x, step_noise

    key, nk = jax.random.split(key)
    x = noise if noise is not None else randn(nk, batch, channels, sizes)

    def step_noise(x, t):
        from ..core.triplane import randn_like
        return randn_like(jax.random.fold_in(key, t), x)

    return x, step_noise


def p_sample_loop(model: ModelFn, tables, cfg: DiffusionConfig,
                  key: jax.Array, batch: int, channels: int,
                  sizes: Tuple[int, int, int],
                  noise: Optional[Triplane] = None,
                  clip_denoised: bool = True) -> Triplane:
    """Ancestral DDPM sampling from pure noise. Returns the final sample.

    `key` is either one key (joint batch draws) or a [batch] key stack
    from :func:`sample_index_keys` (per-sample, chunking-invariant)."""
    T = tables["betas"].shape[0]
    x, step_noise = _init_noise_and_stepper(key, batch, channels, sizes,
                                            noise)

    def body(x, t):
        tb = jnp.full((batch,), t, dtype=jnp.int32)
        x = p_sample_step(model, tables, cfg, x, tb, None,
                          clip_denoised=clip_denoised,
                          noise=step_noise(x, t))
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
    generation (`gaussian_diffusion.py:566-577`).  `key` as in
    :func:`p_sample_loop`."""
    T = tables["betas"].shape[0]
    x, step_noise = _init_noise_and_stepper(key, batch, channels, sizes,
                                            noise)

    def body(x, t):
        tb = jnp.full((batch,), t, dtype=jnp.int32)
        x = ddim_sample_step(model, tables, cfg, x, tb, None, eta=eta,
                             clip_denoised=clip_denoised, y0=y0, mask=mask,
                             is_mask_t0=is_mask_t0,
                             noise=step_noise(x, t))
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
    x, step_noise = _init_noise_and_stepper(key, batch, channels, sizes,
                                            noise)

    def step(x, t):
        tb = jnp.full((batch,), t, dtype=jnp.int32)
        return p_sample_step(model, tables, cfg, x, tb, None,
                             clip_denoised=clip_denoised,
                             noise=step_noise(x, t))

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
    x, step_noise = _init_noise_and_stepper(key, batch, channels, sizes,
                                            noise)

    def step(x, t):
        tb = jnp.full((batch,), t, dtype=jnp.int32)
        return ddim_sample_step(model, tables, cfg, x, tb, None, eta=eta,
                                clip_denoised=clip_denoised, y0=y0, mask=mask,
                                is_mask_t0=is_mask_t0,
                                noise=step_noise(x, t))

    ts = jnp.arange(T - 1, -1, -1, dtype=jnp.int32)
    return _chunked_progressive(step, x, ts, snapshot_every)


def region_keep_masks(sizes: Tuple[int, int, int],
                      region: Tuple[float, float, float, float, float, float]
                      ) -> Triplane:
    """Per-plane keep-masks (1 = keep y0, 0 = regenerate) from a
    fractional 3D box `(x0, x1, y0, y1, z0, z1)` in [0, 1] of (H, W, D).

    Triplane features are 3D-ambiguous: an (h, w) cell of the xy plane
    contributes to EVERY z.  A plane cell is therefore regenerated only
    when NO kept 3D point reads it — i.e. its footprint lies inside the
    box AND the box spans the plane's missing axis completely.  This is
    conservative: with `is_mask_t0` the decode outside the box is exactly
    preserved.  (The reference's mask is a raw composed-map mask with the
    same ambiguity, `gaussian_diffusion.py:566-577`.)  Shapes [H, W, 1]
    etc. broadcast over [B, H, W, C]."""
    H, W, D = sizes
    x0, x1, y0, y1, z0, z1 = region

    def seg(n, a, b):
        i = np.arange(n)
        return ((i >= int(round(a * n)))
                & (i < int(round(b * n)))).astype(np.float32)

    mx, my, mz = seg(H, x0, x1), seg(W, y0, y1), seg(D, z0, z1)
    fx, fy, fz = (float(m.all()) for m in (mx, my, mz))
    return Triplane(
        jnp.asarray(1.0 - mx[:, None] * my[None, :] * fz)[..., None],
        jnp.asarray(1.0 - mx[:, None] * mz[None, :] * fy)[..., None],
        jnp.asarray(1.0 - my[:, None] * mz[None, :] * fx)[..., None])


def make_jit_sampler(model: ModelFn, tables, cfg: DiffusionConfig,
                     use_ddim: bool = False, eta: float = 0.0,
                     clip_denoised: bool = True, mesh=None,
                     y0: Optional[Triplane] = None,
                     mask: Optional[Triplane] = None,
                     is_mask_t0: bool = False,
                     spatial_mesh=None,
                     params=None):
    """Return a jitted `sample(key, batch, channels, sizes) -> Triplane`.

    batch/channels/sizes are static args; tables are captured as constants.

    With `params`, `model` is called as `model(params, x, t)` and the
    weights ride as a jit ARGUMENT instead of closure constants.  Use
    this form for real checkpoints: constants are baked into the
    serialized executable (measured 68 MB for the default UNet chain,
    ~2 min to load through the remote-compile tunnel's persistent-cache
    hit path) and make the cache key weight-dependent — as an argument,
    the compiled chain is weight-independent, so switching checkpoints
    reuses the same executable.

    With a `mesh`, sample-time data parallelism: the initial noise (and
    therefore the whole reverse chain) is sharded over the 'data' axis —
    each chip denoises its slice of the batch independently (SURVEY.md
    §2.3: n_samples shards trivially).

    With a `spatial_mesh` (parallel/halo.py), plane-SPATIAL sharding: the
    chain state's dim 1 shards over 'space' (pair with a UNetConfig built
    with the same spatial_mesh) — the escalation path for retargeted
    planes that exceed one chip's HBM.

    With `y0`/`mask` (DDIM only, `gaussian_diffusion.py:566-577`):
    masked generation — pred_xstart is blended to `mask * y0 +
    (1-mask) * pred_xstart` each step, i.e. mask=1 keeps y0.
    """
    if (y0 is not None or mask is not None) and not use_ddim:
        raise ValueError("masked generation (y0/mask) requires use_ddim")
    if mesh is not None and spatial_mesh is not None:
        raise ValueError("combine DP and spatial sharding via one mesh "
                         "with both axes instead of two meshes")

    if params is not None:
        # pin the weights to device ONCE: checkpoint loaders hand back
        # host numpy arrays, and jit arguments (unlike closure constants)
        # would re-upload them on every sampler call
        if mesh is not None or spatial_mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            m = mesh if mesh is not None else spatial_mesh
            params = jax.device_put(params, NamedSharding(m, P()))
        else:
            params = jax.device_put(params)

    def fn(params_, key, batch, channels, sizes):
        model_ = (model if params_ is None
                  else (lambda x, t: model(params_, x, t)))
        noise = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            if _is_key_batch(key, batch):
                init_keys = jax.vmap(
                    lambda k: jax.random.fold_in(k, 0xFFFFFFFF))(key)
                noise = _randn_per_sample(init_keys, channels, sizes)
            else:
                key, nk = jax.random.split(key)
                noise = randn(nk, batch, channels, sizes)
            sh = NamedSharding(mesh, P("data"))
            noise = noise.map(
                lambda p: jax.lax.with_sharding_constraint(p, sh))
        elif spatial_mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from ..parallel.halo import AXIS
            if _is_key_batch(key, batch):
                init_keys = jax.vmap(
                    lambda k: jax.random.fold_in(k, 0xFFFFFFFF))(key)
                noise = _randn_per_sample(init_keys, channels, sizes)
            else:
                key, nk = jax.random.split(key)
                noise = randn(nk, batch, channels, sizes)
            sh = NamedSharding(spatial_mesh, P(None, AXIS))
            noise = noise.map(
                lambda p: jax.lax.with_sharding_constraint(p, sh))
        if use_ddim:
            return ddim_sample_loop(model_, tables, cfg, key, batch,
                                    channels, sizes, noise=noise, eta=eta,
                                    clip_denoised=clip_denoised,
                                    y0=y0, mask=mask, is_mask_t0=is_mask_t0)
        return p_sample_loop(model_, tables, cfg, key, batch, channels,
                             sizes, noise=noise, clip_denoised=clip_denoised)

    jfn = jax.jit(fn, static_argnums=(2, 3, 4))

    def sample(key, batch, channels, sizes):
        return jfn(params, key, batch, channels, sizes)

    return sample
