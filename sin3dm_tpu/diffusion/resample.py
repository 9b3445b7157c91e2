"""Timestep samplers (`/root/reference/src/diffusion/resample.py:8-154`).

* `uniform` — the default, and the only one active in the reference runs.
* `loss-second-moment` — importance sampling by a 10-deep running history
  of per-timestep losses.  The reference keeps the history on the host and
  syncs it with `dist.all_gather` (`resample.py:83-104`, dead code there);
  here the history is a device-side [T, K] ring buffer updated inside the
  jitted train step — with a sharded batch the scatter-add is already
  globally consistent, no explicit collective needed.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

HISTORY_PER_TERM = 10
UNIFORM_PROB = 0.001


class SamplerState(NamedTuple):
    """Ring buffer of recent losses per timestep (loss-aware sampler only)."""
    history: jax.Array       # [T, HISTORY_PER_TERM] float32
    counts: jax.Array        # [T] int32


def init_sampler_state(num_timesteps: int) -> SamplerState:
    return SamplerState(
        history=jnp.zeros((num_timesteps, HISTORY_PER_TERM), jnp.float32),
        counts=jnp.zeros((num_timesteps,), jnp.int32))


def sample_uniform(key: jax.Array, batch: int,
                   num_timesteps: int) -> Tuple[jax.Array, jax.Array]:
    """t ~ U{0..T-1}, weights = 1 (`resample.py:61-74`)."""
    t = jax.random.randint(key, (batch,), 0, num_timesteps)
    return t, jnp.ones((batch,), jnp.float32)


def _lsm_weights(state: SamplerState) -> jax.Array:
    """sqrt(E[loss^2]) per timestep, mixed with uniform
    (`resample.py:135-142`); uniform until the history is warm."""
    T = state.history.shape[0]
    warmed = jnp.all(state.counts == HISTORY_PER_TERM)
    w = jnp.sqrt(jnp.mean(state.history ** 2, axis=-1))
    w = w / jnp.maximum(jnp.sum(w), 1e-12)
    w = w * (1 - UNIFORM_PROB) + UNIFORM_PROB / T
    uniform = jnp.full((T,), 1.0 / T, jnp.float32)
    return jnp.where(warmed, w, uniform)


def sample_loss_aware(key: jax.Array, batch: int,
                      state: SamplerState) -> Tuple[jax.Array, jax.Array]:
    """Importance-sample t by the current weights; weights are 1/(T p)
    (`resample.py:42-58`)."""
    p = _lsm_weights(state)
    T = p.shape[0]
    t = jax.random.choice(key, T, (batch,), p=p)
    weights = 1.0 / (T * p[t])
    return t, weights


def update_sampler_state(state: SamplerState, t: jax.Array,
                         losses: jax.Array) -> SamplerState:
    """Push per-example losses into the ring buffer (`resample.py:106-123`).

    Vectorized scatter; if the same t appears multiple times in a batch the
    slot assignment is approximate (one survives), matching the spirit (not
    the host-loop order) of the reference.
    """
    slot = jnp.where(state.counts[t] == HISTORY_PER_TERM,
                     HISTORY_PER_TERM - 1, state.counts[t])
    # shift-left full rows to make room (only where full)
    full = (state.counts[t] == HISTORY_PER_TERM)

    def push_one(hist, counts, ti, li, fi):
        row = hist[ti]
        row = jnp.where(fi, jnp.roll(row, -1).at[-1].set(li),
                        row.at[counts[ti]].set(li))
        hist = hist.at[ti].set(row)
        counts = counts.at[ti].set(
            jnp.minimum(counts[ti] + 1, HISTORY_PER_TERM))
        return hist, counts

    def body(carry, x):
        hist, counts = carry
        ti, li, fi = x
        return push_one(hist, counts, ti, li, fi), None

    (hist, counts), _ = jax.lax.scan(
        body, (state.history, state.counts), (t, losses, full))
    return SamplerState(history=hist, counts=counts)
