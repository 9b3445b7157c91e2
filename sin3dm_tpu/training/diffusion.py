"""Diffusion training loop — TPU-native counterpart of the reference
`TrainLoop` (`/root/reference/src/diffusion/train_util.py:26-293`).

One fused, jitted train step does: timestep sampling, q_sample, UNet
forward, per-plane MSE, AdamW update, linear lr anneal and the EMA update —
all as device-side pytree ops (the reference splits these across host-side
helpers + `MixedPrecisionTrainer`).  bf16-on-TPU removes the fp16 loss-scale
machinery (`fp16_util.py:148-233`); a NaN/inf grad guard skips bad steps,
preserving the reference's overflow-skip behavior (`fp16_util.py:189-197`).

Data-parallel: pass a `Mesh` and the batch axis of the triplane batch (and
the per-step RNG) is sharded over `data`; XLA inserts the gradient psum.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core import checkpoint as ckpt
from ..core import logger
from ..core.triplane import Triplane
from ..diffusion import resample
from ..diffusion.gaussian import DiffusionConfig, training_losses
from ..parallel import mesh as meshlib


class TrainState(NamedTuple):
    params: Dict
    ema_params: Tuple[Dict, ...]
    opt_state: optax.OptState
    sampler_state: resample.SamplerState
    step: jax.Array


@dataclass
class DiffusionTrainerConfig:
    lr: float = 5e-4
    weight_decay: float = 0.0
    lr_anneal_steps: int = 25000
    ema_rates: Tuple[float, ...] = (0.9999,)
    batch_size: int = 32
    schedule_sampler: str = "uniform"   # uniform | loss-second-moment
    log_interval: int = 100
    save_interval: int = 25000
    # fuse K optimizer steps into one dispatch via lax.scan — amortizes
    # host->device launch latency (the single-shape batch is resident on
    # device, so there is no data-loading reason to return to the host)
    steps_per_call: int = 1


def make_optimizer(cfg: DiffusionTrainerConfig) -> optax.GradientTransformation:
    """AdamW with the reference's linear anneal to zero
    (`train_util.py:241-247`): lr(step) = lr * (1 - step/anneal_steps)."""
    if cfg.lr_anneal_steps:
        def sched(count):
            frac = jnp.minimum(count / cfg.lr_anneal_steps, 1.0)
            return cfg.lr * (1.0 - frac)
    else:
        sched = cfg.lr
    return optax.adamw(learning_rate=sched, b1=0.9, b2=0.999, eps=1e-8,
                       weight_decay=cfg.weight_decay)


def init_train_state(params: Dict, cfg: DiffusionTrainerConfig,
                     num_timesteps: int) -> TrainState:
    opt = make_optimizer(cfg)
    return TrainState(
        params=params,
        # deep-copy: EMA leaves must not alias the param buffers (the train
        # step donates the state, and aliased donation is invalid)
        ema_params=tuple(jax.tree_util.tree_map(jnp.copy, params)
                         for _ in cfg.ema_rates),
        opt_state=opt.init(params),
        sampler_state=resample.init_sampler_state(num_timesteps),
        step=jnp.zeros((), jnp.int32))


def make_train_step(model_apply, tables, dcfg: DiffusionConfig,
                    tcfg: DiffusionTrainerConfig,
                    mesh=None):
    """Build the jitted train step.

    model_apply: (params, x_t: Triplane, t) -> Triplane.
    Returns step_fn(state, batch: Triplane, key) -> (state, metrics).
    metrics carries per-example loss terms + t for quartile logging.
    """
    opt = make_optimizer(tcfg)
    T = int(tables["betas"].shape[0])
    use_loss_aware = tcfg.schedule_sampler == "loss-second-moment"

    def step_fn(state: TrainState, batch: Triplane, key: jax.Array):
        tkey, nkey = jax.random.split(key)
        B = batch.xy.shape[0]
        if use_loss_aware:
            t, weights = resample.sample_loss_aware(
                tkey, B, state.sampler_state)
        else:
            t, weights = resample.sample_uniform(tkey, B, T)

        def loss_fn(params):
            terms = training_losses(
                lambda x, tt: model_apply(params, x, tt),
                tables, dcfg, batch, t, nkey)
            return jnp.mean(terms["loss"] * weights), terms

        (loss, terms), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)

        # NaN guard: skip the update on non-finite grads (bf16-era analog of
        # the fp16 overflow skip, `fp16_util.py:189-197`).
        gnorm = optax.global_norm(grads)
        ok = jnp.isfinite(gnorm)
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(ok, g, jnp.zeros_like(g)), grads)

        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        params = jax.tree_util.tree_map(
            lambda new, old: jnp.where(ok, new, old), params, state.params)

        ema_params = tuple(
            jax.tree_util.tree_map(
                lambda e, p, r=rate: e * r + p * (1.0 - r),
                ema, params)
            for rate, ema in zip(tcfg.ema_rates, state.ema_params))

        sampler_state = state.sampler_state
        if use_loss_aware:
            sampler_state = resample.update_sampler_state(
                sampler_state, t, terms["loss"])

        metrics = {"grad_norm": gnorm, "skipped": ~ok, "t": t,
                   "loss_w": terms["loss"] * weights}
        metrics.update({k: v for k, v in terms.items()})
        new_state = TrainState(params=params, ema_params=ema_params,
                               opt_state=opt_state,
                               sampler_state=sampler_state,
                               step=state.step + 1)
        return new_state, metrics

    if tcfg.steps_per_call > 1:
        inner = step_fn

        def step_fn(state: TrainState, batch: Triplane, key: jax.Array):
            def body(st, i):
                return inner(st, batch, jax.random.fold_in(key, i))

            state, stacked = jax.lax.scan(
                body, state, jnp.arange(tcfg.steps_per_call))
            # expose the LAST step's scalars + all steps' per-example
            # losses/t (flattened) for quartile logging
            metrics = {}
            for k, v in stacked.items():
                if v.ndim >= 2:
                    metrics[k] = v.reshape(-1)
                else:
                    metrics[k] = v[-1]
            return state, metrics

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        rep = NamedSharding(mesh, P())
        bsh = NamedSharding(mesh, P("data"))
        tri_b = Triplane(bsh, bsh, bsh)
        # state replicated (None -> propagate from placement), batch sharded
        # on its leading axis, RNG key replicated; XLA inserts the grad psum.
        return jax.jit(step_fn,
                       in_shardings=(None, tri_b, rep),
                       donate_argnums=(0,))
    return jax.jit(step_fn, donate_argnums=(0,))


def quartile_log(metrics: Dict, num_timesteps: int) -> None:
    """Reference-style quartile loss keys (`train_util.py:283-293`)."""
    t = np.asarray(metrics["t"])
    for key in ("loss", "mse_xy", "mse_xz", "mse_yz", "vb"):
        if key not in metrics:
            continue
        vals = np.asarray(metrics[key])
        logger.logkv_mean(key, float(vals.mean()), count=len(vals))
        quartile = (4 * t // num_timesteps).astype(np.int32)
        for q in range(4):
            m = quartile == q
            if m.any():
                logger.logkv_mean(f"{key}_q{q}", float(vals[m].mean()),
                                  count=int(m.sum()))


def ema_checkpoint_name(rate: float, step: int) -> str:
    """`ema_{rate}_{step:06d}.pt` (`train_util.py:264-266`)."""
    return f"ema_{rate}_{step:06d}.pt"


def opt_checkpoint_name(step: int) -> str:
    return f"opt{step:06d}.pt"


def find_resume_step(log_dir: str, ema_rate: float) -> int:
    """Find the latest `ema_{rate}_{step:06d}.pt` in log_dir (a working
    version of the reference's disabled resume plumbing,
    `train_util.py:296-330`)."""
    import re
    best = 0
    if not os.path.isdir(log_dir):
        return 0
    pat = re.compile(rf"ema_{re.escape(str(ema_rate))}_(\d+)\.pt$")
    for name in os.listdir(log_dir):
        m = pat.match(name)
        if m:
            best = max(best, int(m.group(1)))
    return best


class DiffusionTrainLoop:
    """Host-side loop: KV + TensorBoard logging, checkpoints, periodic
    sample-viz hooks, resume.

    Honors the `DIFFUSION_TRAINING_TEST` env hook: exit after the first
    save (`train_util.py:155-157`) for integration tests.
    """

    def __init__(self, model_apply, params, tables, dcfg: DiffusionConfig,
                 tcfg: DiffusionTrainerConfig, log_dir: str,
                 batch: Triplane, mesh=None, sample_hook=None,
                 resume: bool = False):
        self.model_apply = model_apply
        self.tables = tables
        self.dcfg = dcfg
        self.tcfg = tcfg
        self.log_dir = log_dir
        self.batch = batch
        self.mesh = mesh
        self.sample_hook = sample_hook
        self.T = int(tables["betas"].shape[0])
        self.state = init_train_state(params, tcfg, self.T)
        self.resume_step = 0
        os.makedirs(log_dir, exist_ok=True)
        if resume:
            self._try_resume(params)
        self.step_fn = make_train_step(model_apply, tables, dcfg, tcfg,
                                       mesh=mesh)
        try:
            from tensorboardX import SummaryWriter
            self.tb = SummaryWriter(os.path.join(log_dir, "tblog"))
        except Exception:
            self.tb = None

    def _try_resume(self, params) -> None:
        """Load the latest EMA + opt checkpoint pair and fast-forward the
        step counter (resume functionality the reference left disabled)."""
        rate = self.tcfg.ema_rates[0]
        step = find_resume_step(self.log_dir, rate)
        if step <= 0:
            return
        logger.log(f"resuming from step {step}")
        ema_path = os.path.join(self.log_dir, ema_checkpoint_name(rate, step))
        ema, _ = ckpt.load_pytree(ema_path, params)
        loaded_params = ema
        opt_path = os.path.join(self.log_dir, opt_checkpoint_name(step))
        opt_state = self.state.opt_state
        if os.path.exists(opt_path):
            try:
                opt_state, _ = ckpt.load_pytree(opt_path, opt_state)
            except ValueError:
                logger.log("optimizer state incompatible; reinitialized")
        self.state = TrainState(
            params=loaded_params,
            ema_params=tuple(jax.tree_util.tree_map(jnp.copy, ema)
                             for _ in self.tcfg.ema_rates),
            opt_state=opt_state,
            sampler_state=self.state.sampler_state,
            step=jnp.asarray(step, jnp.int32))
        self.resume_step = step

    def run(self, key: jax.Array, n_steps: Optional[int] = None) -> None:
        n_steps = n_steps or self.tcfg.lr_anneal_steps
        batch = self.batch
        if self.mesh is not None:
            batch = meshlib.shard_batch(self.mesh, batch)
            self.state = meshlib.replicate(self.mesh, self.state)
        from ..core.profiling import step_annotation
        saved_at = -1
        K = max(self.tcfg.steps_per_call, 1)
        # metric materialization forces a host sync (expensive through a
        # high-RTT link); with fused steps, sample metrics at a coarser
        # cadence tied to log_interval instead of the reference's every-10
        metrics_every = max(10, K, self.tcfg.log_interval // 10)
        # host-constructed raw keys: jax.random.split is a device dispatch
        # per call, which dominates wall clock on high-latency links; any
        # distinct uint32 pair is a valid threefry key
        base = int(np.asarray(jax.random.key_data(key) if hasattr(
            jax.random, "key_data") else key).ravel()[-1])
        step = self.resume_step
        while step < n_steps:
            sk = jnp.asarray(
                np.array([base & 0xFFFFFFFF, step], np.uint32))
            with step_annotation("diffusion_train", step):
                self.state, metrics = self.step_fn(self.state, batch, sk)
            last = step + K - 1            # index of the last fused step
            if last % metrics_every < K:
                quartile_log(metrics, self.T)
                logger.logkv("step", last)
                logger.logkv("samples",
                             (last + 1) * self.tcfg.batch_size)
                if self.tb is not None:
                    self.tb.add_scalar(
                        "loss", float(np.asarray(metrics["loss"]).mean()),
                        global_step=last)
                    self.tb.add_scalar(
                        "grad_norm", float(metrics["grad_norm"]),
                        global_step=last)
            if last % self.tcfg.log_interval < K:
                logger.dumpkvs()
            if self.sample_hook and step % 5000 < K:
                self.sample_hook(self, step)
            step += K
            if step > 0 and step % self.tcfg.save_interval < K:
                self.save(step)
                saved_at = step
                if os.environ.get("DIFFUSION_TRAINING_TEST", ""):
                    return
        final = n_steps
        if saved_at != final:
            self.save(final)

    def save(self, step: int) -> None:
        for rate, ema in zip(self.tcfg.ema_rates, self.state.ema_params):
            path = os.path.join(self.log_dir,
                                ema_checkpoint_name(rate, step))
            ckpt.save_pytree(path, jax.device_get(ema))
            logger.log(f"saved {path}")
        opt_path = os.path.join(self.log_dir, opt_checkpoint_name(step))
        ckpt.save_pytree(opt_path, jax.device_get(self.state.opt_state))
