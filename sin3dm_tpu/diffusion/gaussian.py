"""Functional DDPM/DDIM math over Triplane pytrees.

TPU-native re-design of the reference `GaussianDiffusion`
(`/root/reference/src/diffusion/gaussian_diffusion.py:102-947`):

* stateless functions over a dict of device coefficient tables — everything
  jits, and sampling loops become `lax.scan` (see sampling.py),
* the diffusion state is the Triplane pytree itself, not the composed 2D
  map.  The reference noises the composed map but its D x D zero block never
  reaches the model (decompose drops it, `unet_triplane.py:480`) nor the
  loss (per-plane MSE, `gaussian_diffusion.py:838-851`), so per-plane
  noising is mathematically identical and saves the dead block's HBM
  traffic,
* timestep respacing is folded in: `tables['timestep_map']` remaps the
  sampler's index to the original-process index fed to the model
  (`respace.py:116-128`).
"""

from __future__ import annotations

import enum
from typing import Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.triplane import Triplane, randn_like


class MeanType(enum.Enum):
    PREVIOUS_X = "previous_x"
    START_X = "start_x"
    EPSILON = "epsilon"


class VarType(enum.Enum):
    LEARNED = "learned"
    FIXED_SMALL = "fixed_small"
    FIXED_LARGE = "fixed_large"
    LEARNED_RANGE = "learned_range"


class LossKind(enum.Enum):
    MSE = "mse"
    RESCALED_MSE = "rescaled_mse"
    KL = "kl"
    RESCALED_KL = "rescaled_kl"


class DiffusionConfig(NamedTuple):
    mean_type: MeanType = MeanType.START_X        # predict_xstart=True default
    var_type: VarType = VarType.FIXED_LARGE
    loss_kind: LossKind = LossKind.MSE
    rescale_timesteps: bool = False
    original_num_steps: int = 1000


# ModelFn: (x_t: Triplane, t_model: [B] int/float array) -> Triplane
ModelFn = Callable[[Triplane, jax.Array], Triplane]


def _bcast(coef: jax.Array, plane: jax.Array) -> jax.Array:
    """Broadcast a [B] coefficient over a [B, H, W, C] plane."""
    return coef.reshape((-1,) + (1,) * (plane.ndim - 1)).astype(plane.dtype)


def extract(tables: Dict[str, jax.Array], name: str, t: jax.Array,
            like: Triplane) -> Triplane:
    """Gather a per-step coefficient and broadcast it per plane
    (TPU-native `_extract_into_tensor`, `gaussian_diffusion.py:934-947`)."""
    coef = tables[name][t]
    return Triplane(_bcast(coef, like.xy), _bcast(coef, like.xz),
                    _bcast(coef, like.yz))


def model_timesteps(tables, cfg: DiffusionConfig, t: jax.Array) -> jax.Array:
    """Respacing remap + optional 0..1000 rescale (`respace.py:123-128`)."""
    new_t = tables["timestep_map"][t]
    if cfg.rescale_timesteps:
        return new_t.astype(jnp.float32) * (1000.0 / cfg.original_num_steps)
    return new_t


def q_sample(tables, x_start: Triplane, t: jax.Array,
             noise: Triplane) -> Triplane:
    """Sample q(x_t | x_0) (`gaussian_diffusion.py:189-207`)."""
    a = extract(tables, "sqrt_alphas_cumprod", t, x_start)
    b = extract(tables, "sqrt_one_minus_alphas_cumprod", t, x_start)
    return a * x_start + b * noise


def q_mean_variance(tables, x_start: Triplane,
                    t: jax.Array) -> Tuple[Triplane, Triplane, Triplane]:
    """Mean, variance, log-variance of q(x_t | x_0)
    (`gaussian_diffusion.py:172-187`)."""
    mean = extract(tables, "sqrt_alphas_cumprod", t, x_start) * x_start
    var = extract(tables, "one_minus_alphas_cumprod", t, x_start)
    log_var = extract(tables, "log_one_minus_alphas_cumprod", t, x_start)
    return mean, var, log_var


def q_posterior_mean(tables, x_start: Triplane, x_t: Triplane,
                     t: jax.Array) -> Triplane:
    """Mean of q(x_{t-1} | x_t, x_0) (`gaussian_diffusion.py:209-231`)."""
    c1 = extract(tables, "posterior_mean_coef1", t, x_t)
    c2 = extract(tables, "posterior_mean_coef2", t, x_t)
    return c1 * x_start + c2 * x_t


def predict_xstart_from_eps(tables, x_t: Triplane, t, eps: Triplane) -> Triplane:
    a = extract(tables, "sqrt_recip_alphas_cumprod", t, x_t)
    b = extract(tables, "sqrt_recipm1_alphas_cumprod", t, x_t)
    return a * x_t - b * eps


def predict_eps_from_xstart(tables, x_t: Triplane, t,
                            xstart: Triplane) -> Triplane:
    a = extract(tables, "sqrt_recip_alphas_cumprod", t, x_t)
    binv = extract(tables, "sqrt_recipm1_alphas_cumprod", t, x_t)
    num = a * x_t - xstart
    return Triplane(num.xy / binv.xy, num.xz / binv.xz, num.yz / binv.yz)


def predict_xstart_from_xprev(tables, x_t: Triplane, t,
                              xprev: Triplane) -> Triplane:
    c1 = extract(tables, "posterior_mean_coef1", t, x_t)
    c2 = extract(tables, "posterior_mean_coef2", t, x_t)
    inv1 = Triplane(1.0 / c1.xy, 1.0 / c1.xz, 1.0 / c1.yz)
    ratio = Triplane(c2.xy / c1.xy, c2.xz / c1.xz, c2.yz / c1.yz)
    return inv1 * xprev - ratio * x_t


class PMeanVar(NamedTuple):
    mean: Triplane
    log_variance: Triplane
    pred_xstart: Triplane


def p_mean_variance(model: ModelFn, tables, cfg: DiffusionConfig,
                    x: Triplane, t: jax.Array,
                    clip_denoised: bool = True,
                    model_output: Optional[Triplane] = None,
                    learned_var: Optional[Triplane] = None) -> PMeanVar:
    """Model posterior p(x_{t-1} | x_t) (`gaussian_diffusion.py:233-327`).

    `model_output`/`learned_var` may be passed to reuse a forward pass
    (training loss path); otherwise the model is invoked here.
    """
    if model_output is None:
        out = model(x, model_timesteps(tables, cfg, t))
        if cfg.var_type in (VarType.LEARNED, VarType.LEARNED_RANGE):
            C = x.channels
            model_output = out.map(lambda p: p[..., :C])
            learned_var = out.map(lambda p: p[..., C:])
        else:
            model_output = out

    if cfg.var_type == VarType.LEARNED:
        log_var = learned_var
    elif cfg.var_type == VarType.LEARNED_RANGE:
        min_log = extract(tables, "posterior_log_variance_clipped", t, x)
        max_log = extract(tables, "log_betas", t, x)

        def mix(v, lo, hi):
            frac = (v + 1.0) * 0.5
            return frac * hi + (1.0 - frac) * lo
        log_var = Triplane(mix(learned_var.xy, min_log.xy, max_log.xy),
                           mix(learned_var.xz, min_log.xz, max_log.xz),
                           mix(learned_var.yz, min_log.yz, max_log.yz))
    elif cfg.var_type == VarType.FIXED_LARGE:
        log_var = extract(tables, "fixed_large_log_variance", t, x)
    else:  # FIXED_SMALL
        log_var = extract(tables, "posterior_log_variance_clipped", t, x)

    def process(xs: Triplane) -> Triplane:
        if clip_denoised:
            return xs.map(lambda p: jnp.clip(p, -1.0, 1.0))
        return xs

    if cfg.mean_type == MeanType.PREVIOUS_X:
        pred_xstart = process(
            predict_xstart_from_xprev(tables, x, t, model_output))
        mean = model_output
    else:
        if cfg.mean_type == MeanType.START_X:
            pred_xstart = process(model_output)
        else:  # EPSILON
            pred_xstart = process(
                predict_xstart_from_eps(tables, x, t, model_output))
        mean = q_posterior_mean(tables, pred_xstart, x, t)

    return PMeanVar(mean=mean, log_variance=log_var, pred_xstart=pred_xstart)


def condition_mean(cond_fn, tables, cfg: DiffusionConfig, out: PMeanVar,
                   x: Triplane, t: jax.Array) -> Triplane:
    """Shift the posterior mean by variance * grad log p(y|x)
    (Sohl-Dickstein conditioning, `gaussian_diffusion.py:357-370`).
    cond_fn: (x, t_model) -> Triplane gradient."""
    grad = cond_fn(x, model_timesteps(tables, cfg, t))
    var = out.log_variance.map(jnp.exp)
    return out.mean + var * grad


def condition_score(cond_fn, tables, cfg: DiffusionConfig, out: PMeanVar,
                    x: Triplane, t: jax.Array) -> PMeanVar:
    """Score-based conditioning (Song et al.,
    `gaussian_diffusion.py:372-394`): shift eps by -sqrt(1-a_bar) * grad,
    recompute pred_xstart and the posterior mean."""
    alpha_bar = extract(tables, "alphas_cumprod", t, x)
    eps = predict_eps_from_xstart(tables, x, t, out.pred_xstart)
    grad = cond_fn(x, model_timesteps(tables, cfg, t))
    shift = alpha_bar.map(lambda a: jnp.sqrt(1 - a)) * grad
    eps = eps - shift
    pred_xstart = predict_xstart_from_eps(tables, x, t, eps)
    mean = q_posterior_mean(tables, pred_xstart, x, t)
    return PMeanVar(mean=mean, log_variance=out.log_variance,
                    pred_xstart=pred_xstart)


def p_sample_step(model: ModelFn, tables, cfg: DiffusionConfig,
                  x: Triplane, t: jax.Array, key: Optional[jax.Array],
                  clip_denoised: bool = True,
                  cond_fn=None, noise: Optional[Triplane] = None) -> Triplane:
    """One ancestral sampling step (`gaussian_diffusion.py:396-440`).
    Pass either `key` (noise drawn here) or pre-drawn `noise`."""
    out = p_mean_variance(model, tables, cfg, x, t, clip_denoised)
    if noise is None:
        noise = randn_like(key, x)
    nz = (t != 0).astype(x.dtype)
    nzt = Triplane(_bcast(nz, x.xy), _bcast(nz, x.xz), _bcast(nz, x.yz))
    mean = out.mean
    if cond_fn is not None:
        mean = condition_mean(cond_fn, tables, cfg, out, x, t)
    sigma = out.log_variance.map(lambda lv: jnp.exp(0.5 * lv))
    return mean + nzt * sigma * noise


def ddim_sample_step(model: ModelFn, tables, cfg: DiffusionConfig,
                     x: Triplane, t: jax.Array, key: Optional[jax.Array],
                     eta: float = 0.0, clip_denoised: bool = True,
                     y0: Optional[Triplane] = None,
                     mask: Optional[Triplane] = None,
                     is_mask_t0: bool = False,
                     cond_fn=None, noise: Optional[Triplane] = None
                     ) -> Triplane:
    """One DDIM step, with optional mask-conditioned generation
    (`gaussian_diffusion.py:538-600`) and optional score conditioning.
    Pass either `key` (noise drawn here) or pre-drawn `noise`."""
    out = p_mean_variance(model, tables, cfg, x, t, clip_denoised)
    if cond_fn is not None:
        out = condition_score(cond_fn, tables, cfg, out, x, t)
    pred_xstart = out.pred_xstart

    nz = (t != 0).astype(x.dtype)
    nzt = Triplane(_bcast(nz, x.xy), _bcast(nz, x.xz), _bcast(nz, x.yz))

    if y0 is not None and mask is not None:
        blended = mask * y0 + (mask.map(lambda m: 1.0 - m)) * pred_xstart
        if is_mask_t0:
            pred_xstart = blended
        else:
            one_minus = nzt.map(lambda m: 1.0 - m)
            pred_xstart = blended * nzt + pred_xstart * one_minus

    eps = predict_eps_from_xstart(tables, x, t, pred_xstart)
    ab = extract(tables, "alphas_cumprod", t, x)
    ab_prev = extract(tables, "alphas_cumprod_prev", t, x)

    def per_plane(xs, ep, a, ap):
        sigma = (eta * jnp.sqrt((1 - ap) / (1 - a))
                 * jnp.sqrt(1 - a / ap))
        mean_pred = xs * jnp.sqrt(ap) + jnp.sqrt(1 - ap - sigma ** 2) * ep
        return mean_pred, sigma

    if noise is None:
        noise = randn_like(key, x)
    m_xy, s_xy = per_plane(pred_xstart.xy, eps.xy, ab.xy, ab_prev.xy)
    m_xz, s_xz = per_plane(pred_xstart.xz, eps.xz, ab.xz, ab_prev.xz)
    m_yz, s_yz = per_plane(pred_xstart.yz, eps.yz, ab.yz, ab_prev.yz)
    mean_pred = Triplane(m_xy, m_xz, m_yz)
    sigma = Triplane(s_xy, s_xz, s_yz)
    return mean_pred + nzt * sigma * noise


def ddim_reverse_step(model: ModelFn, tables, cfg: DiffusionConfig,
                      x: Triplane, t: jax.Array,
                      clip_denoised: bool = True) -> Triplane:
    """Deterministic DDIM reverse-ODE step x_t -> x_{t+1}
    (`gaussian_diffusion.py:602-638`)."""
    out = p_mean_variance(model, tables, cfg, x, t, clip_denoised)
    eps = predict_eps_from_xstart(tables, x, t, out.pred_xstart)
    ab_next = extract(tables, "alphas_cumprod_next", t, x)

    def per_plane(xs, ep, an):
        return xs * jnp.sqrt(an) + jnp.sqrt(1 - an) * ep

    return Triplane(per_plane(out.pred_xstart.xy, eps.xy, ab_next.xy),
                    per_plane(out.pred_xstart.xz, eps.xz, ab_next.xz),
                    per_plane(out.pred_xstart.yz, eps.yz, ab_next.yz))


def training_losses(model: ModelFn, tables, cfg: DiffusionConfig,
                    x_start: Triplane, t: jax.Array,
                    key: jax.Array) -> Dict[str, jax.Array]:
    """Per-plane MSE training loss (`gaussian_diffusion.py:771-856`).

    With a learned variance (``learn_sigma``: var_type LEARNED /
    LEARNED_RANGE) the model emits 2C channels; the variance half is
    trained through a variational-bound term with the mean FROZEN
    (stop_gradient), exactly the reference's frozen-mean vb term
    (`gaussian_diffusion.py:806-828`), scaled by T/1000 under
    RESCALED_MSE.  KL/RESCALED_KL is dead code in the reference
    (`gaussian_diffusion.py:792-803` raises) and rejected at config time.

    Returns dict with per-example [B] losses: mse_xy, mse_xz, mse_yz,
    loss (and vb when learn_sigma).
    """
    if cfg.loss_kind in (LossKind.KL, LossKind.RESCALED_KL):
        raise NotImplementedError(
            "KL training is dead code in the reference "
            "(gaussian_diffusion.py:792-803); use MSE/RESCALED_MSE")
    noise = randn_like(key, x_start)
    x_t = q_sample(tables, x_start, t, noise)
    out = model(x_t, model_timesteps(tables, cfg, t))

    terms: Dict[str, jax.Array] = {}
    learned = cfg.var_type in (VarType.LEARNED, VarType.LEARNED_RANGE)
    if learned:
        C = x_start.channels
        model_output = out.map(lambda p: p[..., :C])
        learned_var = out.map(lambda p: p[..., C:])
        # vb learns the variance only: mean half is stop-gradient'ed
        frozen_mean = model_output.map(jax.lax.stop_gradient)
        vb = vb_terms_bpd(model, tables, cfg, x_start, x_t, t,
                          clip_denoised=False,
                          model_output=frozen_mean,
                          learned_var=learned_var)["output"]
        if cfg.loss_kind == LossKind.RESCALED_MSE:
            # keep the vb term's magnitude independent of the step count
            vb = vb * (tables["betas"].shape[0] / 1000.0)
        terms["vb"] = vb
    else:
        model_output = out

    if cfg.mean_type == MeanType.PREVIOUS_X:
        target = q_posterior_mean(tables, x_start, x_t, t)
    elif cfg.mean_type == MeanType.START_X:
        target = x_start
    else:
        target = noise

    def mf(a):
        return jnp.mean(a, axis=tuple(range(1, a.ndim)))

    terms["mse_xy"] = mf((target.xy - model_output.xy) ** 2)
    terms["mse_xz"] = mf((target.xz - model_output.xz) ** 2)
    terms["mse_yz"] = mf((target.yz - model_output.yz) ** 2)
    terms["loss"] = terms["mse_xy"] + terms["mse_xz"] + terms["mse_yz"]
    if learned:
        terms["loss"] = terms["loss"] + terms["vb"]
    return terms


def _tri_mean_flat(t: Triplane) -> jax.Array:
    """Per-example mean over all three planes' non-batch dims (the
    triplane analog of mean_flat over the composed map, excluding the dead
    zero block).

    DELIBERATE deviation from the reference's weighting
    (`gaussian_diffusion.py` mean_flat): the reference averages over the
    composed 2D map INCLUDING its dead DxD zero block, so for non-cubic
    shapes its per-element losses are scaled by triplane_size /
    composed_size (~0.8 for towerruins) relative to ours — i.e. our
    mse/vb terms run ~20-25% larger on such shapes, a pure constant
    rescaling of the loss (absorbed by Adam's per-parameter
    normalization for mse; a mild reweighting of vb vs mse under
    LEARNED_RANGE).  Normalizing by real elements is the principled
    choice; the committed checkpoints were trained with it."""
    def mf_sum(a):
        return jnp.sum(a, axis=tuple(range(1, a.ndim)))
    total = mf_sum(t.xy) + mf_sum(t.xz) + mf_sum(t.yz)
    count = t.xy[0].size + t.xz[0].size + t.yz[0].size
    return total / count


def vb_terms_bpd(model: ModelFn, tables, cfg: DiffusionConfig,
                 x_start: Triplane, x_t: Triplane, t: jax.Array,
                 clip_denoised: bool = True,
                 model_output: Optional[Triplane] = None,
                 learned_var: Optional[Triplane] = None) -> Dict[str, object]:
    """One variational-bound term in bits (`gaussian_diffusion.py:736-769`):
    KL(q(x_{t-1}|x_t,x_0) || p(x_{t-1}|x_t)), or the decoder NLL at t=0.

    `model_output`/`learned_var` reuse a forward pass already computed by
    the caller (the frozen-mean training path) instead of re-invoking the
    model."""
    true_mean = q_posterior_mean(tables, x_start, x_t, t)
    true_logvar = extract(tables, "posterior_log_variance_clipped", t, x_t)
    out = p_mean_variance(model, tables, cfg, x_t, t, clip_denoised,
                          model_output=model_output,
                          learned_var=learned_var)

    kl = Triplane(*[normal_kl(tm, tl, m, lv) for tm, tl, m, lv in
                    zip(true_mean, true_logvar, out.mean,
                        out.log_variance)])
    kl_flat = _tri_mean_flat(kl) / jnp.log(2.0)

    nll = Triplane(*[
        -discretized_gaussian_log_likelihood(xs, means=m,
                                             log_scales=0.5 * lv)
        for xs, m, lv in zip(x_start, out.mean, out.log_variance)])
    nll_flat = _tri_mean_flat(nll) / jnp.log(2.0)

    output = jnp.where(t == 0, nll_flat, kl_flat)
    return {"output": output, "pred_xstart": out.pred_xstart}


def prior_bpd(tables, x_start: Triplane) -> jax.Array:
    """Prior KL term in bits-per-dim (`gaussian_diffusion.py:858-874`)."""
    B = x_start.xy.shape[0]
    T = tables["betas"].shape[0]
    t = jnp.full((B,), T - 1, jnp.int32)
    mean, _, logvar = q_mean_variance(tables, x_start, t)
    kl = Triplane(*[normal_kl(m, lv, 0.0, 0.0)
                    for m, lv in zip(mean, logvar)])
    return _tri_mean_flat(kl) / jnp.log(2.0)


def calc_bpd_loop(model: ModelFn, tables, cfg: DiffusionConfig,
                  x_start: Triplane, key: jax.Array,
                  clip_denoised: bool = True) -> Dict[str, jax.Array]:
    """Full variational lower bound in bits-per-dim, scanned over all
    timesteps (`gaussian_diffusion.py:876-931`).  Returns total_bpd,
    prior_bpd, vb [B,T], xstart_mse [B,T], mse [B,T]."""
    T = tables["betas"].shape[0]
    B = x_start.xy.shape[0]

    def body(carry, t_scalar):
        k = jax.random.fold_in(key, t_scalar)
        t = jnp.full((B,), t_scalar, jnp.int32)
        noise = randn_like(k, x_start)
        x_t = q_sample(tables, x_start, t, noise)
        out = vb_terms_bpd(model, tables, cfg, x_start, x_t, t,
                           clip_denoised)
        xs_mse = _tri_mean_flat(
            (out["pred_xstart"] - x_start).map(lambda p: p ** 2))
        eps = predict_eps_from_xstart(tables, x_t, t, out["pred_xstart"])
        eps_mse = _tri_mean_flat((eps - noise).map(lambda p: p ** 2))
        return carry, (out["output"], xs_mse, eps_mse)

    ts = jnp.arange(T - 1, -1, -1, dtype=jnp.int32)
    _, (vb, xstart_mse, mse) = jax.lax.scan(body, None, ts)
    vb = vb.T            # [B, T]
    xstart_mse = xstart_mse.T
    mse = mse.T
    pb = prior_bpd(tables, x_start)
    return {"total_bpd": vb.sum(axis=1) + pb, "prior_bpd": pb,
            "vb": vb, "xstart_mse": xstart_mse, "mse": mse}


# ---------------------------------------------------------------------------
# VLB utilities (`src/diffusion/losses.py`) — used by the bpd evaluation path.
# ---------------------------------------------------------------------------

def normal_kl(mean1, logvar1, mean2, logvar2):
    """KL(N(mean1, var1) || N(mean2, var2)) in nats (`losses.py:12-39`)."""
    return 0.5 * (-1.0 + logvar2 - logvar1 + jnp.exp(logvar1 - logvar2)
                  + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2))


def approx_standard_normal_cdf(x):
    return 0.5 * (1.0 + jnp.tanh(jnp.sqrt(2.0 / jnp.pi)
                                 * (x + 0.044715 * x ** 3)))


def discretized_gaussian_log_likelihood(x, *, means, log_scales):
    """Log-likelihood of a Gaussian discretized to [-1,1] in 1/127.5 bins
    (`losses.py:50-77`)."""
    centered = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered + 1.0 / 255.0)
    cdf_plus = approx_standard_normal_cdf(plus_in)
    min_in = inv_stdv * (centered - 1.0 / 255.0)
    cdf_min = approx_standard_normal_cdf(min_in)
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, min=1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, min=1e-12))
    cdf_delta = cdf_plus - cdf_min
    return jnp.where(
        x < -0.999, log_cdf_plus,
        jnp.where(x > 0.999, log_one_minus_cdf_min,
                  jnp.log(jnp.clip(cdf_delta, min=1e-12))))
