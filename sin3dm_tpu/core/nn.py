"""Core NN primitives: inits, convs (channels-last), norms, embeddings.

Numerical semantics deliberately match the reference's torch modules so the
two frameworks produce comparable statistics:

* default torch Conv/Linear init (kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in))
  for both weight and bias),
* `InstanceNorm2d` (no running stats) with the reference's eps choices
  (`src/encoding/networks.py:133` eps=1e-5 unaffine;
   `src/encoding/blocks.py:219-221` eps=1e-6 affine),
* `GroupNorm32` — GroupNorm(32, C) computed in float32 regardless of input
  dtype (`src/diffusion/nn.py:17-19, 93-100`),
* sinusoidal timestep embedding, cos-first (`src/diffusion/nn.py:103-121`).

All convs are channels-last (NHWC / NDHWC) — the layout XLA:TPU tiles onto
the MXU without transposes.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax


# ---------------------------------------------------------------------------
# Initializers (torch default parity)
# ---------------------------------------------------------------------------

def torch_conv_init(key, kshape: Sequence[int], with_bias: bool = True):
    """Default torch Conv init. kshape is HWIO (or DHWIO): spatial..., in, out.

    fan_in = in_channels * prod(kernel_spatial); weight, bias ~ U(+-1/sqrt(fan_in)).
    """
    *spatial, cin, cout = kshape
    fan_in = cin * int(math.prod(spatial)) if spatial else cin
    bound = 1.0 / math.sqrt(fan_in)
    wk, bk = jax.random.split(key)
    w = jax.random.uniform(wk, tuple(kshape), jnp.float32, -bound, bound)
    if not with_bias:
        return {"w": w}
    b = jax.random.uniform(bk, (cout,), jnp.float32, -bound, bound)
    return {"w": w, "b": b}


def torch_linear_init(key, cin: int, cout: int):
    """Default torch Linear init: U(+-1/sqrt(cin)) for weight and bias.

    Weight stored as [cin, cout] (input-major) for y = x @ w + b.
    """
    bound = 1.0 / math.sqrt(cin)
    wk, bk = jax.random.split(key)
    return {
        "w": jax.random.uniform(wk, (cin, cout), jnp.float32, -bound, bound),
        "b": jax.random.uniform(bk, (cout,), jnp.float32, -bound, bound),
    }


def zero_conv_init(kshape: Sequence[int]):
    """Zero-initialised conv (reference `zero_module`, `src/diffusion/nn.py:68`)."""
    *spatial, cin, cout = kshape
    return {"w": jnp.zeros(tuple(kshape), jnp.float32),
            "b": jnp.zeros((cout,), jnp.float32)}


# ---------------------------------------------------------------------------
# Ops
# ---------------------------------------------------------------------------

def linear(p, x):
    return x @ p["w"].astype(x.dtype) + p["b"].astype(x.dtype)


def silu(x):
    return x * jax.nn.sigmoid(x)


def conv2d(p, x, stride: int = 1, padding="SAME"):
    """NHWC conv. p['w'] is HWIO.

    1x1 stride-1 convs go through a plain dot: TPU XLA rewrites small-C
    convolutions via space-to-depth reshapes whose layouts mismatch the
    surrounding elementwise fusions, inserting a relayout copy per call
    (profiled at ~10 us/step each inside the sampling chain); a dot
    contraction over the channel axis needs none of that."""
    w = p["w"].astype(x.dtype)
    # the dot fast path is only shape-equivalent for string paddings
    # (1x1 SAME == VALID); explicit numeric padding must take the
    # general conv so the pads are actually applied
    if (w.shape[0] == 1 and w.shape[1] == 1 and stride == 1
            and isinstance(padding, str)):
        y = jnp.einsum("bhwc,co->bhwo", x, w[0, 0])
    else:
        y = lax.conv_general_dilated(
            x, w,
            window_strides=(stride, stride), padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def conv3d(p, x, stride: int = 2, padding=((1, 1), (1, 1), (1, 1))):
    """NDHWC conv. p['w'] is DHWIO. Default is the reference encoder's
    k4/s2/p1 configuration (`src/encoding/networks.py:129-131`)."""
    y = lax.conv_general_dilated(
        x, p["w"].astype(x.dtype),
        window_strides=(stride, stride, stride), padding=padding,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def instance_norm(x, eps: float = 1e-5, gamma=None, beta=None):
    """InstanceNorm over spatial dims of channels-last [..., H, W, C].

    Matches torch nn.InstanceNorm2d(track_running_stats=False): per-sample,
    per-channel normalization using biased variance.
    """
    mean = jnp.mean(x, axis=(-3, -2), keepdims=True)
    var = jnp.var(x, axis=(-3, -2), keepdims=True)
    y = (x - mean) * lax.rsqrt(var + eps)
    if gamma is not None:
        y = y * gamma.astype(y.dtype) + beta.astype(y.dtype)
    return y


def group_norm32(p, x, num_groups: int = 32, eps: float = 1e-5):
    """GroupNorm(32, C) with float32 compute (`src/diffusion/nn.py:17-19`).

    x: [..., H, W, C]; p has 'g' (gamma) and 'b' (beta) of shape [C].
    """
    dt = x.dtype
    x32 = x.astype(jnp.float32)
    *lead, H, W, C = x32.shape
    g = num_groups
    if C % g != 0:
        raise ValueError(
            f"GroupNorm32 needs channels divisible by {g}, got {C} "
            "(model_channels and channel multiples must be multiples of 32)")
    xg = x32.reshape(*lead, H, W, g, C // g)
    mean = jnp.mean(xg, axis=(-4, -3, -1), keepdims=True)
    var = jnp.var(xg, axis=(-4, -3, -1), keepdims=True)
    xg = (xg - mean) * lax.rsqrt(var + eps)
    y = xg.reshape(*lead, H, W, C)
    y = y * p["g"] + p["b"]
    return y.astype(dt)


def group_norm32_film_silu(p, x, film=None, num_groups: int = 32,
                           eps: float = 1e-5):
    """INFERENCE fast path: GroupNorm32 -> optional FiLM scale-shift ->
    SiLU, with the normalize/affine applied in x.dtype.

    Statistics are float32 (the load-bearing half of GroupNorm32's
    fp32-compute contract, `src/diffusion/nn.py:17-19`): the mean/var
    reduces convert inline (XLA fuses the convert into the reduce, so no
    materialized fp32 copy of the plane).  gamma/beta and the optional
    FiLM (1+scale, shift) fold into per-channel A, B in fp32; the
    elementwise `silu(x*A+B)` then runs in x.dtype and fuses into the
    consumer (the conv input pad).  vs the exact `group_norm32` + FiLM +
    `silu` chain this differs only by one bf16 rounding of the apply —
    profiled on the sampling chain, the exact path spends ~70 us/step in
    astype relayout copies + a separate fp32 normalize pass.

    x: [B, H, W, C]; film: optional (scale, shift) each [B, 1, 1, C].
    """
    dt = x.dtype
    *lead, H, W, C = x.shape
    g = num_groups
    if C % g != 0:
        raise ValueError(f"GroupNorm32 needs channels divisible by {g}, "
                         f"got {C}")
    xg = x.reshape(*lead, H, W, g, C // g).astype(jnp.float32)
    mean = jnp.mean(xg, axis=(-4, -3, -1))          # [..., g]
    var = jnp.var(xg, axis=(-4, -3, -1))            # [..., g]
    rstd = lax.rsqrt(var + eps)
    # per-channel fold: A = gamma*rstd, B = beta - mean*gamma*rstd
    mean_c = jnp.repeat(mean, C // g, axis=-1)      # [..., C]
    rstd_c = jnp.repeat(rstd, C // g, axis=-1)
    A = rstd_c * p["g"]
    B = p["b"] - mean_c * A
    A = A.reshape(*lead, 1, 1, C)
    B = B.reshape(*lead, 1, 1, C)
    if film is not None:
        scale, shift = film                          # [B,1,1,C] fp32/bf16
        one_p = 1.0 + scale.astype(jnp.float32)
        A = A * one_p
        B = B * one_p + shift.astype(jnp.float32)
    y = x * A.astype(dt) + B.astype(dt)
    return silu(y)


def group_norm32_film_coeffs(p, x, film=None, num_groups: int = 32,
                             eps: float = 1e-5):
    """Per-channel fold of GroupNorm32 [+ FiLM] into (A, B) each [B, C]
    fp32 such that `silu(x*A + B)` == `group_norm32_film_silu(p, x, film)`
    (the apply in x.dtype, statistics in fp32 — same contract).

    Used by the fused inference conv (`ops/fused_conv.py act=`): the
    coefficients ride into the Pallas kernel, which applies the
    activation on VMEM-resident data, so the full-size activated tensor
    never round-trips HBM.
    """
    *lead, H, W, C = x.shape
    g = num_groups
    if C % g != 0:
        raise ValueError(f"GroupNorm32 needs channels divisible by {g}, "
                         f"got {C}")
    xg = x.reshape(*lead, H, W, g, C // g).astype(jnp.float32)
    mean = jnp.mean(xg, axis=(-4, -3, -1))          # [..., g]
    var = jnp.var(xg, axis=(-4, -3, -1))
    rstd = lax.rsqrt(var + eps)
    mean_c = jnp.repeat(mean, C // g, axis=-1)      # [..., C]
    rstd_c = jnp.repeat(rstd, C // g, axis=-1)
    A = rstd_c * p["g"]
    B = p["b"] - mean_c * A
    if film is not None:
        scale, shift = film                          # [B,1,1,C]
        one_p = 1.0 + scale.astype(jnp.float32).reshape(*lead, C)
        A = A * one_p
        B = B * one_p + shift.astype(jnp.float32).reshape(*lead, C)
    return A, B


def group_norm32_coeffs_from_sums(p, stats, n_hw: int, film=None,
                                  num_groups: int = 32,
                                  eps: float = 1e-5):
    """`group_norm32_film_coeffs` computed from PRE-REDUCED per-channel
    (sum, sumsq) statistics instead of re-reading the activation.

    `stats`: [B, 2, C] fp32 — per-channel sum and sum-of-squares over the
    n_hw spatial positions, as emitted by the fused conv's stats epilogue
    (`ops/fused_conv.py emit_stats`).  Group statistics aggregate the
    per-channel sums, so mean/var match `group_norm32`'s fp32 reduces up
    to summation order.  Returns (A, B) each [B, C] for
    `silu(x*A + B)` / the fused conv's `act=`.
    """
    B_, two, C = stats.shape
    g = num_groups
    if C % g != 0:
        raise ValueError(f"GroupNorm32 needs channels divisible by {g}, "
                         f"got {C}")
    n = float(n_hw * (C // g))
    s1 = stats[:, 0].reshape(B_, g, C // g).sum(-1)   # [B, g]
    s2 = stats[:, 1].reshape(B_, g, C // g).sum(-1)
    mean = s1 / n
    var = s2 / n - mean * mean
    rstd = lax.rsqrt(jnp.maximum(var, 0.0) + eps)
    mean_c = jnp.repeat(mean, C // g, axis=-1)        # [B, C]
    rstd_c = jnp.repeat(rstd, C // g, axis=-1)
    A = rstd_c * p["g"]
    B = p["b"] - mean_c * A
    if film is not None:
        scale, shift = film                            # [B,1,1,C]
        one_p = 1.0 + scale.astype(jnp.float32).reshape(B_, C)
        A = A * one_p
        B = B * one_p + shift.astype(jnp.float32).reshape(B_, C)
    return A, B


def apply_film_coeffs(x, A, B):
    """`silu(x*A + B)` with the apply in x.dtype — the reference
    elementwise form of `group_norm32_film_coeffs` (used by the XLA
    fallback and as the golden in tests)."""
    dt = x.dtype
    lead = x.shape[:-3]
    C = x.shape[-1]
    Ax = A.reshape(*lead, 1, 1, C).astype(dt)
    Bx = B.reshape(*lead, 1, 1, C).astype(dt)
    return silu(x * Ax + Bx)


def group_norm_init(channels: int):
    return {"g": jnp.ones((channels,), jnp.float32),
            "b": jnp.zeros((channels,), jnp.float32)}


def avg_pool2x(x):
    """2x average pool, NHWC (`unet_triplane.py:137-139`)."""
    return lax.reduce_window(
        x, 0.0, lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") * 0.25


def upsample2x_bilinear(x):
    """2x bilinear upsample, align_corners=False (`unet_triplane.py:116-118`)."""
    *lead, H, W, C = x.shape
    return resize_bilinear(x, (H * 2, W * 2))


def resize_bilinear(x, out_hw: Tuple[int, int]):
    """Bilinear resize on [..., H, W, C] matching torch F.interpolate
    (mode='bilinear', align_corners=False): jax.image 'linear' resize uses
    the same half-pixel convention."""
    *lead, H, W, C = x.shape
    out_shape = (*lead, out_hw[0], out_hw[1], C)
    # antialias=False: torch F.interpolate never antialiases by default,
    # and the fix-up path can downscale (`unet_triplane.py:494-499`).
    return jax.image.resize(x, out_shape, method="linear", antialias=False)


def resize_trilinear(x, out_dhw: Tuple[int, int, int]):
    """Trilinear resize on [..., D, H, W, C] (torch F.interpolate
    mode='trilinear', align_corners=False parity)."""
    *lead, D, H, W, C = x.shape
    out_shape = (*lead, out_dhw[0], out_dhw[1], out_dhw[2], C)
    return jax.image.resize(x, out_shape, method="linear", antialias=False)


def timestep_embedding(timesteps, dim: int, max_period: float = 10000.0):
    """Sinusoidal embeddings, cos-first (`src/diffusion/nn.py:103-121`).

    timesteps: [N] (possibly fractional). Returns [N, dim] float32.
    """
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def mean_flat(x):
    """Mean over all non-batch dims (`src/diffusion/nn.py:86`)."""
    return jnp.mean(x, axis=tuple(range(1, x.ndim)))
