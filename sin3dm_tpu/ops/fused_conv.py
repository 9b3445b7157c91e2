"""Pallas fused 3x3 rollout conv — the sampling chain's hot op.

Replaces the XLA lowering of `models/unet.py:_tconv_apply_rollout_fast`'s
dense conv + rollout-contribution epilogue for INFERENCE (no VJP — the
training step keeps the XLA path).

Why: profiled on the tunneled v5e, the DDPM chain spends ~38% of device
time in pure layout copies ("data formatting") that XLA inserts around
`conv_general_dilated` for batch-1 NHWC activations with C=64 — the
space-to-depth conv rewrite picks tilings that mismatch every
neighbouring elementwise fusion.  This kernel does the whole thing
VMEM-resident: im2col into a [TH*W, 9C] scratch, ONE MXU dot per row
tile ([TH*W, 9C] @ [9C, Co]), bias + rollout border-select epilogue in
registers, bf16 out.  HBM traffic = read x once + write y once.

Semantics match `_tconv_apply_rollout_fast`'s `one()` exactly (same
contribution math; golden-tested in tests/test_fused_conv.py).
Reference conv semantics: `unet_triplane.py:21-60` (three per-plane 2D
convs; rollout = concat with broadcast axis-means, here factorized).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(TH: int, W: int, H: int, C: int, Co: int, has_rollout: bool,
            out_dtype, x_ref, w_ref, b_ref, *refs):
    if has_rollout:  # kernel args: ins..., outs..., scratch...
        (st_ref, sf_ref, sb_ref, rl_ref, rf_ref, rr_ref,
         out_ref, im_ref) = refs
    else:
        out_ref, im_ref = refs
    i = pl.program_id(1)
    WP = im_ref.shape[0] // TH

    # im2col: 9 shifted [TH, WP, C] windows -> [TH*WP, 9C]
    for dh in range(3):
        for dw in range(3):
            win = x_ref[0, pl.ds(i * TH + dh, TH), dw:dw + WP, :]
            k = dh * 3 + dw
            im_ref[:, k * C:(k + 1) * C] = win.reshape(TH * WP, C)

    y = jnp.dot(im_ref[:], w_ref[:],
                preferred_element_type=jnp.float32)       # [TH*WP, Co]
    y = y.reshape(TH, WP, Co) + b_ref[:].astype(jnp.float32)

    if has_rollout:
        # col-varying contribution: s_top on global row 0, s_bot on row
        # H-1, s_full elsewhere (zero-pad partial-kernel fixups — see
        # unet._colvar_contrib)
        g = i * TH + jax.lax.broadcasted_iota(jnp.int32, (TH, 1, 1), 0)
        s_top = st_ref[0].astype(jnp.float32)
        s_full = sf_ref[0].astype(jnp.float32)
        s_bot = sb_ref[0].astype(jnp.float32)
        y = y + jnp.where(g == 0, s_top[None],
                          jnp.where(g == H - 1, s_bot[None], s_full[None]))
        # row-varying contribution: r_left in col 0, r_right in col W-1
        c = jax.lax.broadcasted_iota(jnp.int32, (1, WP, 1), 1)
        r_left = rl_ref[0, pl.ds(i * TH, TH), :].astype(jnp.float32)
        r_full = rf_ref[0, pl.ds(i * TH, TH), :].astype(jnp.float32)
        r_right = rr_ref[0, pl.ds(i * TH, TH), :].astype(jnp.float32)
        y = y + jnp.where(c == 0, r_left[:, None],
                          jnp.where(c == W - 1, r_right[:, None],
                                    r_full[:, None]))

    out_ref[0] = y.astype(out_dtype)


def _on_cpu() -> bool:
    return jax.default_backend() == "cpu"


def conv3x3_rollout_fused(
        x: jax.Array, w: jax.Array, b: Optional[jax.Array],
        col3: Optional[Tuple[jax.Array, jax.Array, jax.Array]] = None,
        row3: Optional[Tuple[jax.Array, jax.Array, jax.Array]] = None,
        tile_h: Optional[int] = None, interpret: Optional[bool] = None,
        mxu_dtype=jnp.bfloat16) -> jax.Array:
    """y = conv3x3_SAME(x) + b + colvar + rowvar, one pallas program.

    x: [B, H, W, C]; w: [3, 3, C, Co]; b: [Co] or None.
    col3: (s_top, s_full, s_bot) each [B, W, Co] — the rollout
      contribution of the column-varying broadcast plane (row-class
      select).  row3: (r_left, r_full, r_right) each [B, H, Co].
    Returns [B, H, W, Co] in x.dtype.  interpret defaults to True on the
    CPU backend (tests).
    """
    if interpret is None:
        interpret = _on_cpu()
    B, H, W, C = x.shape
    Co = w.shape[-1]
    has_rollout = col3 is not None

    # Wide inputs (the up-path skip-concat conv, C=192) would blow the
    # 16MB VMEM scoped limit (the im2col scratch is 9C wide).  By conv
    # linearity, split the input channels: the first chunk carries bias
    # + rollout contributions, the rest are plain partial convs summed
    # on top (the channel slices fuse into each kernel's input pad).
    # The budget scales with element size: fp32 (a non-use_fp16 sampler)
    # gets half the channel chunk and half the default row tile — an
    # unsplit fp32 conv at 128x96-scale planes overflows scoped VMEM.
    elem = jnp.dtype(mxu_dtype).itemsize
    c_max = 128 if elem <= 2 else 64
    if C > c_max:
        y = conv3x3_rollout_fused(
            x[..., :c_max], w[:, :, :c_max], b, col3, row3,
            tile_h=tile_h, interpret=interpret, mxu_dtype=mxu_dtype)
        for lo in range(c_max, C, c_max):
            hi = min(lo + c_max, C)
            y = y + conv3x3_rollout_fused(
                x[..., lo:hi], w[:, :, lo:hi], None,
                tile_h=tile_h, interpret=interpret, mxu_dtype=mxu_dtype)
        return y

    if tile_h is None:
        import os
        tile_h = int(os.environ.get("SIN3DM_FUSED_TILE",
                                    "16" if elem <= 2 else "8"))
    TH = tile_h
    HP = _round_up(H, TH)
    WP = _round_up(W, 16)
    n_tiles = HP // TH

    xd = x.astype(mxu_dtype)
    # zero 'SAME' halo + tile padding; the pad fuses into x's producer
    xp = jnp.pad(xd, ((0, 0), (1, HP + 1 - H), (1, WP + 1 - W), (0, 0)))
    wflat = w.reshape(9 * C, Co).astype(mxu_dtype)
    bb = (b if b is not None else jnp.zeros((Co,), x.dtype))
    bb = bb.reshape(1, Co).astype(jnp.float32)

    operands = [xp, wflat, bb]
    in_specs = [
        pl.BlockSpec((1, HP + 2, WP + 2, C), lambda bi, i: (bi, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((9 * C, Co), lambda bi, i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Co), lambda bi, i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if has_rollout:
        s_top, s_full, s_bot = col3
        r_left, r_full, r_right = row3
        pad_w = ((0, 0), (0, WP - W), (0, 0))
        pad_h = ((0, 0), (0, HP - H), (0, 0))
        for v in (s_top, s_full, s_bot):
            operands.append(jnp.pad(v, pad_w))
            in_specs.append(pl.BlockSpec(
                (1, WP, Co), lambda bi, i: (bi, 0, 0),
                memory_space=pltpu.VMEM))
        for v in (r_left, r_full, r_right):
            operands.append(jnp.pad(v, pad_h))
            in_specs.append(pl.BlockSpec(
                (1, HP, Co), lambda bi, i: (bi, 0, 0),
                memory_space=pltpu.VMEM))

    out = pl.pallas_call(
        functools.partial(_kernel, TH, W, H, C, Co, has_rollout, x.dtype),
        grid=(B, n_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, TH, WP, Co),
                               lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, HP, WP, Co), x.dtype),
        scratch_shapes=[pltpu.VMEM((TH * WP, 9 * C), mxu_dtype)],
        interpret=interpret,
    )(*operands)
    return out[:, :H, :W, :]
