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

With `act=(A, B)` the kernel additionally applies the pre-activation
`silu(x * A + B)` (per-channel fp32 coefficients — a folded
GroupNorm32 [+ FiLM], see `core/nn.py group_norm32_film_coeffs`) while
staging x into a VMEM halo scratch at the first row tile.  That removes
the full-size HBM round trip of the activated tensor the XLA path pays
per conv — the norm/silu runs once per plane on VMEM-resident data, in
row chunks so the fp32 temporaries stay within the scoped-VMEM stack
budget (a whole-plane fp32 apply costs a 6 MB lane-padded stack temp at
towerruins scale and OOMs the 16 MB scoped limit).

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
            has_act: bool, out_dtype, x_ref, w_ref, b_ref, *refs):
    refs = list(refs)
    a_ref = b2_ref = None
    if has_act:
        a_ref, b2_ref = refs[0], refs[1]
        refs = refs[2:]
    if has_rollout:  # kernel args: ins..., outs..., scratch...
        st_ref, sf_ref, sb_ref, rl_ref, rf_ref, rr_ref = refs[:6]
        refs = refs[6:]
    out_ref = refs[0]
    im_ref = refs[-1]
    xp_ref = refs[1] if has_act else x_ref  # halo scratch only with act
    i = pl.program_id(1)
    WP = im_ref.shape[0] // TH

    if has_act:
        # stage silu(x*A+B) into the halo scratch ONCE per plane (the
        # scratch persists across the row-tile grid axis, which is the
        # fastest).  fp32 apply in row chunks: Mosaic rejects mixed
        # f32-scalar/bf16-vector broadcasts inside sigmoid, and a
        # whole-plane fp32 temp would blow the scoped-VMEM stack.
        @pl.when(i == 0)
        def _stage():
            xp_ref[:] = jnp.zeros(xp_ref.shape, xp_ref.dtype)
            CH = 16
            for r0 in range(0, H, CH):
                rr = min(CH, H - r0)
                xv = x_ref[0, pl.ds(r0 + 1, rr), 1:W + 1, :]
                xa = xv.astype(jnp.float32) * a_ref[0] + b2_ref[0]
                xa = xa * jax.nn.sigmoid(xa)
                xp_ref[pl.ds(r0 + 1, rr), 1:W + 1, :] = (
                    xa.astype(xp_ref.dtype))

    # im2col: 9 shifted [TH, WP, C] windows -> [TH*WP, 9C]
    for dh in range(3):
        for dw in range(3):
            if has_act:
                win = xp_ref[pl.ds(i * TH + dh, TH), dw:dw + WP, :]
            else:
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
        mxu_dtype=jnp.bfloat16,
        act: Optional[Tuple[jax.Array, jax.Array]] = None) -> jax.Array:
    """y = conv3x3_SAME(act(x)) + b + colvar + rowvar, one pallas program.

    x: [B, H, W, C]; w: [3, 3, C, Co]; b: [Co] or None.
    col3: (s_top, s_full, s_bot) each [B, W, Co] — the rollout
      contribution of the column-varying broadcast plane (row-class
      select).  row3: (r_left, r_full, r_right) each [B, H, Co].
    act: optional per-channel pre-activation coefficients (A, B) each
      [B, C] fp32; the kernel computes silu(x*A + B) (fp32 apply) while
      staging x (a folded GroupNorm32 [+ FiLM] + SiLU).  col3/row3 must
      then be computed from the ACTIVATED plane means by the caller.
    Returns [B, H, W, Co] in x.dtype.  interpret defaults to True on the
    CPU backend (tests).
    """
    if interpret is None:
        interpret = _on_cpu()
    B, H, W, C = x.shape
    Co = w.shape[-1]
    has_rollout = col3 is not None
    has_act = act is not None

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
        def act_slice(lo, hi):
            if act is None:
                return None
            return (act[0][:, lo:hi], act[1][:, lo:hi])
        y = conv3x3_rollout_fused(
            x[..., :c_max], w[:, :, :c_max], b, col3, row3,
            tile_h=tile_h, interpret=interpret, mxu_dtype=mxu_dtype,
            act=act_slice(0, c_max))
        for lo in range(c_max, C, c_max):
            hi = min(lo + c_max, C)
            y = y + conv3x3_rollout_fused(
                x[..., lo:hi], w[:, :, lo:hi], None,
                tile_h=tile_h, interpret=interpret, mxu_dtype=mxu_dtype,
                act=act_slice(lo, hi))
        return y

    if tile_h is None:
        import os
        # the act path carries an extra halo scratch; a smaller row tile
        # keeps its im2col + out blocks inside the scoped-VMEM budget
        default = ("8" if has_act else "16") if elem <= 2 else "8"
        tile_h = int(os.environ.get("SIN3DM_FUSED_TILE", default))
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
    if has_act:
        A, Bc = act
        for v in (A, Bc):
            operands.append(v.astype(jnp.float32))
            in_specs.append(pl.BlockSpec(
                (1, C), lambda bi, i: (bi, 0), memory_space=pltpu.VMEM))
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

    scratch = []
    if has_act:
        scratch.append(pltpu.VMEM((HP + 2, WP + 2, C), mxu_dtype))
    scratch.append(pltpu.VMEM((TH * WP, 9 * C), mxu_dtype))

    out = pl.pallas_call(
        functools.partial(_kernel, TH, W, H, C, Co, has_rollout, has_act,
                          x.dtype),
        grid=(B, n_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, TH, WP, Co),
                               lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, HP, WP, Co), x.dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*operands)
    return out[:, :H, :W, :]
