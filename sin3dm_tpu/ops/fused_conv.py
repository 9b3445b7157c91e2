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
            has_act: bool, has_skip: bool, emit_stats: bool, staged: bool,
            out_dtype, *refs):
    # arg order: ins (x, w, b, [actA, actB], [rollout x6], [skip]),
    #            outs (y, [stats]), scratch ([halo], [skip-pad], im)
    refs = list(refs)
    x_ref, w_ref, b_ref = refs[:3]
    idx = 3
    a_ref = b2_ref = None
    if has_act:
        a_ref, b2_ref = refs[idx:idx + 2]
        idx += 2
    if has_rollout:
        st_ref, sf_ref, sb_ref, rl_ref, rf_ref, rr_ref = refs[idx:idx + 6]
        idx += 6
    if has_skip:
        sk_ref = refs[idx]
        idx += 1
    out_ref = refs[idx]
    idx += 1
    if emit_stats:
        stats_ref = refs[idx]
        idx += 1
    if staged:
        xp_ref = refs[idx]  # zero-halo staging scratch
        idx += 1
    else:
        xp_ref = None  # x_ref IS the pre-padded plane (fast default)
    if has_skip:
        sp_ref = refs[idx]  # tile-padded skip scratch
        idx += 1
    im_ref = refs[idx]
    i = pl.program_id(1)
    WP = im_ref.shape[0] // TH

    # With epilogue features (act/skip/stats) x ships unpadded and is
    # staged into a zero-halo scratch at the first row tile.  WITHOUT
    # them, x arrives pre-padded from XLA and the kernel reads it
    # directly: the whole-plane stage is a dependency barrier (every
    # im2col read waits on it), and measured on the chain it LOSES more
    # to broken cross-kernel prefetch overlap than the XLA-side pad op
    # costs (0.833 vs 0.802 ms/step) — so the unstaged layout stays the
    # default.  With `act`, silu(x*A+B) applies during the stage: fp32
    # apply in row chunks — Mosaic rejects mixed f32-scalar/bf16-vector
    # broadcasts inside sigmoid, and a whole-plane fp32 temp would blow
    # scoped VMEM.
    if staged:
        @pl.when(i == 0)
        def _stage():
            xp_ref[:] = jnp.zeros(xp_ref.shape, xp_ref.dtype)
            if has_act:
                CH = 16
                for r0 in range(0, H, CH):
                    rr = min(CH, H - r0)
                    xv = x_ref[0, pl.ds(r0, rr), :, :]
                    xa = xv.astype(jnp.float32) * a_ref[0, 0] + b2_ref[0, 0]
                    xa = xa * jax.nn.sigmoid(xa)
                    xp_ref[pl.ds(r0 + 1, rr), 1:W + 1, :] = (
                        xa.astype(xp_ref.dtype))
            else:
                xp_ref[1:H + 1, 1:W + 1, :] = x_ref[0].astype(xp_ref.dtype)
            if has_skip:
                sp_ref[:] = jnp.zeros(sp_ref.shape, sp_ref.dtype)
                sp_ref[:H, :W, :] = sk_ref[0]

    # im2col: 9 shifted [TH, WP, C] windows -> [TH*WP, 9C]
    for dh in range(3):
        for dw in range(3):
            if staged:
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

    if has_skip:
        # residual add in-kernel: the resblock output never round-trips
        # HBM between the conv and the skip sum
        y = y + sp_ref[pl.ds(i * TH, TH), :, :].astype(jnp.float32)

    out_ref[0] = y.astype(out_dtype)

    if emit_stats:
        # per-channel (sum, sumsq) of the VALID region — feeds the NEXT
        # GroupNorm32 without re-reading the activation from HBM
        # (`core/nn.py group_norm32_coeffs_from_sums`).  Computed from
        # the WRITTEN output tile: (a) statistics then match the XLA
        # path's fp32 reduce of the rounded output exactly, (b) masking/
        # reducing the MXU dot value directly sent Mosaic's layout
        # assignment into a 200-300 s compile — re-reading the stored
        # tile breaks that dependence.  Per-TILE partials, each tile its
        # own output block (a revisited accumulator block was equally
        # pathological); a trivial XLA reduce sums the [n_tiles, 2, Co].
        g = i * TH + jax.lax.broadcasted_iota(jnp.int32, (TH, 1, 1), 0)
        c2 = jax.lax.broadcasted_iota(jnp.int32, (1, WP, 1), 1)
        valid = (g < H) & (c2 < W)
        yv = out_ref[0].astype(jnp.float32)
        ym = jnp.where(valid, yv, 0.0)
        s1 = jnp.sum(jnp.sum(ym, axis=0), axis=0, keepdims=True)
        s2 = jnp.sum(jnp.sum(ym * ym, axis=0), axis=0, keepdims=True)
        stats_ref[0, 0] = jnp.concatenate([s1, s2], axis=0)  # [2, Co]


def _on_cpu() -> bool:
    return jax.default_backend() == "cpu"


def conv3x3_rollout_fused(
        x: jax.Array, w: jax.Array, b: Optional[jax.Array],
        col3: Optional[Tuple[jax.Array, jax.Array, jax.Array]] = None,
        row3: Optional[Tuple[jax.Array, jax.Array, jax.Array]] = None,
        tile_h: Optional[int] = None, interpret: Optional[bool] = None,
        mxu_dtype=jnp.bfloat16,
        act: Optional[Tuple[jax.Array, jax.Array]] = None,
        skip: Optional[jax.Array] = None,
        emit_stats: bool = False):
    """y = conv3x3_SAME(act(x)) + b + colvar + rowvar [+ skip], one
    pallas program, optionally emitting y's GroupNorm feed-stats.

    x: [B, H, W, C]; w: [3, 3, C, Co]; b: [Co] or None.
    col3: (s_top, s_full, s_bot) each [B, W, Co] — the rollout
      contribution of the column-varying broadcast plane (row-class
      select).  row3: (r_left, r_full, r_right) each [B, H, Co].
    act: optional per-channel pre-activation coefficients (A, B) each
      [B, C] fp32; the kernel computes silu(x*A + B) (fp32 apply) while
      staging x (a folded GroupNorm32 [+ FiLM] + SiLU).  col3/row3 must
      then be computed from the ACTIVATED plane means by the caller.
    skip: optional [B, H, W, Co] residual added to y in-kernel (the
      resblock skip sum — the block output never round-trips HBM).
    emit_stats: also return per-channel fp32 (sum, sumsq) [B, 2, Co] of
      the final y over the valid H x W region — the NEXT GroupNorm32's
      statistics without an XLA re-read of the activation
      (`core/nn.py group_norm32_coeffs_from_sums`).  Not supported on
      the channel-split wide-input path (partial convs sum outside the
      kernel); callers fall back to the XLA reduce there.
    Returns [B, H, W, Co] in x.dtype (plus stats when emit_stats).
    interpret defaults to True on the CPU backend (tests).
    """
    if interpret is None:
        interpret = _on_cpu()
    B, H, W, C = x.shape
    Co = w.shape[-1]
    has_rollout = col3 is not None
    has_act = act is not None
    has_skip = skip is not None

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
        if emit_stats:
            raise ValueError("emit_stats is unsupported on the "
                             "channel-split wide-input path (C "
                             f"{C} > {c_max}); fall back to XLA stats")

        def act_slice(lo, hi):
            if act is None:
                return None
            return (act[0][:, lo:hi], act[1][:, lo:hi])
        y = conv3x3_rollout_fused(
            x[..., :c_max], w[:, :, :c_max], b, col3, row3,
            tile_h=tile_h, interpret=interpret, mxu_dtype=mxu_dtype,
            act=act_slice(0, c_max), skip=skip)
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

    # Epilogue features need the staging scratch (act applies during the
    # stage; skip/stats piggyback on it); the plain conv keeps the
    # pre-padded operand — see the staging tradeoff note in _kernel.
    staged = has_act or has_skip or emit_stats
    xd = x.astype(mxu_dtype)
    if not staged:
        # zero 'SAME' halo + tile padding on the XLA side
        xd = jnp.pad(xd, ((0, 0), (1, HP + 1 - H), (1, WP + 1 - W), (0, 0)))
    wflat = w.reshape(9 * C, Co).astype(mxu_dtype)
    bb = (b if b is not None else jnp.zeros((Co,), x.dtype))
    bb = bb.reshape(1, Co).astype(jnp.float32)

    operands = [xd, wflat, bb]
    in_specs = [
        pl.BlockSpec((1, H, W, C) if staged else (1, HP + 2, WP + 2, C),
                     lambda bi, i: (bi, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((9 * C, Co), lambda bi, i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Co), lambda bi, i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if has_act:
        A, Bc = act
        for v in (A, Bc):
            # [B, 1, C] so the block's last two dims equal the array's
            # (a (1, C) block over a [B, C] array violates the Mosaic
            # (8, 128)-divisibility rule as soon as B > 1)
            operands.append(v.reshape(B, 1, C).astype(jnp.float32))
            in_specs.append(pl.BlockSpec(
                (1, 1, C), lambda bi, i: (bi, 0, 0),
                memory_space=pltpu.VMEM))
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
    if has_skip:
        operands.append(skip.astype(mxu_dtype))
        in_specs.append(pl.BlockSpec((1, H, W, Co),
                                     lambda bi, i: (bi, 0, 0, 0),
                                     memory_space=pltpu.VMEM))

    out_specs = [pl.BlockSpec((1, TH, WP, Co), lambda bi, i: (bi, i, 0, 0),
                              memory_space=pltpu.VMEM)]
    out_shapes = [jax.ShapeDtypeStruct((B, HP, WP, Co), x.dtype)]
    if emit_stats:
        out_specs.append(pl.BlockSpec((1, 1, 2, Co),
                                      lambda bi, i: (bi, i, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct((B, n_tiles, 2, Co),
                                               jnp.float32))

    scratch = []
    if staged:
        scratch.append(pltpu.VMEM((HP + 2, WP + 2, C), mxu_dtype))
    if has_skip:
        scratch.append(pltpu.VMEM((HP, WP, Co), mxu_dtype))
    scratch.append(pltpu.VMEM((TH * WP, 9 * C), mxu_dtype))

    outs = pl.pallas_call(
        functools.partial(_kernel, TH, W, H, C, Co, has_rollout, has_act,
                          has_skip, emit_stats, staged, x.dtype),
        grid=(B, n_tiles),
        in_specs=in_specs,
        out_specs=out_specs if emit_stats else out_specs[0],
        out_shape=out_shapes if emit_stats else out_shapes[0],
        scratch_shapes=scratch,
        interpret=interpret,
    )(*operands)
    if emit_stats:
        return outs[0][:, :H, :W, :], outs[1].sum(axis=1)
    return outs[:, :H, :W, :]
