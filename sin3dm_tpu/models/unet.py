"""Triplane UNet denoiser — functional JAX re-design of the reference
`TriplaneUNetModelSmall` (`/root/reference/src/diffusion/unet_triplane.py:315-510`)
and its no-rollout variant `TriplaneUNetModelSmallRaw` (`:513-702`).

Architecture notes (kept semantically identical to the reference):

* each "triplane conv" is three independent 2D convs, one per plane; with
  rollout enabled every plane's input is concatenated with the broadcast
  axis-means of the other two planes — the cross-plane communication
  mechanism (`unet_triplane.py:21-60`),
* FiLM (scale-shift) timestep conditioning applied identically to all three
  planes (`unet_triplane.py:285-297`),
* per-plane GroupNorm32 (fp32 compute) (`unet_triplane.py:63-84`),
* down = 2x avgpool, up = 2x bilinear with size fix-up before skip concat
  (`unet_triplane.py:127-145`, `:488-505`),
* no attention layers anywhere (the reference's used config has none).

TPU-native differences: channels-last planes, params as pytrees, the whole
forward is one jitted function; optional bfloat16 compute for the torso
(replacing the reference's manual fp16, `fp16_util.py`).
"""

from __future__ import annotations

from typing import Any, Dict, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..core import nn
from ..core.triplane import Triplane


class UNetConfig(NamedTuple):
    in_channels: int = 12
    model_channels: int = 64
    out_channels: int = 12
    num_res_blocks: int = 1
    dropout: float = 0.0
    channel_mult: Tuple[int, ...] = (1, 2)
    use_checkpoint: bool = False
    use_scale_shift_norm: bool = True
    rollout: bool = True            # unet_small vs unet_raw
    compute_dtype: Any = jnp.float32  # set jnp.bfloat16 for TPU fast path
    # INFERENCE-ONLY pallas conv path (no VJP): one VMEM-resident
    # im2col+dot per row tile, rollout epilogue in-kernel — kills the
    # per-step relayout copies XLA inserts around batch-1 convs.
    # Samplers switch it on (see cli/sample.py); training must not.
    fused_conv: bool = False
    # GN32+FiLM+SiLU with fp32 statistics but compute-dtype apply
    # (nn.group_norm32_film_silu).  Differentiable — safe for training;
    # config wiring enables it with bfloat16 compute (use_fp16), where
    # the exact path's bf16->fp32 astype relayout copies cost ~20 ms per
    # train step.  Always on under fused_conv.
    fast_norm: bool = False
    # Plane-SPATIAL sharding (a jax.sharding.Mesh with a 'space' axis, see
    # parallel/halo.py): dim 1 of every plane (x for xy/xz, y for yz) is
    # sharded across the mesh; 3x3 self-convs run through halo_conv2d
    # (explicit 1-row ppermute halos), everything else (rollout means, GN
    # stats, up/downsampling) rides GSPMD-inserted collectives.  This is
    # the escalation path for retargeted planes that exceed one chip's
    # HBM (`src/sample.py:26-30` full convolutionality).  Plane dims on
    # the sharded axis must be divisible by 2^(levels-1) * mesh size.
    # Mutually exclusive with fused_conv (single-chip pallas path).
    spatial_mesh: Any = None

    @property
    def time_embed_dim(self) -> int:
        return self.model_channels * 4


# ---------------------------------------------------------------------------
# Triplane building blocks
# ---------------------------------------------------------------------------

def _tconv_init(key, cin: int, cout: int, ksize: int, rollout: bool,
                zero: bool = False) -> Dict:
    """Three per-plane convs; rollout triples the input channels."""
    cin_eff = cin * 3 if rollout else cin
    kshape = (ksize, ksize, cin_eff, cout)
    if zero:
        return {p: nn.zero_conv_init(kshape) for p in ("xy", "xz", "yz")}
    keys = jax.random.split(key, 3)
    return {p: nn.torch_conv_init(k, kshape)
            for p, k in zip(("xy", "xz", "yz"), keys)}


def _rollout_cat(t: Triplane) -> Triplane:
    """Concat each plane with broadcast axis-means of the other two
    (`unet_triplane.py:37-46`).  Layouts: xy [B,H,W,C], xz [B,H,D,C],
    yz [B,W,D,C] with H~x, W~y, D~z."""
    B = t.xy.shape[0]
    H, W, D = t.sizes
    C = t.channels

    mean_yz_d = jnp.mean(t.yz, axis=-2)   # [B, W, C]  (y-profile)
    mean_xz_d = jnp.mean(t.xz, axis=-2)   # [B, H, C]  (x-profile)
    mean_xy_w = jnp.mean(t.xy, axis=-2)   # [B, H, C]  (x-profile, avg over y)
    mean_yz_w = jnp.mean(t.yz, axis=-3)   # [B, D, C]  (z-profile, avg over y)
    mean_xy_h = jnp.mean(t.xy, axis=-3)   # [B, W, C]  (y-profile, avg over x)
    mean_xz_h = jnp.mean(t.xz, axis=-3)   # [B, D, C]  (z-profile, avg over x)

    def b(v, shape):  # broadcast helper
        return jnp.broadcast_to(v, shape)

    xy = jnp.concatenate([
        t.xy,
        b(mean_yz_d[:, None, :, :], (B, H, W, C)),
        b(mean_xz_d[:, :, None, :], (B, H, W, C)),
    ], axis=-1)
    xz = jnp.concatenate([
        t.xz,
        b(mean_xy_w[:, :, None, :], (B, H, D, C)),
        b(mean_yz_w[:, None, :, :], (B, H, D, C)),
    ], axis=-1)
    yz = jnp.concatenate([
        t.yz,
        b(mean_xy_h[:, :, None, :], (B, W, D, C)),
        b(mean_xz_h[:, None, :, :], (B, W, D, C)),
    ], axis=-1)
    return Triplane(xy, xz, yz)


def _conv1d3(vec: jax.Array, k3: jax.Array) -> jax.Array:
    """3-tap 1D conv with zero 'SAME' padding. vec [B,L,C], k3 [3,C,Co].

    Shifts are pad+add (fuses on TPU) instead of `.at[].add` — scatter
    ops inside a `lax.scan` body force extra full-tensor copies."""
    k3 = k3.astype(vec.dtype)
    mid = jnp.einsum("blc,co->blo", vec, k3[1])
    lo = jnp.einsum("blc,co->blo", vec[:, :-1], k3[0])
    hi = jnp.einsum("blc,co->blo", vec[:, 1:], k3[2])
    return (mid + jnp.pad(lo, ((0, 0), (1, 0), (0, 0)))
            + jnp.pad(hi, ((0, 0), (0, 1), (0, 0))))


def _colvar_contrib(vec: jax.Array, kb: jax.Array, H: int) -> jax.Array:
    """3x3-conv contribution of an image that is CONSTANT along rows
    (broadcast of vec [B,W,C] along axis 1).  Interior rows see the
    column-summed kernel; the zero-padded top/bottom rows see partial
    sums.  Exact, and ~3H x fewer FLOPs than the dense conv.

    Returned as a lazily-broadcast row-select expression ([B,H,W,Co]
    shaped but built from three [B,W,Co] vectors + iota): XLA fuses the
    whole thing into the consumer's add epilogue, so no full-size
    intermediate ever hits HBM (the old broadcast+concat form
    materialized two extra full tensors per contribution)."""
    s_top, s_full, s_bot = _colvar_vecs(vec, kb)
    ridx = jax.lax.broadcasted_iota(jnp.int32, (1, H, 1, 1), 1)
    return jnp.where(ridx == 0, s_top[:, None],
                     jnp.where(ridx == H - 1, s_bot[:, None],
                               s_full[:, None]))


def _rowvar_contrib(vec: jax.Array, kb: jax.Array, W: int) -> jax.Array:
    """Same for an image constant along columns (vec [B,H,C] broadcast
    along axis 2): row-summed kernel + partial sums at left/right."""
    s_left, s_full, s_right = _rowvar_vecs(vec, kb)
    cidx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, W, 1), 2)
    return jnp.where(cidx == 0, s_left[:, :, None],
                     jnp.where(cidx == W - 1, s_right[:, :, None],
                               s_full[:, :, None]))


def _conv1d3_multi(vec: jax.Array, k3s) -> Tuple[jax.Array, ...]:
    """Apply SEVERAL 3-tap 1D convs to the same vector with ONE dot.

    vec [B,L,C]; k3s = sequence of V kernels each [3, C, Co].  Builds the
    tap-shifted stack [B, L, 3, C] once and contracts against the packed
    [3, C, V, Co] kernel — one MXU call instead of 3V tiny dots (the
    kernel pack is loop-invariant, so XLA hoists it out of the sampling
    scan).  Returns V arrays [B, L, Co]; same math as V x `_conv1d3`
    (accumulation order differs by one fp reassociation)."""
    B, L, C = vec.shape
    z = jnp.zeros((B, 1, C), vec.dtype)
    stack = jnp.stack([
        jnp.concatenate([z, vec[:, :-1]], axis=1),   # tap 0: vec[l-1]
        vec,                                         # tap 1: vec[l]
        jnp.concatenate([vec[:, 1:], z], axis=1),    # tap 2: vec[l+1]
    ], axis=2)                                       # [B, L, 3, C]
    kp = jnp.stack([k.astype(vec.dtype) for k in k3s], axis=2)
    out = jnp.einsum("blsc,scvo->blvo", stack, kp)   # [B, L, V, Co]
    return tuple(out[:, :, v] for v in range(len(k3s)))


def _colvar_vecs(vec: jax.Array, kb: jax.Array):
    """(s_top, s_full, s_bot) [B, W, Co] — see `_colvar_contrib`."""
    return _conv1d3_multi(
        vec, (kb[1:].sum(0), kb.sum(0), kb[:2].sum(0)))


def _rowvar_vecs(vec: jax.Array, kb: jax.Array):
    """(r_left, r_full, r_right) [B, H, Co] — see `_rowvar_contrib`."""
    return _conv1d3_multi(
        vec, (kb[:, 1:].sum(1), kb.sum(1), kb[:, :2].sum(1)))


def _act_triplane(t: Triplane, act: Dict) -> Triplane:
    """Apply folded norm+FiLM+SiLU coefficients per plane (the XLA form
    of `ops/fused_conv.py act=`)."""
    return Triplane(*[nn.apply_film_coeffs(x, *act[k])
                      for k, x in zip(("xy", "xz", "yz"), t)])


def _tconv_apply_rollout_fast(p: Dict, t: Triplane,
                              fused: bool = False,
                              spatial_mesh=None,
                              act: Dict = None,
                              skip: Triplane = None,
                              emit_stats: bool = False):
    """Rollout conv without materializing the 3x-channel concat.

    The rollout channels are axis-means BROADCAST along one spatial axis
    (`unet_triplane.py:37-46`), so by linearity their 3x3-conv
    contribution collapses to 3-tap 1D convs on the un-broadcast vectors
    (plus partial-kernel fixups at the two zero-padded border lines).
    Exact same math as conv(concat(...)), at ~1/3 the conv FLOPs — this
    is the UNet's hot path on both training and the sampling chain.

    With `act` (per-plane folded GN32[+FiLM]+SiLU coefficients,
    `core/nn.py group_norm32_film_coeffs`), `t` is the RAW pre-norm
    triplane: the fused kernel applies the activation on VMEM-resident
    data, and the axis-mean reductions below consume the activated
    values without XLA ever materializing them (the apply fuses into
    the reduces)."""
    C = t.channels
    ta = _act_triplane(t, act) if act is not None else t
    m_yz_d = jnp.mean(ta.yz, axis=-2)   # [B, W, C]
    m_xz_d = jnp.mean(ta.xz, axis=-2)   # [B, H, C]
    m_xy_w = jnp.mean(ta.xy, axis=-2)   # [B, H, C]
    m_yz_w = jnp.mean(ta.yz, axis=-3)   # [B, D, C]
    m_xy_h = jnp.mean(ta.xy, axis=-3)   # [B, W, C]
    m_xz_h = jnp.mean(ta.xz, axis=-3)   # [B, D, C]

    def one(pp, x_raw, x_act, act_k, col_vec, row_vec, col_first: bool,
            skip_k=None):
        w = pp["w"]
        col_slot, row_slot = (1, 2) if col_first else (2, 1)
        if fused:
            from ..ops.fused_conv import conv3x3_rollout_fused
            col3 = _colvar_vecs(col_vec,
                                w[:, :, col_slot * C:(col_slot + 1) * C])
            row3 = _rowvar_vecs(row_vec,
                                w[:, :, row_slot * C:(row_slot + 1) * C])
            return conv3x3_rollout_fused(
                x_raw, w[:, :, :C], pp.get("b"), col3, row3,
                mxu_dtype=x_raw.dtype, act=act_k, skip=skip_k,
                emit_stats=emit_stats)
        if spatial_mesh is not None:
            from ..parallel.halo import halo_conv2d
            y = halo_conv2d({"w": w[:, :, :C]}, x_act, spatial_mesh)
        else:
            y = nn.conv2d({"w": w[:, :, :C]}, x_act)
        kb_c = w[:, :, col_slot * C:(col_slot + 1) * C]
        kb_r = w[:, :, row_slot * C:(row_slot + 1) * C]
        y = y + _colvar_contrib(col_vec, kb_c, x_act.shape[1])
        y = y + _rowvar_contrib(row_vec, kb_r, x_act.shape[2])
        if "b" in pp:
            y = y + pp["b"].astype(y.dtype)
        return y

    def ak(k):
        return act[k] if act is not None else None

    # block order per plane follows _rollout_cat:
    #   xy: [self, col-varying (m_yz_d), row-varying (m_xz_d)]
    #   xz: [self, row-varying (m_xy_w), col-varying (m_yz_w)]
    #   yz: [self, row-varying (m_xy_h), col-varying (m_xz_h)]
    sk = lambda k: getattr(skip, k) if skip is not None else None
    xy = one(p["xy"], t.xy, ta.xy, ak("xy"), m_yz_d, m_xz_d,
             col_first=True, skip_k=sk("xy"))
    xz = one(p["xz"], t.xz, ta.xz, ak("xz"), m_yz_w, m_xy_w,
             col_first=False, skip_k=sk("xz"))
    yz = one(p["yz"], t.yz, ta.yz, ak("yz"), m_xz_h, m_xy_h,
             col_first=False, skip_k=sk("yz"))
    if emit_stats:
        (xy, s_xy), (xz, s_xz), (yz, s_yz) = xy, xz, yz
        return Triplane(xy, xz, yz), {"xy": s_xy, "xz": s_xz, "yz": s_yz}
    return Triplane(xy, xz, yz)


def _tconv_apply(p: Dict, t: Triplane, rollout: bool,
                 fused: bool = False, spatial_mesh=None,
                 act: Dict = None) -> Triplane:
    # the pallas path is sized for 2-byte compute; a 4-byte activation
    # (fp32 sampler) overflows the 16MB scoped-VMEM limit at batch>1 —
    # keep XLA convs there (bf16 is the production sampling dtype)
    if fused and jnp.dtype(t.xy.dtype).itemsize > 2:
        fused = False
    if rollout:
        if p["xy"]["w"].shape[0] == 3 and min(t.sizes) >= 2:
            return _tconv_apply_rollout_fast(p, t, fused=fused,
                                             spatial_mesh=spatial_mesh,
                                             act=act)
        if act is not None:
            t = _act_triplane(t, act)
            act = None
        t = _rollout_cat(t)
    if fused and p["xy"]["w"].shape[0] == 3:
        from ..ops.fused_conv import conv3x3_rollout_fused
        return Triplane(*[
            conv3x3_rollout_fused(
                x, pp["w"], pp.get("b"), mxu_dtype=x.dtype,
                act=act[k] if act is not None else None)
            for k, pp, x in zip(("xy", "xz", "yz"),
                                (p["xy"], p["xz"], p["yz"]), t)])
    if act is not None:
        t = _act_triplane(t, act)
    if spatial_mesh is not None and p["xy"]["w"].shape[0] == 3:
        from ..parallel.halo import halo_conv2d
        return Triplane(*[halo_conv2d(pp, x, spatial_mesh)
                          for pp, x in zip((p["xy"], p["xz"], p["yz"]), t)])
    return Triplane(nn.conv2d(p["xy"], t.xy),
                    nn.conv2d(p["xz"], t.xz),
                    nn.conv2d(p["yz"], t.yz))


def _tnorm_init(channels: int) -> Dict:
    return {p: nn.group_norm_init(channels) for p in ("xy", "xz", "yz")}


def _tnorm_apply(p: Dict, t: Triplane) -> Triplane:
    return Triplane(nn.group_norm32(p["xy"], t.xy),
                    nn.group_norm32(p["xz"], t.xz),
                    nn.group_norm32(p["yz"], t.yz))


def _tsilu(t: Triplane) -> Triplane:
    return t.map(nn.silu)


def _tdown2x(t: Triplane) -> Triplane:
    return t.map(nn.avg_pool2x)


def _tup2x(t: Triplane) -> Triplane:
    return t.map(nn.upsample2x_bilinear)


# ---------------------------------------------------------------------------
# ResBlock
# ---------------------------------------------------------------------------

def _resblock_init(key, cin: int, cout: int, emb_dim: int,
                   use_scale_shift: bool, rollout: bool) -> Dict:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    p = {
        "in_norm": _tnorm_init(cin),
        "in_conv": _tconv_init(k1, cin, cout, 3, rollout),
        "emb": nn.torch_linear_init(
            k2, emb_dim, 2 * cout if use_scale_shift else cout),
        "out_norm": _tnorm_init(cout),
        "out_conv": _tconv_init(k3, cout, cout, 3, rollout, zero=True),
    }
    if cin != cout:
        p["skip"] = _tconv_init(k4, cin, cout, 1, rollout=False)
    return p


def _tnorm_silu_fast(p: Dict, t: Triplane, film=None) -> Triplane:
    """Inference fast path: GN32 (+FiLM) + SiLU per plane with the
    normalize applied in compute dtype (`nn.group_norm32_film_silu`)."""
    return Triplane(
        nn.group_norm32_film_silu(p["xy"], t.xy, film),
        nn.group_norm32_film_silu(p["xz"], t.xz, film),
        nn.group_norm32_film_silu(p["yz"], t.yz, film))


def _tnorm_coeffs(p: Dict, t: Triplane, film=None) -> Dict:
    """Per-plane folded GN32[+FiLM]+SiLU coefficients for the fused conv
    (`ops/fused_conv.py act=`): stats in fp32, apply deferred into the
    kernel."""
    return {k: nn.group_norm32_film_coeffs(p[k], getattr(t, k), film=film)
            for k in ("xy", "xz", "yz")}


def _use_fused_act() -> bool:
    """In-kernel pre-activation (conv kernel applies the folded
    GN32+FiLM+SiLU while staging x) — OFF by default: measured SLOWER on
    the v5e sampling chain (0.92-0.95 ms/step vs 0.80 ms/step), because
    the chain is latency-bound, not HBM-bound (5.6% of peak HBM BW): the
    staging pass serializes VPU work ahead of the MXU inside each kernel,
    while XLA's separate elementwise pass overlaps with neighboring ops.
    Kept behind SIN3DM_FUSED_ACT=1 (golden-tested) for future shapes
    where the balance differs (larger planes / higher batch)."""
    import os
    return os.environ.get("SIN3DM_FUSED_ACT", "0") == "1"


def _use_stats_chain() -> bool:
    """GroupNorm-statistics chaining through the fused convs' epilogues
    (inference only): each conv emits per-channel (sum, sumsq) of its
    output, so the NEXT norm's coefficients come from [2, C]-sized math
    instead of an XLA re-read of the full activation, and the skip-add
    fuses into the out conv.

    OFF by default: the r5 device profile attributed ~146 us of the
    0.80 ms chain step to the GN stat reduces, but the chained kernel
    must stage its input through a whole-plane VMEM scratch (the act
    apply + stats need it), and that stage is a dependency barrier that
    loses MORE to broken cross-kernel prefetch overlap than the reduces
    cost — measured 0.833 vs 0.802 ms/step on the v5e chain.  Kept
    golden-tested behind SIN3DM_STATS_CHAIN=1 for shapes where the
    balance differs (larger planes amortize the stage; higher batch
    hides it)."""
    import os
    return os.environ.get("SIN3DM_STATS_CHAIN", "0") == "1"


def _tnorm_coeffs_from_stats(pn: Dict, stats: Dict, sizes, film=None
                             ) -> Dict:
    """Per-plane folded GN32[+FiLM]+SiLU coefficients from chained
    (sum, sumsq) statistics (`nn.group_norm32_coeffs_from_sums`)."""
    H, W, D = sizes
    n_hw = {"xy": H * W, "xz": H * D, "yz": W * D}
    return {k: nn.group_norm32_coeffs_from_sums(pn[k], stats[k], n_hw[k],
                                                film=film)
            for k in ("xy", "xz", "yz")}


def _stats_block_ok(p: Dict, t: Triplane, rollout: bool) -> bool:
    """Preconditions for the stats-chained resblock: 3x3 rollout convs on
    the fast path, input channels within the fused kernel's single-call
    budget (the channel-split wide path cannot emit output stats)."""
    return (rollout and p["in_conv"]["xy"]["w"].shape[0] == 3
            and min(t.sizes) >= 2 and t.channels <= 128)


def _resblock_apply_stats(p: Dict, t: Triplane, t_stats, emb: jax.Array,
                          use_scale_shift: bool):
    """Inference resblock on the fused conv path with (a) GroupNorm
    statistics CHAINED from conv epilogues, (b) norm+FiLM+SiLU applied
    in-kernel during halo staging, and (c) the residual skip-add fused
    into the out conv.  Returns (out, out_stats) — out_stats feeds the
    next block's in_norm (or the final out norm).

    Numerics match `_resblock_apply(fast_norm=True)` up to summation
    order: statistics accumulate in fp32 from the UNROUNDED fp32 conv
    outputs (the XLA path reduces the bf16-rounded tensor), and the skip
    add happens in fp32 before the bf16 cast.
    """
    a1 = (_tnorm_coeffs_from_stats(p["in_norm"], t_stats, t.sizes)
          if t_stats is not None else _tnorm_coeffs(p["in_norm"], t))
    h, h_stats = _tconv_apply_rollout_fast(p["in_conv"], t, fused=True,
                                           act=a1, emit_stats=True)

    emb_out = nn.linear(p["emb"], nn.silu(emb))
    emb_out = emb_out[:, None, None, :]  # [B,1,1,C or 2C] fp32
    if use_scale_shift:
        film = tuple(jnp.split(emb_out, 2, axis=-1))
        a2 = _tnorm_coeffs_from_stats(p["out_norm"], h_stats, h.sizes,
                                      film=film)
    else:
        # the emb add lands between conv and norm — stats no longer
        # describe the normed tensor; fall back to the XLA reduce
        h = h.map(lambda v: v + emb_out.astype(v.dtype))
        a2 = _tnorm_coeffs(p["out_norm"], h)

    skip = _tconv_apply(p["skip"], t, rollout=False) if "skip" in p else t
    return _tconv_apply_rollout_fast(p["out_conv"], h, fused=True, act=a2,
                                     skip=skip, emit_stats=True)


def _resblock_apply(p: Dict, t: Triplane, emb: jax.Array,
                    use_scale_shift: bool, rollout: bool,
                    fused: bool = False,
                    fast_norm: bool = False,
                    spatial_mesh=None) -> Triplane:
    if fused and _use_fused_act():
        # norm+FiLM+SiLU fold into per-channel coefficients consumed
        # INSIDE the conv kernel: the activated tensors never hit HBM
        # (the rollout means fuse the apply into their reductions)
        a1 = _tnorm_coeffs(p["in_norm"], t)
        h = _tconv_apply(p["in_conv"], t, rollout, fused, spatial_mesh,
                         act=a1)
        emb_out = nn.linear(p["emb"], nn.silu(emb)).astype(h.xy.dtype)
        emb_out = emb_out[:, None, None, :]  # [B,1,1,C or 2C]
        if use_scale_shift:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            a2 = _tnorm_coeffs(p["out_norm"], h, film=(scale, shift))
        else:
            h = h.map(lambda v: v + emb_out)
            a2 = _tnorm_coeffs(p["out_norm"], h)
        h = _tconv_apply(p["out_conv"], h, rollout, fused, spatial_mesh,
                         act=a2)
        skip = (_tconv_apply(p["skip"], t, rollout=False)
                if "skip" in p else t)
        return h + skip

    fast_norm = fast_norm or fused
    if fast_norm:
        h = _tnorm_silu_fast(p["in_norm"], t)
    else:
        h = _tnorm_apply(p["in_norm"], t)
        h = _tsilu(h)
    h = _tconv_apply(p["in_conv"], h, rollout, fused, spatial_mesh)

    emb_out = nn.linear(p["emb"], nn.silu(emb)).astype(h.xy.dtype)
    emb_out = emb_out[:, None, None, :]  # [B,1,1,C or 2C]

    if use_scale_shift:
        scale, shift = jnp.split(emb_out, 2, axis=-1)
        if fast_norm:
            h = _tnorm_silu_fast(p["out_norm"], h, film=(scale, shift))
        else:
            h = _tnorm_apply(p["out_norm"], h)
            h = h.map(lambda v: v * (1.0 + scale) + shift)
            h = _tsilu(h)
        h = _tconv_apply(p["out_conv"], h, rollout, fused, spatial_mesh)
    else:
        h = h.map(lambda v: v + emb_out)
        if fast_norm:
            h = _tnorm_silu_fast(p["out_norm"], h)
        else:
            h = _tnorm_apply(p["out_norm"], h)
            h = _tsilu(h)
        h = _tconv_apply(p["out_conv"], h, rollout, fused, spatial_mesh)

    skip = _tconv_apply(p["skip"], t, rollout=False) if "skip" in p else t
    return h + skip


# ---------------------------------------------------------------------------
# UNet init / apply
# ---------------------------------------------------------------------------

def init_unet(key: jax.Array, cfg: UNetConfig) -> Dict:
    """Build the parameter pytree mirroring the reference's construction
    loop (`unet_triplane.py:377-449`)."""
    # 2 time-embed + in_conv + down/up resblocks + out conv; keep >= 64 so
    # default-config key streams (and thus seeds) stay identical to r1
    n_keys = max(64, 4 + 2 * len(cfg.channel_mult) * cfg.num_res_blocks)
    keys = iter(jax.random.split(key, n_keys))
    mc = cfg.model_channels
    emb_dim = cfg.time_embed_dim

    params: Dict = {
        "time_embed": {
            "l1": nn.torch_linear_init(next(keys), mc, emb_dim),
            "l2": nn.torch_linear_init(next(keys), emb_dim, emb_dim),
        },
    }

    ch = input_ch = int(cfg.channel_mult[0] * mc)
    params["in_conv"] = _tconv_init(next(keys), cfg.in_channels, ch, 1,
                                    rollout=False)

    input_block_chans = [ch]
    down: List[List[Dict]] = []
    for level, mult in enumerate(cfg.channel_mult):
        blocks = []
        for _ in range(cfg.num_res_blocks):
            blocks.append(_resblock_init(
                next(keys), ch, int(mult * mc), emb_dim,
                cfg.use_scale_shift_norm, cfg.rollout))
            ch = int(mult * mc)
        down.append(blocks)
        input_block_chans.append(ch)
    params["down"] = down

    up: List[List[Dict]] = []
    for level, mult in list(enumerate(cfg.channel_mult))[::-1]:
        blocks = []
        # ONE skip concat per level (see unet_apply): its width is consumed
        # by the level's first block.  Identical to the reference for
        # num_res_blocks=1 (`unet_triplane.py:407-434`); for >1 blocks the
        # reference's own bookkeeping underflows (it pops per block but
        # appends per level), so this is the working generalization.
        ich_level = input_block_chans.pop()
        for i in range(cfg.num_res_blocks):
            ich = ich_level if i == 0 else 0
            if level == len(cfg.channel_mult) - 1 and i == 0:
                ich = 0
            blocks.append(_resblock_init(
                next(keys), ch + ich, int(mult * mc), emb_dim,
                cfg.use_scale_shift_norm, cfg.rollout))
            ch = int(mult * mc)
        up.append(blocks)
    params["up"] = up

    params["out"] = {
        "norm": _tnorm_init(ch),
        "conv": _tconv_init(next(keys), input_ch, cfg.out_channels, 1,
                            rollout=False, zero=True),
    }
    return params


def _resize_to(t: Triplane, ref: Triplane) -> Triplane:
    """Bilinear size fix-up before skip concat (`unet_triplane.py:494-499`)."""
    planes = []
    for cur, tgt in zip(t, ref):
        if cur.shape[-3:-1] != tgt.shape[-3:-1]:
            cur = nn.resize_bilinear(cur, tgt.shape[-3:-1])
        planes.append(cur)
    return Triplane(*planes)


def unet_apply(params: Dict, cfg: UNetConfig, x: Triplane,
               timesteps: jax.Array) -> Triplane:
    """Forward pass. x: Triplane of [B, ., ., C_in]; timesteps: [B].

    Returns a Triplane with out_channels (same spatial sizes as input,
    matching the reference's output-shape assert, `unet_triplane.py:509`).
    """
    te = params["time_embed"]
    emb = nn.timestep_embedding(timesteps, cfg.model_channels)
    emb = nn.linear(te["l2"], nn.silu(nn.linear(te["l1"], emb)))

    mesh = cfg.spatial_mesh
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        from ..parallel.halo import AXIS
        _sh = NamedSharding(mesh, P(None, AXIS))

        def constrain(t: Triplane) -> Triplane:
            # dim 1 of every plane sharded over 'space'; GSPMD propagates
            # through the elementwise/GN/resize ops between constraints
            return t.map(
                lambda v: jax.lax.with_sharding_constraint(v, _sh))
    else:
        constrain = lambda t: t

    h = x.astype(cfg.compute_dtype)
    h = constrain(h)
    h = _tconv_apply(params["in_conv"], h, rollout=False)

    # stats-chained fused inference: conv epilogues feed the next norm's
    # statistics; the (sum, sumsq) pair rides alongside h and invalidates
    # wherever the tensor is transformed outside a chained conv
    # (down/up-sampling, skip concat)
    use_stats = (cfg.fused_conv and mesh is None
                 and not cfg.use_checkpoint
                 and jnp.dtype(cfg.compute_dtype).itemsize <= 2
                 and not _use_fused_act() and _use_stats_chain())
    h_stats = None

    def run_block(p, t, e):
        fn = lambda pp, tt, ee: _resblock_apply(
            pp, tt, ee, cfg.use_scale_shift_norm, cfg.rollout,
            fused=cfg.fused_conv, fast_norm=cfg.fast_norm,
            spatial_mesh=mesh)
        if cfg.use_checkpoint:
            fn = jax.checkpoint(fn)
        return fn(p, t, e)

    def run_block_maybe_stats(p, t, t_stats, e):
        if use_stats and _stats_block_ok(p, t, cfg.rollout):
            return _resblock_apply_stats(p, t, t_stats, e,
                                         cfg.use_scale_shift_norm)
        return run_block(p, t, e), None

    hs = []
    for level, blocks in enumerate(params["down"]):
        if level != 0:
            h = constrain(_tdown2x(h))
            h_stats = None
        for bp in blocks:
            h, h_stats = run_block_maybe_stats(bp, h, h_stats, emb)
        hs.append(h)

    n_levels = len(params["up"])
    for level, blocks in enumerate(params["up"]):
        if level == 0:
            h = hs.pop()
        else:
            skip = hs.pop()
            h = constrain(_resize_to(h, skip))
            h = Triplane(
                jnp.concatenate([h.xy, skip.xy], axis=-1),
                jnp.concatenate([h.xz, skip.xz], axis=-1),
                jnp.concatenate([h.yz, skip.yz], axis=-1))
            h_stats = None
        for bp in blocks:
            h, h_stats = run_block_maybe_stats(bp, h, h_stats, emb)
        if level < n_levels - 1:
            h = constrain(_tup2x(h))
            h_stats = None

    if h_stats is not None:
        h = _act_triplane(
            h, _tnorm_coeffs_from_stats(params["out"]["norm"], h_stats,
                                        h.sizes))
    elif cfg.fused_conv or cfg.fast_norm:
        h = _tnorm_silu_fast(params["out"]["norm"], h)
    else:
        h = _tnorm_apply(params["out"]["norm"], h)
        h = _tsilu(h)
    h = _tconv_apply(params["out"]["conv"], h, rollout=False)
    # keep the output sharded like the input so a sampling scan's carry
    # never round-trips through a replicated layout
    return constrain(h.astype(x.dtype))
