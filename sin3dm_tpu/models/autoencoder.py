"""Triplane shape autoencoder — functional JAX re-design of the reference
`AutoEncoderGroupSkip` / `AutoEncoderGroupV3` / `AutoEncoderGroupPBR`
(`/root/reference/src/encoding/networks.py:21-334`).

Pipeline (identical semantics, channels-last layout):

* encode: two strided Conv3d (k4/s2/p1) over the dense SDF(+tex) volume —
  geometry branch sees only the SDF channel, texture branch sees all
  channels (`networks.py:129-131, 164-180`); axis-mean collapses the
  volume to three planes; a SHARED unaffine InstanceNorm then `tanh(x*0.5)`
  squashes each plane,
* decode: per-branch TriplaneGroupResnetBlock (3 independent ks-5 convs —
  the reference's grouped conv over zero-padded packed planes is exactly
  per-plane convolution, see `blocks.py:164-186, 189-256`), bilinear plane
  gathers summed over the 3 planes, then skip-concat MLP heads
  (`blocks.py:65-91`): geo -> 1 sdf, tex -> sigmoid * tex_channels
  (PBR: rgb/mr/normal heads, no sigmoid, `networks.py:321-326`).
"""

from __future__ import annotations

import os
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..core import nn
from ..core.gridsample import sample_triplane_features
from ..core.triplane import Triplane


class AEConfig(NamedTuple):
    data_type: str = "sdftex"          # sdf | sdftex | sdfpbr
    enc_net_type: str = "skip"         # base | skip | pbr
    fdim_geo: int = 4
    fdim_tex: int = 8
    fdim_up: int = 64
    hidden_dim: int = 256
    n_hidden_layers: int = 4
    posenc: int = 0                    # NeRF posenc degrees (0 = off,
    #                                    reference default; `blocks.py:46-50`)
    compute_dtype: Any = jnp.float32

    @property
    def use_tex(self) -> bool:
        return self.data_type != "sdf"

    @property
    def tex_channels(self) -> int:
        return 8 if self.data_type == "sdfpbr" else 3

    @property
    def feat_channels(self) -> int:
        return self.fdim_geo + (self.fdim_tex if self.use_tex else 0)


# ---------------------------------------------------------------------------
# MLP heads
# ---------------------------------------------------------------------------

def sinusoidal_encode(x: jax.Array, max_deg: int,
                      use_identity: bool = True) -> jax.Array:
    """NeRF positional encoding (`blocks.py:7-42`, min_deg=0): features
    [x, sin(2^i x), cos(2^i x)] giving dim * (1 + 2*max_deg) outputs."""
    if max_deg == 0:
        return x
    scales = jnp.asarray([2.0 ** i for i in range(max_deg)], x.dtype)
    xb = (x[..., None, :] * scales[:, None]).reshape(
        x.shape[:-1] + (max_deg * x.shape[-1],))
    latent = jnp.sin(jnp.concatenate([xb, xb + 0.5 * jnp.pi], axis=-1))
    if use_identity:
        latent = jnp.concatenate([x, latent], axis=-1)
    return latent


def posenc_dim(cin: int, max_deg: int) -> int:
    return cin if max_deg == 0 else cin * (1 + 2 * max_deg)


def _mlp_init(key, cin, cout, hidden, n_hidden) -> Dict:
    """Plain MLP (`blocks.py:45-62`): Linear+ReLU x (1+n_hidden), Linear."""
    keys = jax.random.split(key, n_hidden + 2)
    layers = [nn.torch_linear_init(keys[0], cin, hidden)]
    for i in range(n_hidden):
        layers.append(nn.torch_linear_init(keys[1 + i], hidden, hidden))
    layers.append(nn.torch_linear_init(keys[-1], hidden, cout))
    return {"layers": layers}


def _mlp_apply(p: Dict, x) -> jax.Array:
    h = x
    for lp in p["layers"][:-1]:
        h = jax.nn.relu(nn.linear(lp, h))
    return nn.linear(p["layers"][-1], h)


def _mlp_skip_init(key, cin, cout, hidden, n_hidden) -> Dict:
    """Two MLP halves with input skip-concat at midpoint (`blocks.py:65-91`)."""
    n_first = 1 + n_hidden // 2
    n_second = 1 + max(n_hidden // 2 - 1, 0) + 1
    keys = jax.random.split(key, n_first + n_second)
    ki = iter(keys)
    first = [nn.torch_linear_init(next(ki), cin, hidden)]
    for _ in range(n_hidden // 2):
        first.append(nn.torch_linear_init(next(ki), hidden, hidden))
    second = [nn.torch_linear_init(next(ki), cin + hidden, hidden)]
    for _ in range(n_hidden // 2 - 1):
        second.append(nn.torch_linear_init(next(ki), hidden, hidden))
    second.append(nn.torch_linear_init(next(ki), hidden, cout))
    return {"first": first, "second": second}


def _mlp_skip_apply(p: Dict, x) -> jax.Array:
    h = x
    for lp in p["first"]:
        h = jax.nn.relu(nn.linear(lp, h))
    h = jnp.concatenate([x, h], axis=-1)
    for lp in p["second"][:-1]:
        h = jax.nn.relu(nn.linear(lp, h))
    return nn.linear(p["second"][-1], h)


def _decode_mxu_dtype():
    """MXU operand dtype for the inference decode MLPs.

    bf16 operands run the v5e MXU at full rate (fp32 matmul is 4-8x
    slower); accumulation stays fp32.  The decode outputs are quantized
    to int8 (geo wire, 1/127 steps) or uint8 (texels, 1/255), both
    coarser than bf16's ~2^-8 relative error, so the wire values are the
    precision floor either way.  SIN3DM_DECODE_BF16=0 opts out (exact
    fp32 parity with training-time decode_points); on the CPU backend
    (tests, interpret-mode pallas) fp32 is the default so golden parity
    against the XLA reference stays bitwise-tight."""
    env = os.environ.get("SIN3DM_DECODE_BF16")
    if env is not None:
        return jnp.float32 if env in ("0", "false", "") else jnp.bfloat16
    return jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16


def _head_apply(cfg, head: Dict, x: jax.Array, fused: bool) -> jax.Array:
    """Apply a decoder MLP head; `fused=True` routes skip-heads through the
    Pallas VMEM-resident kernel (inference-only: the kernel defines no VJP)
    with bf16 MXU operands (see `_decode_mxu_dtype`).

    The 'base' net's plain MLP always takes the XLA path.
    """
    if cfg.enc_net_type == "base":
        return _mlp_apply(head, x)
    if fused:
        from ..ops.fused_mlp import skip_mlp_fused
        return skip_mlp_fused(head, x, mxu_dtype=_decode_mxu_dtype())
    return _mlp_skip_apply(head, x)


# ---------------------------------------------------------------------------
# TriplaneGroupResnetBlock (`blocks.py:189-256`) — per-plane form
# ---------------------------------------------------------------------------

def _group_block_init(key, cin, cout, ks) -> Dict:
    k1, k2, k3 = jax.random.split(key, 3)
    kshape = (ks, ks, cin, cout)
    p = {
        "in_conv": {pl: nn.torch_conv_init(k, kshape)
                    for pl, k in zip(("xy", "xz", "yz"),
                                     jax.random.split(k1, 3))},
        # affine InstanceNorm params, one per plane (`blocks.py:219-221`)
        "norm": {pl: {"g": jnp.ones((cout,), jnp.float32),
                      "b": jnp.zeros((cout,), jnp.float32)}
                 for pl in ("xy", "xz", "yz")},
        "out_conv": {pl: nn.zero_conv_init(kshape[:2] + (cout, cout))
                     for pl in ("xy", "xz", "yz")},
    }
    if cin != cout:
        p["shortcut"] = {pl: nn.torch_conv_init(k, (1, 1, cin, cout))
                         for pl, k in zip(("xy", "xz", "yz"),
                                          jax.random.split(k3, 3))}
    return p


def _group_block_apply(p: Dict, t: Triplane, input_act: bool,
                       input_norm: bool = False) -> Triplane:
    """NOTE on norm sharing: the reference reuses norm_xy/xz/yz both as the
    optional input norm and as the mid-norm (`blocks.py:238-250`).
    input_norm/input_act are config, not params (they always travel
    together in the reference's AE usage, `networks.py:246-250`)."""
    x = t
    if input_norm:
        x = Triplane(*[nn.instance_norm(pl, eps=1e-6,
                                        gamma=p["norm"][n]["g"],
                                        beta=p["norm"][n]["b"])
                       for pl, n in zip(t, ("xy", "xz", "yz"))])
    h = x
    if input_act:
        h = h.map(nn.silu)
    h = Triplane(nn.conv2d(p["in_conv"]["xy"], h.xy),
                 nn.conv2d(p["in_conv"]["xz"], h.xz),
                 nn.conv2d(p["in_conv"]["yz"], h.yz))
    h = Triplane(*[nn.instance_norm(pl, eps=1e-6,
                                    gamma=p["norm"][n]["g"],
                                    beta=p["norm"][n]["b"])
                   for pl, n in zip(h, ("xy", "xz", "yz"))])
    h = h.map(nn.silu)
    h = Triplane(nn.conv2d(p["out_conv"]["xy"], h.xy),
                 nn.conv2d(p["out_conv"]["xz"], h.xz),
                 nn.conv2d(p["out_conv"]["yz"], h.yz))
    if "shortcut" in p:
        sc = Triplane(nn.conv2d(p["shortcut"]["xy"], x.xy),
                      nn.conv2d(p["shortcut"]["xz"], x.xz),
                      nn.conv2d(p["shortcut"]["yz"], x.yz))
    else:
        sc = x
    return h + sc


# ---------------------------------------------------------------------------
# AutoEncoder init / apply
# ---------------------------------------------------------------------------

def init_autoencoder(key: jax.Array, cfg: AEConfig) -> Dict:
    keys = iter(jax.random.split(key, 16))
    p: Dict = {
        "geo_encoder": nn.torch_conv_init(
            next(keys), (4, 4, 4, 1, cfg.fdim_geo)),
        "geo_convs": _group_block_init(next(keys), cfg.fdim_geo,
                                       cfg.fdim_up, 5),
    }
    mlp_init = _mlp_init if cfg.enc_net_type == "base" else _mlp_skip_init
    p["geo_decoder"] = mlp_init(next(keys), cfg.fdim_up, 1,
                                cfg.hidden_dim, cfg.n_hidden_layers)
    if cfg.use_tex:
        p["tex_encoder"] = nn.torch_conv_init(
            next(keys), (4, 4, 4, cfg.tex_channels + 1, cfg.fdim_tex))
        # posenc applies to the texture heads only (`networks.py:147,251-253`)
        tex_in = posenc_dim(cfg.fdim_up, cfg.posenc)
        if cfg.enc_net_type == "pbr":
            p["tex_convs"] = [
                _group_block_init(next(keys), cfg.fdim_tex, cfg.fdim_up, 3),
                _group_block_init(next(keys), cfg.fdim_up, cfg.fdim_up, 3),
            ]
            p["rgb_decoder"] = mlp_init(next(keys), tex_in, 3,
                                        cfg.hidden_dim, cfg.n_hidden_layers)
            p["mr_decoder"] = mlp_init(next(keys), tex_in, 2,
                                       cfg.hidden_dim, cfg.n_hidden_layers)
            p["normal_decoder"] = mlp_init(next(keys), tex_in, 3,
                                           cfg.hidden_dim, cfg.n_hidden_layers)
        else:
            p["tex_convs"] = [
                _group_block_init(next(keys), cfg.fdim_tex, cfg.fdim_up, 5)]
            p["tex_decoder"] = mlp_init(next(keys), tex_in,
                                        cfg.tex_channels,
                                        cfg.hidden_dim, cfg.n_hidden_layers)
    return p


def geo_param_labels(params: Dict) -> Dict:
    """Label each leaf 'geo' or 'tex' for the split-lr optimizer
    (reference geo_parameters/tex_parameters, `networks.py:151-155`)."""
    geo_keys = {"geo_encoder", "geo_convs", "geo_decoder"}
    return {k: jax.tree_util.tree_map(lambda _: "geo" if k in geo_keys
                                      else "tex", v)
            for k, v in params.items()}


def encode(params: Dict, cfg: AEConfig, vol: jax.Array) -> Triplane:
    """vol: [B, X, Y, Z, 1+tex_channels] (SDF first) -> Triplane of
    [B, ., ., feat_channels] squashed to (-0.5, 0.5)-ish by tanh(x/2)."""
    vol = vol.astype(cfg.compute_dtype)
    geo_feat = nn.conv3d(params["geo_encoder"], vol[..., :1])
    if cfg.use_tex:
        tex_feat = nn.conv3d(params["tex_encoder"], vol)
        feat = jnp.concatenate([geo_feat, tex_feat], axis=-1)
    else:
        feat = geo_feat
    xy = jnp.mean(feat, axis=3)   # avg over z
    xz = jnp.mean(feat, axis=2)   # avg over y
    yz = jnp.mean(feat, axis=1)   # avg over x

    def squash(a):
        return jnp.tanh(nn.instance_norm(a, eps=1e-5) * 0.5)

    return Triplane(squash(xy), squash(xz), squash(yz)).astype(jnp.float32)


def normalize_points(pts: jax.Array, aabb: jax.Array) -> jax.Array:
    """Map points from aabb to [-1, 1]^3 (`networks.py:196`)."""
    lo, hi = aabb[:3], aabb[3:]
    return 2.0 * (pts - lo) / (hi - lo) - 1.0


def process_planes(params: Dict, cfg: AEConfig,
                   feat: Triplane) -> Tuple[Triplane, Triplane]:
    """Run the per-branch conv blocks once per plane set.  Separated from
    the point decode so dense grid decoding can amortize it."""
    geo_planes = feat.map(lambda a: a[..., :cfg.fdim_geo])
    geo_planes = _group_block_apply(params["geo_convs"], geo_planes,
                                    input_act=False)
    tex_planes = None
    if cfg.use_tex:
        tex_planes = feat.map(lambda a: a[..., cfg.fdim_geo:])
        blocks = params["tex_convs"]
        tex_planes = _group_block_apply(blocks[0], tex_planes,
                                        input_act=False)
        for bp in blocks[1:]:
            tex_planes = _group_block_apply(bp, tex_planes, input_act=True,
                                            input_norm=True)
    return geo_planes, tex_planes


def decode_points(params: Dict, cfg: AEConfig, geo_planes: Triplane,
                  tex_planes, pts: jax.Array, aabb: jax.Array,
                  fused_heads: bool = False) -> jax.Array:
    """Decode [N, 3] world points to [N, 1+tex_channels] (sdf first).

    geo_planes/tex_planes are the outputs of :func:`process_planes` with a
    leading batch dim of 1.  `fused_heads` (static under jit) runs the MLP
    heads as the Pallas VMEM-resident kernel — inference decode only.
    """
    x = normalize_points(pts, aabb)
    gp = geo_planes.map(lambda a: a[0])
    h_geo = sample_triplane_features(gp, x)
    mlp = lambda hd, h: _head_apply(cfg, hd, h, fused_heads)
    sdf = mlp(params["geo_decoder"], h_geo)
    if not cfg.use_tex:
        return sdf
    tp = tex_planes.map(lambda a: a[0])
    h_tex = sample_triplane_features(tp, x)
    if cfg.posenc > 0:
        h_tex = sinusoidal_encode(h_tex, cfg.posenc)
    if cfg.enc_net_type == "pbr":
        rgb = mlp(params["rgb_decoder"], h_tex)
        mr = mlp(params["mr_decoder"], h_tex)
        nrm = mlp(params["normal_decoder"], h_tex)
        tex = jnp.concatenate([rgb, mr, nrm], axis=-1)
    else:
        tex = jax.nn.sigmoid(mlp(params["tex_decoder"], h_tex))
    return jnp.concatenate([sdf, tex], axis=-1)


def forward(params: Dict, cfg: AEConfig, vol: jax.Array, pts: jax.Array,
            aabb: jax.Array) -> jax.Array:
    """Full AE forward: encode volume then decode points
    (`networks.py:222-224`)."""
    feat = encode(params, cfg, vol)
    geo_planes, tex_planes = process_planes(params, cfg, feat)
    return decode_points(params, cfg, geo_planes, tex_planes, pts, aabb)


def decode_grid_dense(params: Dict, cfg: AEConfig, geo_planes: Triplane,
                      tex_planes, grid_res: Tuple[int, int, int],
                      slab: int = 8, geo_only: bool = False,
                      fused_heads: bool = False,
                      out_dtype=None, quant_scale=None) -> jax.Array:
    """Dense AABB-grid decode WITHOUT gathers.

    Voxel centers of the AABB grid normalize to exactly the half-pixel
    sample positions of `grid_sample(align_corners=False)`, so sampling a
    feature plane over the whole regular grid IS a bilinear resize of that
    plane.  The decode becomes: resize the three processed planes to the
    grid's per-axis resolutions, broadcast-sum them, and run the MLP heads
    over x-slabs via `lax.map` — pure resize + MXU matmuls, no 16.7M-point
    gather like the chunked reference path (`model.py:335-349`).

    Numerically identical to `decode_points` on grid points (same bilinear
    half-pixel rule; grid centers never leave [-1, 1], so border padding
    never triggers).

    Returns [Nx, Ny, Nz, 1 + tex_channels].
    """
    from ..core.nn import resize_bilinear

    Nx, Ny, Nz = grid_res
    mlp = lambda hd, h: _head_apply(cfg, hd, h, fused_heads)

    def plane_grids(planes: Triplane):
        xy = resize_bilinear(planes.xy[0], (Nx, Ny))   # [Nx, Ny, C]
        xz = resize_bilinear(planes.xz[0], (Nx, Nz))   # [Nx, Nz, C]
        yz = resize_bilinear(planes.yz[0], (Ny, Nz))   # [Ny, Nz, C]
        return xy, xz, yz

    use_tex = cfg.use_tex and not geo_only
    g_xy, g_xz, g_yz = plane_grids(geo_planes)
    if use_tex:
        t_xy, t_xz, t_yz = plane_grids(tex_planes)

    # pad Nx to a multiple of `slab` so lax.map sees equal-size slabs
    pad = (-Nx) % slab
    if pad:
        g_xy = jnp.pad(g_xy, ((0, pad), (0, 0), (0, 0)))
        g_xz = jnp.pad(g_xz, ((0, pad), (0, 0), (0, 0)))
        if use_tex:
            t_xy = jnp.pad(t_xy, ((0, pad), (0, 0), (0, 0)))
            t_xz = jnp.pad(t_xz, ((0, pad), (0, 0), (0, 0)))
    n_slabs = (Nx + pad) // slab

    def do_slab(i):
        sl = (jnp.arange(slab) + i * slab)
        h_geo = (g_xy[sl][:, :, None, :] + g_xz[sl][:, None, :, :]
                 + g_yz[None, :, :, :])                  # [s, Ny, Nz, C]
        sdf = mlp(params["geo_decoder"],
                  h_geo.reshape(-1, h_geo.shape[-1]))
        if not use_tex:
            return sdf.reshape(slab, Ny, Nz, -1)
        h_tex = (t_xy[sl][:, :, None, :] + t_xz[sl][:, None, :, :]
                 + t_yz[None, :, :, :])
        ht = h_tex.reshape(-1, h_tex.shape[-1])
        if cfg.posenc > 0:
            ht = sinusoidal_encode(ht, cfg.posenc)
        if cfg.enc_net_type == "pbr":
            tex = jnp.concatenate([mlp(params["rgb_decoder"], ht),
                                   mlp(params["mr_decoder"], ht),
                                   mlp(params["normal_decoder"], ht)],
                                  axis=-1)
        else:
            tex = jax.nn.sigmoid(mlp(params["tex_decoder"], ht))
        out = jnp.concatenate([sdf, tex], axis=-1)
        return out.reshape(slab, Ny, Nz, -1)

    out = jax.lax.map(do_slab, jnp.arange(n_slabs))
    out = out.reshape((Nx + pad), Ny, Nz, -1)
    if quant_scale is not None:
        # int8 wire format: the TSDF is clamped to +-quant_scale
        # (threshold), so /scale*127 uses the full int8 range.  FLOOR
        # quantization so the SIGN of every voxel survives exactly
        # (negatives floor to <= -1, non-negatives to >= 0): voxel.npz
        # occupancy (sdf < 0) is bit-identical to the fp32 grid.  The
        # host dequantizes to bucket centers; marching cubes vertex
        # positions move <= ~0.012 voxels at the default reso — far
        # below fp16's win of halving the transfer again (the
        # dense-grid path is device->host transfer-bound)
        out = jnp.floor(
            jnp.clip(out / quant_scale, -1.0, 1.0) * 127.0).astype(jnp.int8)
    elif out_dtype is not None:
        # cast INSIDE the program: the dense-grid result is device->host
        # transfer-bound, and fp16 halves the wire size (SDF is clamped to
        # +-threshold ~= 0.023, far inside fp16's precision there)
        out = out.astype(out_dtype)
    return out[:Nx]


def decode_texels(params: Dict, cfg: AEConfig, tex_planes: Triplane,
                  pts: jax.Array, aabb: jax.Array,
                  fused_heads: bool = False) -> jax.Array:
    """Texture-only point decode -> uint8 colors [N, tex_channels].

    Texture baking (`model.py:417-419`) discards the SDF channel and
    clamps colors to [0, 1]*255 anyway; skipping the geo head and
    quantizing ON DEVICE shrinks the device->host transfer 16x — which is
    what the decode path is actually bound by, not FLOPs.
    """
    x = normalize_points(pts, aabb)
    return _decode_texels_normalized(params, cfg, tex_planes, x,
                                     fused_heads)


def decode_texels_q16(params: Dict, cfg: AEConfig, tex_planes: Triplane,
                      q: jax.Array, fused_heads: bool = False) -> jax.Array:
    """`decode_texels` over uint16 AABB-relative coordinates
    (q = round((p - lo) / (hi - lo) * 65535)) — halves the host->device
    texel wire vs fp32 points, the remaining transfer bound of texture
    baking on high-RTT links.  Quantization error is 1/65535 of the AABB
    (~1/256 of a voxel at grid reso 256), far below the texture MLP's
    spatial bandwidth; `SIN3DM_TEXEL_WIRE=f32` restores the exact path."""
    x = q.astype(jnp.float32) * (2.0 / 65535.0) - 1.0
    return _decode_texels_normalized(params, cfg, tex_planes, x,
                                     fused_heads)


def decode_texels_runs(params: Dict, cfg: AEConfig, tex_planes: Triplane,
                       offsets: jax.Array, starts: jax.Array,
                       steps: jax.Array, i0: jax.Array, aabb: jax.Array,
                       batch: int, fused_heads: bool = False,
                       quantized: bool = False) -> jax.Array:
    """`decode_texels` over the RUN-LENGTH texel wire: positions are
    affine along each rasterized UV row (`geometry.cpp
    geo_rasterize_uv_runs`), so the host ships (start, step, length)
    spans (~28 B/run vs 6 B/texel) and the device expands them here —
    cheap MXU-adjacent arithmetic replacing host->device transfer, AND
    fp32-exact positions (no u16 quantization).

    offsets: [Rp+1] int32 cumulative texel counts (monotone; padded
    entries repeat the total), starts/steps: [Rp, 3] (zero-padded),
    i0: scalar int32 — this chunk covers global texel indices
    [i0, i0 + batch).  Indices beyond the real texel count decode
    garbage rows that the host trims (same contract as the padded q16
    chunks).

    `quantized` (the compact wire, 16 B/run vs 28): starts are uint16
    AABB-relative (the u16 point wire's accepted snap, 1/65535 of the
    AABB — but only at run STARTS) and steps are float16 in NORMALIZED
    units (within-run drift <= run_span * 2^-11, ~0.1 voxel only for
    runs spanning the whole plane; typical runs are 10-20 texels).
    """
    i = i0 + jnp.arange(batch, dtype=jnp.int32)
    j = jnp.searchsorted(offsets, i, side="right") - 1
    j = jnp.clip(j, 0, starts.shape[0] - 1)
    o = (i - offsets[j]).astype(jnp.float32)
    if quantized:
        x = (starts[j].astype(jnp.float32) * (2.0 / 65535.0) - 1.0
             + steps[j].astype(jnp.float32) * o[:, None])
    else:
        pos = starts[j] + steps[j] * o[:, None]
        x = normalize_points(pos, aabb)
    return _decode_texels_normalized(params, cfg, tex_planes, x,
                                     fused_heads)


def _decode_texels_normalized(params: Dict, cfg: AEConfig,
                              tex_planes: Triplane, x: jax.Array,
                              fused_heads: bool) -> jax.Array:
    tp = tex_planes.map(lambda a: a[0])
    h_tex = sample_triplane_features(tp, x)
    if cfg.posenc > 0:
        h_tex = sinusoidal_encode(h_tex, cfg.posenc)
    mlp = lambda hd, h: _head_apply(cfg, hd, h, fused_heads)
    if cfg.enc_net_type == "pbr":
        tex = jnp.concatenate([mlp(params["rgb_decoder"], h_tex),
                               mlp(params["mr_decoder"], h_tex),
                               mlp(params["normal_decoder"], h_tex)],
                              axis=-1)
    else:
        tex = jax.nn.sigmoid(mlp(params["tex_decoder"], h_tex))
    # truncating cast matches the host path `(clip(tex,0,1)*255).astype(u8)`
    tex = jnp.clip(tex, 0.0, 1.0) * 255.0
    return tex.astype(jnp.uint8)
