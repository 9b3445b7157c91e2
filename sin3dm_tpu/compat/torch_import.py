"""Weight transplant: reference torch state dicts <-> our param pytrees.

The reference stores torch `nn.Module.state_dict()` tensors in OIHW /
OIDHW / [out,in] layouts under module-path keys; this framework stores
channels-last pytrees (conv HWIO / DHWIO, linear [in,out]).  The mapping
below is a pure re-layout — no numerics change — so one set of weights
produces the same function in both frameworks (verified to <1e-4 by
`tests/test_torch_import.py` against the in-container reference modules).

Formats handled (file:line cite the reference writers):

* diffusion EMA `ema_{rate}_{step:06d}.pt` — a bare model state dict
  (`src/diffusion/train_util.py:258-281`), for `TriplaneUNetModelSmall`
  (`src/diffusion/unet_triplane.py:315-510`) and the `...SmallRaw`
  variant (`:513-702`),
* AE bundle `ckpt_{name}.pth` — dict with `net` state dict + material /
  aabb / featmap_size metadata (`src/encoding/model.py:141-176`), for
  `AutoEncoderGroupV3` / `AutoEncoderGroupSkip` / `AutoEncoderGroupPBR`
  (`src/encoding/networks.py:21-334`).

torch is only needed to *read* `.pt`/`.pth` pickles (`load_torch_file`);
the mapping itself is numpy-only, and the reverse direction
(`*_state_dict_from_params`) emits plain numpy arrays that
`torch.load`-compatible writers (or the reference's `load_state_dict`
after `torch.from_numpy`) consume directly.
"""

from __future__ import annotations

import os
import zipfile
from typing import Any, Dict, List, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def _np(t) -> np.ndarray:
    """torch tensor / array-like -> float32 numpy (no torch import)."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, np.float32)


def _conv2d_in(w) -> np.ndarray:
    """torch OIHW -> HWIO."""
    return _np(w).transpose(2, 3, 1, 0)


def _conv2d_out(w) -> np.ndarray:
    """HWIO -> torch OIHW."""
    return np.asarray(w, np.float32).transpose(3, 2, 0, 1)


def _conv3d_in(w) -> np.ndarray:
    """torch OIDHW -> DHWIO."""
    return _np(w).transpose(2, 3, 4, 1, 0)


def _conv3d_out(w) -> np.ndarray:
    return np.asarray(w, np.float32).transpose(4, 3, 0, 1, 2)


def _linear_in(w) -> np.ndarray:
    """torch [out, in] -> [in, out]."""
    return _np(w).T


def _linear_out(w) -> np.ndarray:
    return np.asarray(w, np.float32).T


_PLANES = ("xy", "xz", "yz")


def _take(sd: Dict, key: str):
    try:
        return sd[key]
    except KeyError:
        raise KeyError(f"reference state dict is missing '{key}' — wrong "
                       "model config for this checkpoint?") from None


# ---------------------------------------------------------------------------
# UNet (TriplaneUNetModelSmall / ...Raw)
# ---------------------------------------------------------------------------

def _unet_resblock_prefixes(cfg) -> Tuple[List[Tuple[str, Tuple]], ...]:
    """(torch_prefix, (pytree section, level, block)) for every resblock.

    Mirrors the reference constructor's module indices
    (`unet_triplane.py:377-434`): input block `level` holds a parameter-
    free Downsample at index 0 when level != 0, so its resblocks start at
    index 1; output block `j` holds resblocks at 0..nrb-1 (the trailing
    Upsample has no params).
    """
    nrb = cfg.num_res_blocks
    down, up = [], []
    for level in range(len(cfg.channel_mult)):
        base = 0 if level == 0 else 1
        for i in range(nrb):
            down.append((f"input_blocks.{level}.{base + i}",
                         ("down", level, i)))
    for j in range(len(cfg.channel_mult)):
        for i in range(nrb):
            up.append((f"output_blocks.{j}.{i}", ("up", j, i)))
    return down, up


def _resblock_from_sd(sd: Dict, pre: str) -> Dict:
    p: Dict[str, Any] = {
        "in_norm": {pl: {"g": _np(_take(sd, f"{pre}.in_layers.0.norm_{pl}.weight")),
                         "b": _np(_take(sd, f"{pre}.in_layers.0.norm_{pl}.bias"))}
                    for pl in _PLANES},
        "in_conv": {pl: {"w": _conv2d_in(_take(sd, f"{pre}.in_layers.2.conv_{pl}.weight")),
                         "b": _np(_take(sd, f"{pre}.in_layers.2.conv_{pl}.bias"))}
                    for pl in _PLANES},
        "emb": {"w": _linear_in(_take(sd, f"{pre}.emb_layers.1.weight")),
                "b": _np(_take(sd, f"{pre}.emb_layers.1.bias"))},
        "out_norm": {pl: {"g": _np(_take(sd, f"{pre}.out_layers.0.norm_{pl}.weight")),
                          "b": _np(_take(sd, f"{pre}.out_layers.0.norm_{pl}.bias"))}
                     for pl in _PLANES},
        "out_conv": {pl: {"w": _conv2d_in(_take(sd, f"{pre}.out_layers.2.conv_{pl}.weight")),
                          "b": _np(_take(sd, f"{pre}.out_layers.2.conv_{pl}.bias"))}
                     for pl in _PLANES},
    }
    if f"{pre}.skip_connection.conv_xy.weight" in sd:
        p["skip"] = {pl: {"w": _conv2d_in(sd[f"{pre}.skip_connection.conv_{pl}.weight"]),
                          "b": _np(sd[f"{pre}.skip_connection.conv_{pl}.bias"])}
                     for pl in _PLANES}
    return p


def _resblock_to_sd(p: Dict, pre: str, out: Dict) -> None:
    for pl in _PLANES:
        out[f"{pre}.in_layers.0.norm_{pl}.weight"] = np.asarray(p["in_norm"][pl]["g"])
        out[f"{pre}.in_layers.0.norm_{pl}.bias"] = np.asarray(p["in_norm"][pl]["b"])
        out[f"{pre}.in_layers.2.conv_{pl}.weight"] = _conv2d_out(p["in_conv"][pl]["w"])
        out[f"{pre}.in_layers.2.conv_{pl}.bias"] = np.asarray(p["in_conv"][pl]["b"])
        out[f"{pre}.out_layers.0.norm_{pl}.weight"] = np.asarray(p["out_norm"][pl]["g"])
        out[f"{pre}.out_layers.0.norm_{pl}.bias"] = np.asarray(p["out_norm"][pl]["b"])
        out[f"{pre}.out_layers.2.conv_{pl}.weight"] = _conv2d_out(p["out_conv"][pl]["w"])
        out[f"{pre}.out_layers.2.conv_{pl}.bias"] = np.asarray(p["out_conv"][pl]["b"])
        if "skip" in p:
            out[f"{pre}.skip_connection.conv_{pl}.weight"] = _conv2d_out(p["skip"][pl]["w"])
            out[f"{pre}.skip_connection.conv_{pl}.bias"] = np.asarray(p["skip"][pl]["b"])
    out[f"{pre}.emb_layers.1.weight"] = _linear_out(p["emb"]["w"])
    out[f"{pre}.emb_layers.1.bias"] = np.asarray(p["emb"]["b"])


def unet_params_from_state_dict(sd: Dict, cfg) -> Dict:
    """Reference `TriplaneUNetModelSmall[Raw]` state dict -> our
    `init_unet`-shaped pytree (`models/unet.py`).  `cfg` is a UNetConfig
    whose in/model/out channels, channel_mult and num_res_blocks describe
    the checkpoint (the default config matches the published models)."""
    p: Dict[str, Any] = {
        "time_embed": {
            "l1": {"w": _linear_in(_take(sd, "time_embed.0.weight")),
                   "b": _np(_take(sd, "time_embed.0.bias"))},
            "l2": {"w": _linear_in(_take(sd, "time_embed.2.weight")),
                   "b": _np(_take(sd, "time_embed.2.bias"))},
        },
        "in_conv": {pl: {"w": _conv2d_in(_take(sd, f"in_conv.0.conv_{pl}.weight")),
                         "b": _np(_take(sd, f"in_conv.0.conv_{pl}.bias"))}
                    for pl in _PLANES},
        "out": {
            "norm": {pl: {"g": _np(_take(sd, f"out.0.norm_{pl}.weight")),
                          "b": _np(_take(sd, f"out.0.norm_{pl}.bias"))}
                     for pl in _PLANES},
            "conv": {pl: {"w": _conv2d_in(_take(sd, f"out.2.conv_{pl}.weight")),
                          "b": _np(_take(sd, f"out.2.conv_{pl}.bias"))}
                     for pl in _PLANES},
        },
    }
    down_pre, up_pre = _unet_resblock_prefixes(cfg)
    down: List[List[Dict]] = [[] for _ in cfg.channel_mult]
    for pre, (_, level, _i) in down_pre:
        down[level].append(_resblock_from_sd(sd, pre))
    up: List[List[Dict]] = [[] for _ in cfg.channel_mult]
    for pre, (_, j, _i) in up_pre:
        up[j].append(_resblock_from_sd(sd, pre))
    p["down"] = down
    p["up"] = up
    return p


def unet_state_dict_from_params(params: Dict, cfg) -> Dict[str, np.ndarray]:
    """Our UNet pytree -> a reference-layout state dict (numpy values);
    `torch.from_numpy` each value to feed `model.load_state_dict`."""
    out: Dict[str, np.ndarray] = {
        "time_embed.0.weight": _linear_out(params["time_embed"]["l1"]["w"]),
        "time_embed.0.bias": np.asarray(params["time_embed"]["l1"]["b"]),
        "time_embed.2.weight": _linear_out(params["time_embed"]["l2"]["w"]),
        "time_embed.2.bias": np.asarray(params["time_embed"]["l2"]["b"]),
    }
    for pl in _PLANES:
        out[f"in_conv.0.conv_{pl}.weight"] = _conv2d_out(params["in_conv"][pl]["w"])
        out[f"in_conv.0.conv_{pl}.bias"] = np.asarray(params["in_conv"][pl]["b"])
        out[f"out.0.norm_{pl}.weight"] = np.asarray(params["out"]["norm"][pl]["g"])
        out[f"out.0.norm_{pl}.bias"] = np.asarray(params["out"]["norm"][pl]["b"])
        out[f"out.2.conv_{pl}.weight"] = _conv2d_out(params["out"]["conv"][pl]["w"])
        out[f"out.2.conv_{pl}.bias"] = np.asarray(params["out"]["conv"][pl]["b"])
    down_pre, up_pre = _unet_resblock_prefixes(cfg)
    for pre, (_, level, i) in down_pre:
        _resblock_to_sd(params["down"][level][i], pre, out)
    for pre, (_, j, i) in up_pre:
        _resblock_to_sd(params["up"][j][i], pre, out)
    return out


# ---------------------------------------------------------------------------
# AutoEncoder (AutoEncoderGroupV3 / Skip / PBR)
# ---------------------------------------------------------------------------

def _mlp_linear_indices(sd: Dict, pre: str) -> List[int]:
    """Sorted Sequential indices of the Linear layers under `pre`
    (ReLUs occupy the odd slots, so weights sit at 0, 2, 4, ...)."""
    idx = []
    for k in sd:
        if k.startswith(pre + ".") and k.endswith(".weight"):
            mid = k[len(pre) + 1:-len(".weight")]
            if mid.isdigit():
                idx.append(int(mid))
    if not idx:
        raise KeyError(f"no Linear layers found under '{pre}'")
    return sorted(idx)


def _mlp_from_sd(sd: Dict, pre: str, skip: bool) -> Dict:
    """DecoderMLP (`blocks.py:45-62`) / DecoderMLPSkipConcat (`:65-91`)."""
    def seq(sub):
        return [{"w": _linear_in(sd[f"{pre}.{sub}.{i}.weight"]),
                 "b": _np(sd[f"{pre}.{sub}.{i}.bias"])}
                for i in _mlp_linear_indices(sd, f"{pre}.{sub}")]
    if skip:
        return {"first": seq("first_layers"), "second": seq("second_layers")}
    return {"layers": seq("layers")}


def _mlp_to_sd(p: Dict, pre: str, out: Dict) -> None:
    def emit(sub, layers):
        # Linear at Sequential slot 2i (ReLU between), except the final
        # linear of second_layers/layers which follows the same stride
        for i, lp in enumerate(layers):
            out[f"{pre}.{sub}.{2 * i}.weight"] = _linear_out(lp["w"])
            out[f"{pre}.{sub}.{2 * i}.bias"] = np.asarray(lp["b"])
    if "layers" in p:
        emit("layers", p["layers"])
    else:
        emit("first_layers", p["first"])
        emit("second_layers", p["second"])


def _group_block_from_sd(sd: Dict, pre: str, input_act: bool) -> Dict:
    """TriplaneGroupResnetBlock (`blocks.py:189-256`): the grouped
    (groups=3) convs split into our per-plane convs along the output-
    channel groups, ordered (xy, xz, yz) by `compose_triplane_channelwise`
    (`blocks.py:164-177`)."""
    in_idx = 1 if input_act else 0  # Sequential([SiLU,] Conv2d)

    def grouped(key_w, key_b):
        w = _np(_take(sd, key_w))      # [3*cout, cin_g, k, k]
        b = _np(_take(sd, key_b))      # [3*cout]
        cout = w.shape[0] // 3
        return {pl: {"w": _conv2d_in(w[g * cout:(g + 1) * cout]),
                     "b": b[g * cout:(g + 1) * cout]}
                for g, pl in enumerate(_PLANES)}

    p = {
        "in_conv": grouped(f"{pre}.in_layers.{in_idx}.weight",
                           f"{pre}.in_layers.{in_idx}.bias"),
        "norm": {pl: {"g": _np(_take(sd, f"{pre}.norm_{pl}.weight")),
                      "b": _np(_take(sd, f"{pre}.norm_{pl}.bias"))}
                 for pl in _PLANES},
        "out_conv": grouped(f"{pre}.out_layers.1.weight",
                            f"{pre}.out_layers.1.bias"),
    }
    if f"{pre}.shortcut.weight" in sd:
        p["shortcut"] = grouped(f"{pre}.shortcut.weight",
                                f"{pre}.shortcut.bias")
    return p


def _group_block_to_sd(p: Dict, pre: str, input_act: bool, out: Dict) -> None:
    in_idx = 1 if input_act else 0

    def grouped(plane_dict):
        w = np.concatenate([_conv2d_out(plane_dict[pl]["w"])
                            for pl in _PLANES], axis=0)
        b = np.concatenate([np.asarray(plane_dict[pl]["b"])
                            for pl in _PLANES], axis=0)
        return w, b

    w, b = grouped(p["in_conv"])
    out[f"{pre}.in_layers.{in_idx}.weight"] = w
    out[f"{pre}.in_layers.{in_idx}.bias"] = b
    for pl in _PLANES:
        out[f"{pre}.norm_{pl}.weight"] = np.asarray(p["norm"][pl]["g"])
        out[f"{pre}.norm_{pl}.bias"] = np.asarray(p["norm"][pl]["b"])
    w, b = grouped(p["out_conv"])
    out[f"{pre}.out_layers.1.weight"] = w
    out[f"{pre}.out_layers.1.bias"] = b
    if "shortcut" in p:
        w, b = grouped(p["shortcut"])
        out[f"{pre}.shortcut.weight"] = w
        out[f"{pre}.shortcut.bias"] = b


def ae_params_from_state_dict(sd: Dict, cfg) -> Tuple[Dict, np.ndarray]:
    """Reference AutoEncoderGroup{V3,Skip,PBR} state dict -> our
    `init_autoencoder`-shaped pytree + the aabb buffer.

    `cfg` is an AEConfig; `cfg.enc_net_type` selects the head/blocks
    layout exactly as the reference's `get_networks` (`networks.py:7-18`).
    """
    skip_mlp = cfg.enc_net_type != "base"
    p: Dict[str, Any] = {
        "geo_encoder": {"w": _conv3d_in(_take(sd, "geo_encoder.weight")),
                        "b": _np(_take(sd, "geo_encoder.bias"))},
        "geo_convs": _group_block_from_sd(sd, "geo_convs", input_act=False),
        "geo_decoder": _mlp_from_sd(sd, "geo_decoder", skip_mlp),
    }
    if cfg.use_tex:
        p["tex_encoder"] = {"w": _conv3d_in(_take(sd, "tex_encoder.weight")),
                            "b": _np(_take(sd, "tex_encoder.bias"))}
        if cfg.enc_net_type == "pbr":
            p["tex_convs"] = [
                _group_block_from_sd(sd, "tex_convs.0", input_act=False),
                _group_block_from_sd(sd, "tex_convs.1", input_act=True),
            ]
            for head in ("rgb", "mr", "normal"):
                p[f"{head}_decoder"] = _mlp_from_sd(sd, f"{head}_decoder",
                                                    skip_mlp)
        else:
            p["tex_convs"] = [
                _group_block_from_sd(sd, "tex_convs", input_act=False)]
            p["tex_decoder"] = _mlp_from_sd(sd, "tex_decoder", skip_mlp)
    aabb = _np(sd["aabb"]) if "aabb" in sd else np.array(
        [-1, -1, -1, 1, 1, 1], np.float32)
    return p, aabb


def ae_state_dict_from_params(params: Dict, cfg,
                              aabb=None) -> Dict[str, np.ndarray]:
    """Our AE pytree -> reference-layout state dict (numpy values)."""
    out: Dict[str, np.ndarray] = {
        "geo_encoder.weight": _conv3d_out(params["geo_encoder"]["w"]),
        "geo_encoder.bias": np.asarray(params["geo_encoder"]["b"]),
        "aabb": np.asarray(aabb if aabb is not None
                           else [-1, -1, -1, 1, 1, 1], np.float32),
    }
    _group_block_to_sd(params["geo_convs"], "geo_convs", False, out)
    _mlp_to_sd(params["geo_decoder"], "geo_decoder", out)
    if cfg.use_tex:
        out["tex_encoder.weight"] = _conv3d_out(params["tex_encoder"]["w"])
        out["tex_encoder.bias"] = np.asarray(params["tex_encoder"]["b"])
        if cfg.enc_net_type == "pbr":
            _group_block_to_sd(params["tex_convs"][0], "tex_convs.0",
                               False, out)
            _group_block_to_sd(params["tex_convs"][1], "tex_convs.1",
                               True, out)
            for head in ("rgb", "mr", "normal"):
                _mlp_to_sd(params[f"{head}_decoder"], f"{head}_decoder", out)
        else:
            _group_block_to_sd(params["tex_convs"][0], "tex_convs",
                               False, out)
            _mlp_to_sd(params["tex_decoder"], "tex_decoder", out)
    return out


# ---------------------------------------------------------------------------
# file-level importers
# ---------------------------------------------------------------------------

def is_torch_file(path: str) -> bool:
    """True when `path` is a torch.save artifact (zip with data.pkl, or a
    legacy pickle stream) rather than our npz container."""
    try:
        if zipfile.is_zipfile(path):
            with zipfile.ZipFile(path) as z:
                return any(n.endswith("data.pkl") for n in z.namelist())
        with open(path, "rb") as f:
            return f.read(2)[:1] == b"\x80"  # pickle protocol marker
    except OSError:
        return False


def load_torch_file(path: str) -> Dict:
    """torch.load to CPU (torch is in-container; used only for reading
    the reference's pickle formats)."""
    import torch
    return torch.load(path, map_location="cpu")


def import_diffusion_ema(src_pt: str, dst_pt: str, ucfg) -> Dict:
    """Convert a reference `ema_{rate}_{step}.pt` to our npz container at
    `dst_pt` (same filename contract).  Returns the converted pytree."""
    from ..core import checkpoint as ckpt
    sd = load_torch_file(src_pt)
    params = unet_params_from_state_dict(sd, ucfg)
    ckpt.save_pytree(dst_pt, params,
                     meta={"imported_from": os.path.abspath(src_pt)})
    return params


def ae_bundle_to_tree(bundle: Dict, acfg,
                      threshold: float = None) -> Tuple[Dict, Dict]:
    """Reference `ckpt_{name}.pth` bundle (already unpickled) -> our
    (params, meta).

    The bundle carries net + optimizer + scheduler + material metadata
    (`model.py:141-157`); optimizer/scheduler state is torch-specific
    (AdamW moment tensors keyed by param ids) and is NOT transplanted —
    an imported checkpoint is for inference / fresh fine-tune, like the
    reference's own `load_ckpt` without a trainer.

    `threshold` (the TSDF clamp, dataset-npz `threshold` key) is not
    stored in the reference bundle; when not provided, the default
    2/256*3 (the sampler formula at the default grid reso,
    `data/mesh_sampler.py:156-171`) is recorded — it only affects the
    int8 wire quant scale of dense decodes, not the surface.
    """
    sd = bundle["net"] if "net" in bundle else bundle
    params, aabb = ae_params_from_state_dict(sd, acfg)
    meta = {
        "aabb": [float(v) for v in np.asarray(
            bundle.get("aabb", aabb)).reshape(-1)],
        "featmap_size": [int(v) for v in bundle.get("featmap_size", ())],
        "Ka": [float(v) for v in np.asarray(bundle.get("Ka", [0, 0, 0])).reshape(-1)],
        "Kd": [float(v) for v in np.asarray(bundle.get("Kd", [1, 1, 1])).reshape(-1)],
        "Ks": [float(v) for v in np.asarray(bundle.get("Ks", [.4, .4, .4])).reshape(-1)],
        "Ns": float(np.asarray(bundle.get("Ns", 10)).reshape(())),
        "threshold": float(threshold if threshold is not None
                           else 2.0 / 256 * 3),
    }
    return params, meta


def import_ae_ckpt(src_pth: str, dst_pth: str, acfg,
                   threshold: float = None) -> Tuple[Dict, Dict]:
    """Convert a reference `ckpt_final.pth` bundle file to our container
    (see `ae_bundle_to_tree`).  Returns (params, meta)."""
    from ..core import checkpoint as ckpt
    params, meta = ae_bundle_to_tree(load_torch_file(src_pth), acfg,
                                     threshold=threshold)
    meta["imported_from"] = os.path.abspath(src_pth)
    ckpt.save_pytree(dst_pth, params, meta=meta)
    return params, meta
