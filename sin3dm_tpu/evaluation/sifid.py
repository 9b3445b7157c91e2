"""Multi-view SIFID — single-image FID at InceptionV3 features.

JAX re-implementation of `/root/reference/evaluation/sifid.py` +
`inception.py`, covering ALL four feature blocks of the reference
wrapper (`inception.py:62-105`): dims 64 (through the first max-pool),
192 (second max-pool), 768 (pre-aux-classifier, Mixed_5b..6e), and
2048 (after Mixed_7c).  `eval_full` only uses 64/192, but the deeper
blocks are exposed for capability parity.  Activations stay spatial and
are flattened per pixel (`sifid.py:111`), inputs are PNG floats in
[0,1] scaled to [-1,1] (normalize_input, no resize —
`inception.py:23-24`).

Weights: pass a torchvision `inception_v3` state-dict path (.pth) —
there is no egress to download one here.  Stem-only state dicts still
load when only dims 64/192 are needed.
"""

from __future__ import annotations

import os
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from .ssfid import frechet_distance


def _conv_bn(p, x, stride=1, padding="VALID"):
    """BasicConv2d: conv (no bias) + BatchNorm(eps=1e-3) + relu, NHWC."""
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    inv = jax.lax.rsqrt(p["var"] + 1e-3)
    y = (y - p["mean"]) * inv * p["gamma"] + p["beta"]
    return jax.nn.relu(y)


def _maxpool3x3s2(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                                 (1, 2, 2, 1), "VALID")


def _avgpool3x3s1p1(x):
    """torch avg_pool2d(3, stride=1, padding=1) with the default
    count_include_pad=True: always divide by 9."""
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 3, 3, 1),
                              (1, 1, 1, 1),
                              ((0, 0), (1, 1), (1, 1), (0, 0)))
    return s / 9.0


# ---------------------------------------------------------------------------
# torchvision InceptionV3 mixed blocks (inference semantics).  Branch
# concat order matches torchvision's forward methods exactly.
# ---------------------------------------------------------------------------

def _inception_a(p, x):
    b1 = _conv_bn(p["branch1x1"], x)
    b5 = _conv_bn(p["branch5x5_2"],
                  _conv_bn(p["branch5x5_1"], x), padding=((2, 2), (2, 2)))
    bd = _conv_bn(p["branch3x3dbl_1"], x)
    bd = _conv_bn(p["branch3x3dbl_2"], bd, padding=((1, 1), (1, 1)))
    bd = _conv_bn(p["branch3x3dbl_3"], bd, padding=((1, 1), (1, 1)))
    bp = _conv_bn(p["branch_pool"], _avgpool3x3s1p1(x))
    return jnp.concatenate([b1, b5, bd, bp], axis=-1)


def _inception_b(p, x):
    b3 = _conv_bn(p["branch3x3"], x, stride=2)
    bd = _conv_bn(p["branch3x3dbl_1"], x)
    bd = _conv_bn(p["branch3x3dbl_2"], bd, padding=((1, 1), (1, 1)))
    bd = _conv_bn(p["branch3x3dbl_3"], bd, stride=2)
    bp = _maxpool3x3s2(x)
    return jnp.concatenate([b3, bd, bp], axis=-1)


def _inception_c(p, x):
    b1 = _conv_bn(p["branch1x1"], x)
    b7 = _conv_bn(p["branch7x7_1"], x)
    b7 = _conv_bn(p["branch7x7_2"], b7, padding=((0, 0), (3, 3)))
    b7 = _conv_bn(p["branch7x7_3"], b7, padding=((3, 3), (0, 0)))
    bd = _conv_bn(p["branch7x7dbl_1"], x)
    bd = _conv_bn(p["branch7x7dbl_2"], bd, padding=((3, 3), (0, 0)))
    bd = _conv_bn(p["branch7x7dbl_3"], bd, padding=((0, 0), (3, 3)))
    bd = _conv_bn(p["branch7x7dbl_4"], bd, padding=((3, 3), (0, 0)))
    bd = _conv_bn(p["branch7x7dbl_5"], bd, padding=((0, 0), (3, 3)))
    bp = _conv_bn(p["branch_pool"], _avgpool3x3s1p1(x))
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _inception_d(p, x):
    b3 = _conv_bn(p["branch3x3_2"],
                  _conv_bn(p["branch3x3_1"], x), stride=2)
    b7 = _conv_bn(p["branch7x7x3_1"], x)
    b7 = _conv_bn(p["branch7x7x3_2"], b7, padding=((0, 0), (3, 3)))
    b7 = _conv_bn(p["branch7x7x3_3"], b7, padding=((3, 3), (0, 0)))
    b7 = _conv_bn(p["branch7x7x3_4"], b7, stride=2)
    bp = _maxpool3x3s2(x)
    return jnp.concatenate([b3, b7, bp], axis=-1)


def _inception_e(p, x):
    b1 = _conv_bn(p["branch1x1"], x)
    b3 = _conv_bn(p["branch3x3_1"], x)
    b3 = jnp.concatenate([
        _conv_bn(p["branch3x3_2a"], b3, padding=((0, 0), (1, 1))),
        _conv_bn(p["branch3x3_2b"], b3, padding=((1, 1), (0, 0)))],
        axis=-1)
    bd = _conv_bn(p["branch3x3dbl_1"], x)
    bd = _conv_bn(p["branch3x3dbl_2"], bd, padding=((1, 1), (1, 1)))
    bd = jnp.concatenate([
        _conv_bn(p["branch3x3dbl_3a"], bd, padding=((0, 0), (1, 1))),
        _conv_bn(p["branch3x3dbl_3b"], bd, padding=((1, 1), (0, 0)))],
        axis=-1)
    bp = _conv_bn(p["branch_pool"], _avgpool3x3s1p1(x))
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def stem_features(params: Dict, images: jax.Array, dims: int) -> jax.Array:
    """images: [B, H, W, 3] in [0,1].  dims in {64, 192, 768, 2048}.

    Block boundaries follow the reference wrapper exactly
    (`inception.py:62-105`): block0 output is AFTER Conv2d_2b (before
    maxpool1), block1 output is AFTER Conv2d_4a (before maxpool2) — the
    maxpools lead the NEXT block; block2 ends after Mixed_6e (768,
    pre-aux), block3 after Mixed_7c (2048).  (r2 parity harness caught
    the original off-by-one-pool here.)"""
    x = 2.0 * images - 1.0
    x = _conv_bn(params["Conv2d_1a_3x3"], x, stride=2)
    x = _conv_bn(params["Conv2d_2a_3x3"], x)
    x = _conv_bn(params["Conv2d_2b_3x3"], x, padding=((1, 1), (1, 1)))
    if dims == 64:
        return x
    x = _maxpool3x3s2(x)
    x = _conv_bn(params["Conv2d_3b_1x1"], x)
    x = _conv_bn(params["Conv2d_4a_3x3"], x)
    if dims == 192:
        return x
    if dims not in (768, 2048):
        raise ValueError(
            f"InceptionV3 feature dims must be 64/192/768/2048, got {dims}")
    x = _maxpool3x3s2(x)
    for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
        x = _inception_a(params[name], x)
    x = _inception_b(params["Mixed_6a"], x)
    for name in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        x = _inception_c(params[name], x)
    if dims == 768:
        return x
    x = _inception_d(params["Mixed_7a"], x)
    x = _inception_e(params["Mixed_7b"], x)
    x = _inception_e(params["Mixed_7c"], x)
    return x


_STEM_LAYERS = ["Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3",
                "Conv2d_3b_1x1", "Conv2d_4a_3x3"]

_A_CONVS = ["branch1x1", "branch5x5_1", "branch5x5_2", "branch3x3dbl_1",
            "branch3x3dbl_2", "branch3x3dbl_3", "branch_pool"]
_B_CONVS = ["branch3x3", "branch3x3dbl_1", "branch3x3dbl_2",
            "branch3x3dbl_3"]
_C_CONVS = ["branch1x1", "branch7x7_1", "branch7x7_2", "branch7x7_3",
            "branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
            "branch7x7dbl_4", "branch7x7dbl_5", "branch_pool"]
_D_CONVS = ["branch3x3_1", "branch3x3_2", "branch7x7x3_1", "branch7x7x3_2",
            "branch7x7x3_3", "branch7x7x3_4"]
_E_CONVS = ["branch1x1", "branch3x3_1", "branch3x3_2a", "branch3x3_2b",
            "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3a",
            "branch3x3dbl_3b", "branch_pool"]

MIXED_LAYERS = {
    "Mixed_5b": _A_CONVS, "Mixed_5c": _A_CONVS, "Mixed_5d": _A_CONVS,
    "Mixed_6a": _B_CONVS,
    "Mixed_6b": _C_CONVS, "Mixed_6c": _C_CONVS, "Mixed_6d": _C_CONVS,
    "Mixed_6e": _C_CONVS,
    "Mixed_7a": _D_CONVS, "Mixed_7b": _E_CONVS, "Mixed_7c": _E_CONVS,
}


def _convert_conv_bn(sd, prefix):
    return {
        "w": jnp.asarray(sd[f"{prefix}.conv.weight"].numpy()
                         .transpose(2, 3, 1, 0)),
        "gamma": jnp.asarray(sd[f"{prefix}.bn.weight"].numpy()),
        "beta": jnp.asarray(sd[f"{prefix}.bn.bias"].numpy()),
        "mean": jnp.asarray(sd[f"{prefix}.bn.running_mean"].numpy()),
        "var": jnp.asarray(sd[f"{prefix}.bn.running_var"].numpy()),
    }


def load_torch_weights(path: str) -> Dict:
    """Convert a torchvision inception_v3 state dict: the 5 stem layers
    always, plus every Mixed_* block present in the dict (stem-only
    dicts keep loading for dims 64/192 use)."""
    import torch
    sd = torch.load(path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    params = {}
    for name in _STEM_LAYERS:
        params[name] = _convert_conv_bn(sd, name)
    for layer, convs in MIXED_LAYERS.items():
        if f"{layer}.{convs[0]}.conv.weight" in sd:
            params[layer] = {c: _convert_conv_bn(sd, f"{layer}.{c}")
                             for c in convs}
    return params


def _load_png(path: str) -> np.ndarray:
    from PIL import Image
    img = np.asarray(Image.open(path), np.float32) / 255.0
    return img[..., :3]


def image_statistics(params: Dict, image: np.ndarray, dims: int):
    act = np.asarray(stem_features(params, jnp.asarray(image)[None], dims))
    act = act.reshape(-1, act.shape[-1])
    return act.mean(axis=0), np.cov(act, rowvar=False)


def calculate_multiview_sifid(gen_render_dirs: List[str],
                              ref_render_dir: str, weights_path: str,
                              dims: int = 64) -> Dict[str, float]:
    """Per-view SIFID of each generated render vs the reference render,
    averaged over views then over samples (`sifid.py:244-268`)."""
    if not os.path.exists(weights_path):
        raise RuntimeError(
            f"'{weights_path}' not found; SIFID needs torchvision "
            "inception_v3 weights (google/inception_v3 state dict)")
    params = load_torch_weights(weights_path)
    n_views = len(os.listdir(ref_render_dir))
    per_view = []
    for i in range(n_views):
        ref = _load_png(os.path.join(ref_render_dir, f"{i:03d}.png"))
        mu_r, sig_r = image_statistics(params, ref, dims)
        vals = []
        for gdir in gen_render_dirs:
            gen = _load_png(os.path.join(gdir, f"{i:03d}.png"))
            mu_g, sig_g = image_statistics(params, gen, dims)
            vals.append(frechet_distance(mu_r, sig_r, mu_g, sig_g))
        per_view.append(np.mean(vals))
    return {f"mv_sifid_dim{dims}": float(np.mean(per_view))}
