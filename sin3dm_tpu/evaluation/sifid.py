"""Multi-view SIFID — single-image FID at InceptionV3 stem features.

JAX re-implementation of `/root/reference/evaluation/sifid.py` +
`inception.py`.  Only the stem is needed: SIFID runs at dims 64 (through
the first max-pool) and 192 (through the second), never the Inception
mixed blocks.  Activations stay spatial and are flattened per pixel
(`sifid.py:111`), inputs are PNG floats in [0,1] scaled to [-1,1]
(normalize_input, no resize — `inception.py:23-24`).

Weights: pass a torchvision `inception_v3` state-dict path (.pth) —
there is no egress to download one here.
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


def stem_features(params: Dict, images: jax.Array, dims: int) -> jax.Array:
    """images: [B, H, W, 3] in [0,1].  dims in {64, 192}.

    Block boundaries follow the reference wrapper exactly
    (`inception.py:62-78`): block0 output is AFTER Conv2d_2b (before
    maxpool1), block1 output is AFTER Conv2d_4a (before maxpool2) — the
    maxpools lead the NEXT block.  (r2 parity harness caught the original
    off-by-one-pool here.)"""
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
    raise NotImplementedError(
        f"SIFID uses dims 64 or 192 (got {dims}); deeper Inception blocks "
        "are not required by the reference metric")


_STEM_LAYERS = ["Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3",
                "Conv2d_3b_1x1", "Conv2d_4a_3x3"]


def load_torch_weights(path: str) -> Dict:
    """Convert a torchvision inception_v3 state dict's stem layers."""
    import torch
    sd = torch.load(path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    params = {}
    for name in _STEM_LAYERS:
        params[name] = {
            "w": jnp.asarray(sd[f"{name}.conv.weight"].numpy()
                             .transpose(2, 3, 1, 0)),
            "gamma": jnp.asarray(sd[f"{name}.bn.weight"].numpy()),
            "beta": jnp.asarray(sd[f"{name}.bn.bias"].numpy()),
            "mean": jnp.asarray(sd[f"{name}.bn.running_mean"].numpy()),
            "var": jnp.asarray(sd[f"{name}.bn.running_var"].numpy()),
        }
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
