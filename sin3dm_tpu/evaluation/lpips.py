"""Multi-view LPIPS diversity — StarGAN-v2 style AlexNet LPIPS.

JAX re-implementation of `/root/reference/evaluation/lpips.py`: AlexNet
conv features after each ReLU, channel-unit-normalized, squared diffs
weighted by learned 1x1 convs, mean over space + layers.  Diversity =
mean pairwise LPIPS among generated renders per view (`lpips.py:88-133`).

Weights: torchvision AlexNet state dict (features) + the bundled
`lpips_weights.ckpt` (both passed by path; no egress here).
"""

from __future__ import annotations

import os
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

# imagenet normalization rescaled for inputs in [-1, 1] (`lpips.py:60-61`)
_MU = np.array([-0.03, -0.088, -0.188], np.float32)
_SIGMA = np.array([0.458, 0.448, 0.450], np.float32)

# AlexNet features config: (out_ch, kernel, stride, pad, maxpool_after)
_ALEX_CFG = [(64, 11, 4, 2, True), (192, 5, 1, 2, True),
             (384, 3, 1, 1, False), (256, 3, 1, 1, False),
             (256, 3, 1, 1, True)]


def _conv(p, x, stride, pad):
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + p["b"]


def _maxpool3x3s2(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                                 (1, 2, 2, 1), "VALID")


def alexnet_fmaps(params: List[Dict], x: jax.Array) -> List[jax.Array]:
    """x: [B, H, W, 3] normalized; returns the 5 post-ReLU feature maps."""
    fmaps = []
    for p, (cout, k, s, pad, pool) in zip(params, _ALEX_CFG):
        x = jax.nn.relu(_conv(p, x, s, pad))
        fmaps.append(x)
        if pool:
            x = _maxpool3x3s2(x)
    return fmaps


def _unit_normalize(x, eps=1e-10):
    return x * jax.lax.rsqrt(jnp.sum(x ** 2, axis=-1, keepdims=True) + eps)


def lpips_pair(alex_params, lin_weights, x, y) -> jax.Array:
    """LPIPS between two [B, H, W, 3] batches in [-1, 1]."""
    xn = (x - _MU) / _SIGMA
    yn = (y - _MU) / _SIGMA
    fx = alexnet_fmaps(alex_params, xn)
    fy = alexnet_fmaps(alex_params, yn)
    val = 0.0
    for a, b, w in zip(fx, fy, lin_weights):
        d = (_unit_normalize(a) - _unit_normalize(b)) ** 2
        # learned 1x1 conv, no bias (`lpips.py:41-48`)
        val = val + jnp.mean(jnp.einsum("bhwc,c->bhw", d, w))
    return val


def load_alexnet_weights(path: str) -> List[Dict]:
    import torch
    sd = torch.load(path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    conv_ids = [0, 3, 6, 8, 10]  # torchvision alexnet.features conv indices
    params = []
    for i in conv_ids:
        params.append({
            "w": jnp.asarray(sd[f"features.{i}.weight"].numpy()
                             .transpose(2, 3, 1, 0)),
            "b": jnp.asarray(sd[f"features.{i}.bias"].numpy())})
    return params


def load_lpips_lin_weights(path: str) -> List[jnp.ndarray]:
    """Load the bundled lpips_weights.ckpt (1x1 conv weights per layer)."""
    import torch
    sd = torch.load(path, map_location="cpu")
    out = []
    for i in range(5):
        w = sd[f"lpips_weights.{i}.main.1.weight"].numpy()  # [1, C, 1, 1]
        out.append(jnp.asarray(w[0, :, 0, 0]))
    return out


def calculate_lpips_given_images(alex_params, lin_weights,
                                 images: np.ndarray) -> float:
    """Mean pairwise LPIPS among N images [N, H, W, 3] in [-1,1]
    (`lpips.py:88-105`)."""
    imgs = jnp.asarray(images)
    n = len(imgs)
    vals = []
    for i in range(n - 1):
        for j in range(i + 1, n):
            vals.append(float(lpips_pair(alex_params, lin_weights,
                                         imgs[i:i + 1], imgs[j:j + 1])))
    return float(np.mean(vals))


def calculate_multiview_lpips(gen_render_dirs: List[str],
                              alexnet_weights_path: str,
                              lpips_weights_path: str) -> Dict[str, float]:
    from PIL import Image
    for p in (alexnet_weights_path, lpips_weights_path):
        if not os.path.exists(p):
            raise RuntimeError(f"'{p}' not found; LPIPS needs torchvision "
                               "AlexNet weights + lpips_weights.ckpt")
    alex = load_alexnet_weights(alexnet_weights_path)
    lin = load_lpips_lin_weights(lpips_weights_path)
    n_views = len(os.listdir(gen_render_dirs[0]))
    vals = []
    for i in range(n_views):
        imgs = []
        for d in gen_render_dirs:
            img = np.asarray(Image.open(
                os.path.join(d, f"{i:03d}.png")).convert("RGB"),
                np.float32) / 255.0
            imgs.append((img - 0.5) / 0.5)
        vals.append(calculate_lpips_given_images(alex, lin,
                                                 np.stack(imgs)))
    return {"mv_lpips": float(np.mean(vals))}
