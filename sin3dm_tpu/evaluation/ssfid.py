"""SSFID — single-shape Fréchet distance on 3D classifier activations.

JAX re-implementation of `/root/reference/evaluation/ssfid.py` +
`classifier3D.py`: a 5-stage strided Conv3d + InstanceNorm3d + leaky-ReLU
tower (DECOR-GAN's shapenet classifier) evaluated at layer 2; the Fréchet
distance is computed over the spatially-flattened activations.

The pretrained `Clsshapenet_128.pth` is an external torch checkpoint (the
reference downloads it from Google Drive); `load_torch_weights` converts it
on the fly using torch-CPU.  Pass its path explicitly — there is no
network egress here to fetch it.
"""

from __future__ import annotations

import os
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy import linalg

EF_DIM = 32
Z_DIM = 512


def _instance_norm3d(x, eps=1e-5):
    """torch InstanceNorm3d (unaffine): normalize over D,H,W per channel.
    x: [B, D, H, W, C]."""
    mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    var = jnp.var(x, axis=(1, 2, 3), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def _conv3d_s2(p, x):
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(2, 2, 2),
        padding=((1, 1), (1, 1), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return y + p["b"]


def classifier_features(params: Dict, voxel: jax.Array,
                        out_layer: int = 2) -> jax.Array:
    """voxel: [B, D, H, W, 1] float -> activations after `out_layer`
    (classifier3D.py:34-59 semantics)."""
    h = voxel
    for i in range(1, 5):
        h = _instance_norm3d(_conv3d_s2(params[f"conv_{i}"], h))
        h = jax.nn.leaky_relu(h, negative_slope=0.01)
        if out_layer == i:
            return h
    h = _conv3d_s2(params["conv_5"], h)
    z = jnp.mean(h, axis=(1, 2, 3))
    out = jax.nn.leaky_relu(z, negative_slope=0.01)
    logits = out @ params["linear1"]["w"] + params["linear1"]["b"]
    return logits, z


def load_torch_weights(path: str) -> Dict:
    """Convert the torch Clsshapenet state dict to DHWIO param pytree."""
    import torch
    sd = torch.load(path, map_location="cpu")
    params: Dict = {}
    for i in range(1, 6):
        w = sd[f"conv_{i}.weight"].numpy()   # [O, I, D, H, W]
        b = sd[f"conv_{i}.bias"].numpy()
        params[f"conv_{i}"] = {
            "w": jnp.asarray(w.transpose(2, 3, 4, 1, 0)),
            "b": jnp.asarray(b)}
    params["linear1"] = {
        "w": jnp.asarray(sd["linear1.weight"].numpy().T),
        "b": jnp.asarray(sd["linear1.bias"].numpy())}
    return params


def activation_statistics(params: Dict, voxel: np.ndarray,
                          out_layer: int = 2
                          ) -> Tuple[np.ndarray, np.ndarray]:
    """(mu, sigma) over spatial positions of the layer activations
    (`ssfid.py:65-77`)."""
    x = jnp.asarray(voxel, jnp.float32)[None, ..., None]
    act = np.asarray(classifier_features(params, x, out_layer))
    act = act.reshape(-1, act.shape[-1])
    mu = act.mean(axis=0)
    sigma = np.cov(act, rowvar=False)
    return mu, sigma


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """Stable Fréchet distance (`ssfid.py:11-62`)."""
    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            raise ValueError("Imaginary component "
                             f"{np.max(np.abs(covmean.imag))}")
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


def eval_ssfid(gen_voxel_paths: List[str], ref_sdf_path: str,
               weights_path: str, out_layer: int = 2) -> Dict[str, float]:
    """SSFID over generated voxel grids vs the reference shape
    (`ssfid.py:81-117`)."""
    from .patch_metrics import load_sdf_npz_as_voxel, load_voxel_npz
    if not os.path.exists(weights_path):
        raise RuntimeError(
            f"'{weights_path}' not found. SSFID needs the pretrained "
            "Clsshapenet_128.pth (see the DECOR-GAN release).")
    params = load_torch_weights(weights_path)
    ref = load_sdf_npz_as_voxel(ref_sdf_path).astype(np.float32)
    mu_r, sig_r = activation_statistics(params, ref, out_layer)
    vals = []
    for p in gen_voxel_paths:
        gen = load_voxel_npz(p).astype(np.float32)
        if gen.shape != ref.shape:
            raise RuntimeError("generated and reference grids differ in size")
        mu_f, sig_f = activation_statistics(params, gen, out_layer)
        vals.append(frechet_distance(mu_r, sig_r, mu_f, sig_f))
    return {"SSFID_avg": round(float(np.mean(vals)), 6),
            "SSFID_std": round(float(np.std(vals)), 6)}
