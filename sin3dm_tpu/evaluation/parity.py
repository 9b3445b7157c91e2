"""Eval-metric parity harness: JAX implementations vs the reference torch
modules, weight-loader round trips, and Fréchet parity.

The BASELINE contract ("SSFID within 2% of the CUDA reference") rides on
three weight-converted networks (`ssfid.load_torch_weights`,
`sifid.load_torch_weights`, `lpips.load_alexnet_weights` /
`load_lpips_lin_weights`).  This module proves, for a given state dict
(real checkpoints when available, synthetic random ones otherwise — the
transpose/shape bugs these tests target do not depend on the weight
values):

* activations of our JAX network match the REFERENCE torch module
  (`/root/reference/evaluation/{classifier3D,inception,lpips}.py`) on the
  same inputs to < 1e-4,
* our Fréchet distance matches the reference's
  `calculate_frechet_distance` on the same statistics,
* the full metric value matches end to end.

Run via `scripts/eval_parity.py` (real weights if paths given) or
`tests/test_eval_parity.py` (synthetic, always on).
"""

from __future__ import annotations

import os
import sys
import tempfile
from typing import Dict, Optional

import numpy as np

_REF_EVAL = "/root/reference/evaluation"


def _import_ref(name: str):
    """Import a module from the reference evaluation directory (read-only
    usage: we instantiate its torch models to compare against)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        f"ref_{name}", os.path.join(_REF_EVAL, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    # reference modules use flat sibling imports (e.g. `from patch_utils
    # import ...`); make the reference dir importable for the duration
    sys.path.insert(0, _REF_EVAL)
    try:
        spec.loader.exec_module(mod)
    finally:
        sys.path.remove(_REF_EVAL)
    return mod


# ---------------------------------------------------------------------------
# SSFID / classifier3D
# ---------------------------------------------------------------------------

def synth_clsshapenet_state_dict(seed: int = 0):
    """Random state dict with the Clsshapenet_128 architecture shapes
    (`classifier3D.py:14-32`: ef_dim=32, z_dim=512, 24 classes)."""
    import torch
    g = torch.Generator().manual_seed(seed)
    chans = [1, 32, 64, 128, 256, 512]
    sd = {}
    for i in range(1, 6):
        sd[f"conv_{i}.weight"] = 0.05 * torch.randn(
            chans[i], chans[i - 1], 4, 4, 4, generator=g)
        sd[f"conv_{i}.bias"] = 0.05 * torch.randn(chans[i], generator=g)
    sd["linear1.weight"] = 0.05 * torch.randn(24, 512, generator=g)
    sd["linear1.bias"] = 0.05 * torch.randn(24, generator=g)
    return sd


def ssfid_parity(weights_path: Optional[str] = None, voxel_size: int = 64,
                 out_layer: int = 2, seed: int = 0) -> Dict[str, float]:
    """Max |torch_ref - jax| activation error + Fréchet/metric parity."""
    import torch
    from . import ssfid as jssfid

    ref_cls = _import_ref("classifier3D")
    if weights_path and os.path.exists(weights_path):
        sd = torch.load(weights_path, map_location="cpu")
    else:
        sd = synth_clsshapenet_state_dict(seed)

    net = ref_cls.classifier(voxel_size=128)
    net.load_state_dict(sd)
    net.eval()

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "cls.pth")
        torch.save(sd, p)
        jparams = jssfid.load_torch_weights(p)

    rng = np.random.default_rng(seed)
    vox = (rng.random((voxel_size,) * 3) > 0.7).astype(np.float32)

    with torch.no_grad():
        t_act = net(torch.from_numpy(vox)[None, None], out_layer=out_layer)
    t_act = t_act.numpy()[0]                      # [C, D, H, W]

    import jax.numpy as jnp
    j_act = np.asarray(jssfid.classifier_features(
        jparams, jnp.asarray(vox)[None, ..., None], out_layer))[0]
    j_act = j_act.transpose(3, 0, 1, 2)           # NDHWC -> CDHW

    act_err = float(np.max(np.abs(t_act - j_act)))

    # Fréchet parity on the same statistics
    ref_ssfid = _import_ref("ssfid")
    a = t_act.reshape(t_act.shape[0], -1).T
    b = j_act.reshape(j_act.shape[0], -1).T * 1.05 + 0.01
    mu1, s1 = a.mean(0), np.cov(a, rowvar=False)
    mu2, s2 = b.mean(0), np.cov(b, rowvar=False)
    fd_ref = ref_ssfid.calculate_frechet_distance(mu1, s1, mu2, s2)
    fd_ours = jssfid.frechet_distance(mu1, s1, mu2, s2)
    fd_err = float(abs(fd_ref - fd_ours) / max(abs(fd_ref), 1e-12))

    return {"act_max_abs_err": act_err, "frechet_rel_err": fd_err}


# ---------------------------------------------------------------------------
# SIFID / Inception stem
# ---------------------------------------------------------------------------
#
# torchvision is NOT in this image, so the reference's InceptionV3 wrapper
# (`inception.py:60-78`, which composes torchvision modules) cannot be
# instantiated directly.  The comparator below is the IDENTICAL torch
# computation built from plain torch modules — BasicConv2d = Conv2d(bias
# =False) + BatchNorm2d(eps=0.001) + relu, the reference's block0/block1
# sequencing and its normalize_input [0,1]->[-1,1] scaling — with state
# dicts in the torchvision key format our loader consumes, so the loader's
# key/transpose contract is exercised end to end.  With real torchvision
# weights the same harness validates against the genuine checkpoint.

_INCEPTION_STEM = [  # (name, cin, cout, kernel, stride, pad)
    ("Conv2d_1a_3x3", 3, 32, 3, 2, 0),
    ("Conv2d_2a_3x3", 32, 32, 3, 1, 0),
    ("Conv2d_2b_3x3", 32, 64, 3, 1, 1),
    ("Conv2d_3b_1x1", 64, 80, 1, 1, 0),
    ("Conv2d_4a_3x3", 80, 192, 3, 1, 0),
]


def synth_inception_stem_state_dict(seed: int = 0):
    """Random stem state dict in torchvision inception_v3 key format,
    with randomized BN running stats (catches mean/var swaps)."""
    import torch
    g = torch.Generator().manual_seed(seed)
    sd = {}
    for name, cin, cout, k, _, _ in _INCEPTION_STEM:
        sd[f"{name}.conv.weight"] = 0.1 * torch.randn(cout, cin, k, k,
                                                      generator=g)
        sd[f"{name}.bn.weight"] = torch.rand(cout, generator=g) + 0.5
        sd[f"{name}.bn.bias"] = 0.1 * torch.randn(cout, generator=g)
        sd[f"{name}.bn.running_mean"] = 0.1 * torch.randn(cout, generator=g)
        sd[f"{name}.bn.running_var"] = torch.rand(cout, generator=g) + 0.5
    return sd


def _torch_inception_stem(sd, x, dims: int):
    """Reference InceptionV3 block0/block1 forward in plain torch
    (`inception.py:62-78` + BasicConv2d: bias-free conv, BN eps=1e-3,
    relu).  Block0 ends AFTER Conv2d_2b; maxpool1 LEADS block1; block1
    ends after Conv2d_4a.  Input scaled [0,1]->[-1,1]."""
    import torch.nn.functional as F

    x = 2.0 * x - 1.0
    for name, cin, cout, k, stride, pad in _INCEPTION_STEM:
        if name == "Conv2d_3b_1x1":  # block1 starts with maxpool1
            if dims == 64:
                return x
            x = F.max_pool2d(x, 3, stride=2)
        x = F.conv2d(x, sd[f"{name}.conv.weight"], None, stride=stride,
                     padding=pad)
        x = F.batch_norm(x, sd[f"{name}.bn.running_mean"],
                         sd[f"{name}.bn.running_var"],
                         sd[f"{name}.bn.weight"], sd[f"{name}.bn.bias"],
                         training=False, eps=1e-3)
        x = F.relu(x)
    assert dims == 192
    return x


# Mixed-block conv specs: name -> (cin, cout, kh, kw).  Channel wiring
# is torchvision inception_v3's (InceptionA/B/C/D/E).
def _a_specs(cin, pf):
    return {"branch1x1": (cin, 64, 1, 1), "branch5x5_1": (cin, 48, 1, 1),
            "branch5x5_2": (48, 64, 5, 5),
            "branch3x3dbl_1": (cin, 64, 1, 1),
            "branch3x3dbl_2": (64, 96, 3, 3),
            "branch3x3dbl_3": (96, 96, 3, 3),
            "branch_pool": (cin, pf, 1, 1)}


def _b_specs(cin):
    return {"branch3x3": (cin, 384, 3, 3),
            "branch3x3dbl_1": (cin, 64, 1, 1),
            "branch3x3dbl_2": (64, 96, 3, 3),
            "branch3x3dbl_3": (96, 96, 3, 3)}


def _c_specs(cin, c7):
    return {"branch1x1": (cin, 192, 1, 1),
            "branch7x7_1": (cin, c7, 1, 1), "branch7x7_2": (c7, c7, 1, 7),
            "branch7x7_3": (c7, 192, 7, 1),
            "branch7x7dbl_1": (cin, c7, 1, 1),
            "branch7x7dbl_2": (c7, c7, 7, 1),
            "branch7x7dbl_3": (c7, c7, 1, 7),
            "branch7x7dbl_4": (c7, c7, 7, 1),
            "branch7x7dbl_5": (c7, 192, 1, 7),
            "branch_pool": (cin, 192, 1, 1)}


def _d_specs(cin):
    return {"branch3x3_1": (cin, 192, 1, 1), "branch3x3_2": (192, 320, 3, 3),
            "branch7x7x3_1": (cin, 192, 1, 1),
            "branch7x7x3_2": (192, 192, 1, 7),
            "branch7x7x3_3": (192, 192, 7, 1),
            "branch7x7x3_4": (192, 192, 3, 3)}


def _e_specs(cin):
    return {"branch1x1": (cin, 320, 1, 1), "branch3x3_1": (cin, 384, 1, 1),
            "branch3x3_2a": (384, 384, 1, 3),
            "branch3x3_2b": (384, 384, 3, 1),
            "branch3x3dbl_1": (cin, 448, 1, 1),
            "branch3x3dbl_2": (448, 384, 3, 3),
            "branch3x3dbl_3a": (384, 384, 1, 3),
            "branch3x3dbl_3b": (384, 384, 3, 1),
            "branch_pool": (cin, 192, 1, 1)}


_MIXED_SPECS = {
    "Mixed_5b": _a_specs(192, 32), "Mixed_5c": _a_specs(256, 64),
    "Mixed_5d": _a_specs(288, 64), "Mixed_6a": _b_specs(288),
    "Mixed_6b": _c_specs(768, 128), "Mixed_6c": _c_specs(768, 160),
    "Mixed_6d": _c_specs(768, 160), "Mixed_6e": _c_specs(768, 192),
    "Mixed_7a": _d_specs(768), "Mixed_7b": _e_specs(1280),
    "Mixed_7c": _e_specs(2048),
}


def synth_inception_full_state_dict(seed: int = 0):
    """Stem + all mixed blocks, torchvision key format, randomized BN
    running stats."""
    import torch
    sd = synth_inception_stem_state_dict(seed)
    g = torch.Generator().manual_seed(seed + 1)
    for layer, convs in _MIXED_SPECS.items():
        for conv, (cin, cout, kh, kw) in convs.items():
            pre = f"{layer}.{conv}"
            sd[f"{pre}.conv.weight"] = 0.1 * torch.randn(
                cout, cin, kh, kw, generator=g)
            sd[f"{pre}.bn.weight"] = torch.rand(cout, generator=g) + 0.5
            sd[f"{pre}.bn.bias"] = 0.1 * torch.randn(cout, generator=g)
            sd[f"{pre}.bn.running_mean"] = 0.1 * torch.randn(cout,
                                                             generator=g)
            sd[f"{pre}.bn.running_var"] = torch.rand(cout,
                                                     generator=g) + 0.5
    return sd


def _tcb(sd, prefix, x, stride=1, padding=0):
    """BasicConv2d in plain torch (bias-free conv + BN eps=1e-3 + relu)."""
    import torch.nn.functional as F
    x = F.conv2d(x, sd[f"{prefix}.conv.weight"], None, stride=stride,
                 padding=padding)
    x = F.batch_norm(x, sd[f"{prefix}.bn.running_mean"],
                     sd[f"{prefix}.bn.running_var"],
                     sd[f"{prefix}.bn.weight"], sd[f"{prefix}.bn.bias"],
                     training=False, eps=1e-3)
    return F.relu(x)


def _torch_inception_mixed(sd, x, dims: int):
    """Reference block2/block3 forward (`inception.py:81-105`) in plain
    torch functional — torchvision InceptionA/B/C/D/E semantics."""
    import torch
    import torch.nn.functional as F

    def mixed_a(n, x):
        b1 = _tcb(sd, f"{n}.branch1x1", x)
        b5 = _tcb(sd, f"{n}.branch5x5_2",
                  _tcb(sd, f"{n}.branch5x5_1", x), padding=2)
        bd = _tcb(sd, f"{n}.branch3x3dbl_1", x)
        bd = _tcb(sd, f"{n}.branch3x3dbl_2", bd, padding=1)
        bd = _tcb(sd, f"{n}.branch3x3dbl_3", bd, padding=1)
        bp = _tcb(sd, f"{n}.branch_pool",
                  F.avg_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([b1, b5, bd, bp], 1)

    def mixed_b(n, x):
        b3 = _tcb(sd, f"{n}.branch3x3", x, stride=2)
        bd = _tcb(sd, f"{n}.branch3x3dbl_1", x)
        bd = _tcb(sd, f"{n}.branch3x3dbl_2", bd, padding=1)
        bd = _tcb(sd, f"{n}.branch3x3dbl_3", bd, stride=2)
        return torch.cat([b3, bd, F.max_pool2d(x, 3, stride=2)], 1)

    def mixed_c(n, x):
        b1 = _tcb(sd, f"{n}.branch1x1", x)
        b7 = _tcb(sd, f"{n}.branch7x7_1", x)
        b7 = _tcb(sd, f"{n}.branch7x7_2", b7, padding=(0, 3))
        b7 = _tcb(sd, f"{n}.branch7x7_3", b7, padding=(3, 0))
        bd = _tcb(sd, f"{n}.branch7x7dbl_1", x)
        bd = _tcb(sd, f"{n}.branch7x7dbl_2", bd, padding=(3, 0))
        bd = _tcb(sd, f"{n}.branch7x7dbl_3", bd, padding=(0, 3))
        bd = _tcb(sd, f"{n}.branch7x7dbl_4", bd, padding=(3, 0))
        bd = _tcb(sd, f"{n}.branch7x7dbl_5", bd, padding=(0, 3))
        bp = _tcb(sd, f"{n}.branch_pool",
                  F.avg_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([b1, b7, bd, bp], 1)

    def mixed_d(n, x):
        b3 = _tcb(sd, f"{n}.branch3x3_2",
                  _tcb(sd, f"{n}.branch3x3_1", x), stride=2)
        b7 = _tcb(sd, f"{n}.branch7x7x3_1", x)
        b7 = _tcb(sd, f"{n}.branch7x7x3_2", b7, padding=(0, 3))
        b7 = _tcb(sd, f"{n}.branch7x7x3_3", b7, padding=(3, 0))
        b7 = _tcb(sd, f"{n}.branch7x7x3_4", b7, stride=2)
        return torch.cat([b3, b7, F.max_pool2d(x, 3, stride=2)], 1)

    def mixed_e(n, x):
        b1 = _tcb(sd, f"{n}.branch1x1", x)
        b3 = _tcb(sd, f"{n}.branch3x3_1", x)
        b3 = torch.cat([
            _tcb(sd, f"{n}.branch3x3_2a", b3, padding=(0, 1)),
            _tcb(sd, f"{n}.branch3x3_2b", b3, padding=(1, 0))], 1)
        bd = _tcb(sd, f"{n}.branch3x3dbl_1", x)
        bd = _tcb(sd, f"{n}.branch3x3dbl_2", bd, padding=1)
        bd = torch.cat([
            _tcb(sd, f"{n}.branch3x3dbl_3a", bd, padding=(0, 1)),
            _tcb(sd, f"{n}.branch3x3dbl_3b", bd, padding=(1, 0))], 1)
        bp = _tcb(sd, f"{n}.branch_pool",
                  F.avg_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([b1, b3, bd, bp], 1)

    x = _torch_inception_stem(sd, x, 192)
    x = F.max_pool2d(x, 3, stride=2)
    for n in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
        x = mixed_a(n, x)
    x = mixed_b("Mixed_6a", x)
    for n in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        x = mixed_c(n, x)
    if dims == 768:
        return x
    x = mixed_d("Mixed_7a", x)
    x = mixed_e("Mixed_7b", x)
    x = mixed_e("Mixed_7c", x)
    return x


def sifid_parity(weights_path: Optional[str] = None, image_size: int = 96,
                 seed: int = 0, deep: bool = True) -> Dict[str, float]:
    """Feature parity at dims 64/192 (stem) and, with deep=True, 768 and
    2048 (mixed blocks) vs the torch computation of the reference
    InceptionV3 wrapper (`inception.py:60-105`)."""
    import torch
    from . import sifid as jsifid

    if weights_path and os.path.exists(weights_path):
        sd = torch.load(weights_path, map_location="cpu")
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
    elif deep:
        sd = synth_inception_full_state_dict(seed)
    else:
        sd = synth_inception_stem_state_dict(seed)

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "inc.pth")
        torch.save(sd, p)
        jparams = jsifid.load_torch_weights(p)

    rng = np.random.default_rng(seed)
    img = rng.random((image_size, image_size, 3)).astype(np.float32)

    import jax.numpy as jnp
    errs = {}
    have_mixed = "Mixed_5b.branch1x1.conv.weight" in sd
    dims_list = (64, 192, 768, 2048) if (deep and have_mixed) else (64, 192)
    for dims in dims_list:
        with torch.no_grad():
            tx = torch.from_numpy(img.transpose(2, 0, 1))[None]
            if dims in (64, 192):
                t_f = _torch_inception_stem(sd, tx, dims).numpy()[0]
            else:
                t_f = _torch_inception_mixed(sd, tx, dims).numpy()[0]
        j_f = np.asarray(jsifid.stem_features(
            jparams, jnp.asarray(img)[None], dims))[0].transpose(2, 0, 1)
        err = float(np.max(np.abs(t_f - j_f)))
        errs[f"act_max_abs_err_dim{dims}"] = err
        # random synth weights blow activations up exponentially with
        # depth (1e9+ after 9 mixed blocks) — the scale-normalized error
        # is the meaningful parity figure there
        errs[f"act_rel_err_dim{dims}"] = err / max(
            float(np.max(np.abs(t_f))), 1e-30)
    return errs


# ---------------------------------------------------------------------------
# LPIPS
# ---------------------------------------------------------------------------

# torchvision AlexNet.features layout: (cin, cout, kernel, stride, pad,
# maxpool-after) for the conv layers at indices 0,3,6,8,10
_ALEX_FEATURES = [(3, 64, 11, 4, 2, True), (64, 192, 5, 1, 2, True),
                  (192, 384, 3, 1, 1, False), (384, 256, 3, 1, 1, False),
                  (256, 256, 3, 1, 1, True)]
_ALEX_CONV_IDS = [0, 3, 6, 8, 10]


def synth_alexnet_state_dict(seed: int = 0):
    """Random state dict with torchvision `alexnet().features` keys."""
    import torch
    g = torch.Generator().manual_seed(seed)
    sd = {}
    for idx, (cin, cout, k, _, _, _) in zip(_ALEX_CONV_IDS, _ALEX_FEATURES):
        sd[f"features.{idx}.weight"] = 0.05 * torch.randn(cout, cin, k, k,
                                                          generator=g)
        sd[f"features.{idx}.bias"] = 0.05 * torch.randn(cout, generator=g)
    return sd


def synth_lpips_state_dict(seed: int = 0):
    import torch
    g = torch.Generator().manual_seed(seed)
    chans = [64, 192, 384, 256, 256]
    return {f"lpips_weights.{i}.main.1.weight":
            torch.rand(1, c, 1, 1, generator=g) for i, c in enumerate(chans)}


def _torch_lpips(alex_sd, lp_sd, x, y):
    """Reference LPIPS forward in plain torch (`lpips.py:52-86`:
    AlexNet post-ReLU fmaps, channel-unit-normalize, squared diff through
    the learned bias-free 1x1 conv, mean over space, summed over layers;
    inputs in [-1,1] renormalized by the rescaled imagenet stats).
    torchvision itself is absent from this image; this replays the exact
    module computation with functional torch ops."""
    import torch
    import torch.nn.functional as F

    mu = torch.tensor([-0.03, -0.088, -0.188]).view(1, 3, 1, 1)
    sigma = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def fmaps(t):
        t = (t - mu) / sigma
        out = []
        for idx, (cin, cout, k, s, p, pool) in zip(_ALEX_CONV_IDS,
                                                   _ALEX_FEATURES):
            t = F.relu(F.conv2d(t, alex_sd[f"features.{idx}.weight"],
                                alex_sd[f"features.{idx}.bias"],
                                stride=s, padding=p))
            out.append(t)
            if pool:
                t = F.max_pool2d(t, 3, stride=2)
        return out

    def normalize(t, eps=1e-10):
        return t * torch.rsqrt(torch.sum(t ** 2, dim=1, keepdim=True) + eps)

    val = 0.0
    for fx, fy, i in zip(fmaps(x), fmaps(y), range(5)):
        d = (normalize(fx) - normalize(fy)) ** 2
        w = lp_sd[f"lpips_weights.{i}.main.1.weight"]
        val = val + torch.mean(F.conv2d(d, w))
    return float(val)


def lpips_parity(alexnet_path: Optional[str] = None,
                 lpips_ckpt_path: Optional[str] = None,
                 image_size: int = 128, seed: int = 0) -> Dict[str, float]:
    """Full LPIPS scalar: the reference module's computation vs our
    `lpips_pair` (`lpips.py:52-86`)."""
    import torch
    from . import lpips as jlpips

    if alexnet_path and os.path.exists(alexnet_path):
        full = torch.load(alexnet_path, map_location="cpu")
        alex_sd = {k: v for k, v in full.items()
                   if k.startswith("features.")}
    else:
        alex_sd = synth_alexnet_state_dict(seed)
    if lpips_ckpt_path and os.path.exists(lpips_ckpt_path):
        lp_sd = torch.load(lpips_ckpt_path, map_location="cpu")
    else:
        lp_sd = synth_lpips_state_dict(seed)

    with tempfile.TemporaryDirectory() as d:
        ap = os.path.join(d, "alex.pth")
        lp = os.path.join(d, "lpips_weights.ckpt")
        torch.save(alex_sd, ap)
        torch.save(lp_sd, lp)
        jalex = jlpips.load_alexnet_weights(ap)
        jlin = jlpips.load_lpips_lin_weights(lp)

    rng = np.random.default_rng(seed)
    x = (rng.random((image_size, image_size, 3)) * 2 - 1).astype(np.float32)
    y = (rng.random((image_size, image_size, 3)) * 2 - 1).astype(np.float32)

    with torch.no_grad():
        t_val = _torch_lpips(alex_sd, lp_sd,
                             torch.from_numpy(x.transpose(2, 0, 1))[None],
                             torch.from_numpy(y.transpose(2, 0, 1))[None])

    import jax.numpy as jnp
    j_val = float(jlpips.lpips_pair(jalex, jlin, jnp.asarray(x)[None],
                                    jnp.asarray(y)[None]))
    return {"lpips_torch": t_val, "lpips_jax": j_val,
            "abs_err": abs(t_val - j_val)}


def run_all(clsshapenet: Optional[str] = None,
            inception: Optional[str] = None,
            alexnet: Optional[str] = None,
            lpips_ckpt: Optional[str] = None,
            full_size: bool = False) -> Dict[str, Dict[str, float]]:
    vs = 128 if full_size else 64
    return {
        "ssfid": ssfid_parity(clsshapenet, voxel_size=vs),
        "sifid": sifid_parity(inception,
                              image_size=299 if full_size else 96),
        "lpips": lpips_parity(alexnet, lpips_ckpt,
                              image_size=512 if full_size else 128),
    }
