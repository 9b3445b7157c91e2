"""Import a reference (torch) Sin3DM checkpoint tag into this framework.

    python scripts/import_torch_ckpt.py --src /path/to/ref_tag --dst logs/tag

A reference tag directory (as produced by the reference `src/train.py`, or
downloaded from the published Sin3DM checkpoints) holds:

    encoding/args.json, encoding/ckpt_final.pth, encoding/feat.npz
    diffusion/args.json, diffusion/ema_{rate}_{step:06d}.pt

This converts the two torch pickles to our npz containers (weight
transplant via `sin3dm_tpu.compat.torch_import`, parity proven by
`tests/test_torch_import.py`) and copies args.json / feat.npz verbatim
(identical schemas).  The resulting directory drives our CLIs directly:

    python -m sin3dm_tpu.cli.sample --tag logs/tag --n_samples 4

The TSDF clamp `threshold` is not stored in the reference bundle
(`src/encoding/model.py:141-157`); it is read from the dataset npz named
by encoding/args.json when reachable, else `--threshold` (default
2/256*3, the reference sampler's formula at the default grid reso,
`data/mesh_sampler.py:156-171`).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sin3dm_tpu.compat import torch_import as ti  # noqa: E402
from sin3dm_tpu.models.autoencoder import AEConfig  # noqa: E402
from sin3dm_tpu.models.unet import UNetConfig  # noqa: E402


def _ae_config(enc_args: dict) -> AEConfig:
    return AEConfig(
        data_type=enc_args.get("data_type", "sdftex"),
        enc_net_type=enc_args.get("enc_net_type", "skip"),
        fdim_geo=int(enc_args.get("fdim_geo", 4)),
        fdim_tex=int(enc_args.get("fdim_tex", 8)),
        fdim_up=int(enc_args.get("fdim_up", 64)),
        hidden_dim=int(enc_args.get("hidden_dim", 256)),
        n_hidden_layers=int(enc_args.get("n_hidden_layers", 4)),
    )


def _unet_config(diff_args: dict, acfg: AEConfig) -> UNetConfig:
    ch = acfg.fdim_geo + (acfg.fdim_tex if acfg.use_tex else 0)
    mult = diff_args.get("channel_mult", "1,2")
    if isinstance(mult, str):
        mult = tuple(int(m) for m in mult.split(",") if m)
    return UNetConfig(
        in_channels=int(diff_args.get("in_channels", ch)),
        model_channels=int(diff_args.get("model_channels", 64)),
        out_channels=int(diff_args.get("out_channels", ch)),
        num_res_blocks=int(diff_args.get("num_res_blocks", 1)),
        channel_mult=tuple(mult),
        use_scale_shift_norm=bool(diff_args.get("use_scale_shift_norm",
                                                True)),
        rollout=diff_args.get("unet_model", "unet_small") != "unet_raw",
    )


def _find_threshold(enc_args: dict, override) -> float:
    if override is not None:
        return float(override)
    data_path = enc_args.get("data_path")
    if data_path and os.path.exists(data_path):
        import numpy as np
        with np.load(data_path) as d:
            if "threshold" in d.files:
                thr = float(d["threshold"])
                print(f"threshold {thr:.6f} from dataset {data_path}")
                return thr
    thr = 2.0 / 256 * 3
    print(f"dataset npz not reachable; using default threshold {thr:.6f} "
          "(override with --threshold)")
    return thr


def export_tag(src: str, dst: str) -> None:
    """Reverse direction: OUR tag -> reference torch format, so a
    checkpoint trained here loads in the reference codebase
    (`load_state_dict(strict=True)` round trip tested in
    tests/test_torch_import.py)."""
    import numpy as np
    import torch

    from sin3dm_tpu.core import checkpoint as ckpt
    from sin3dm_tpu.models.autoencoder import init_autoencoder
    from sin3dm_tpu.models.unet import init_unet
    import jax

    enc_src = os.path.join(src, "encoding")
    diff_src = os.path.join(src, "diffusion")
    with open(os.path.join(enc_src, "args.json")) as f:
        enc_args = json.load(f)
    with open(os.path.join(diff_src, "args.json")) as f:
        diff_args = json.load(f)
    acfg = _ae_config(enc_args)
    ucfg = _unet_config(diff_args, acfg)

    enc_dst = os.path.join(dst, "encoding")
    diff_dst = os.path.join(dst, "diffusion")
    os.makedirs(enc_dst, exist_ok=True)
    os.makedirs(diff_dst, exist_ok=True)

    template = init_autoencoder(jax.random.PRNGKey(0), acfg)
    src_pth = os.path.join(enc_src, "ckpt_final.pth")
    if any(p.startswith("params/") for p in ckpt.peek_paths(src_pth)):
        params, meta = ckpt.load_subtree(src_pth, template, "params")
    else:
        params, meta = ckpt.load_pytree(src_pth, template)
    sd = ti.ae_state_dict_from_params(params, acfg,
                                      aabb=meta.get("aabb"))
    torch.save({
        "net": {k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()},
        "optimizer": {}, "scheduler": {},  # torch-specific; not exported
        "Ka": meta.get("Ka", [0, 0, 0]), "Kd": meta.get("Kd", [1, 1, 1]),
        "Ks": meta.get("Ks", [0.4, 0.4, 0.4]), "Ns": meta.get("Ns", 10),
        "aabb": meta.get("aabb", [-1, -1, -1, 1, 1, 1]),
        "featmap_size": meta.get("featmap_size", []),
    }, os.path.join(enc_dst, "ckpt_final.pth"))
    print(f"exported {src_pth}")

    utemplate = init_unet(jax.random.PRNGKey(0), ucfg)
    for src_pt in sorted(glob.glob(os.path.join(diff_src, "ema_*.pt"))):
        uparams, _ = ckpt.load_pytree(src_pt, utemplate)
        usd = ti.unet_state_dict_from_params(uparams, ucfg)
        torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                    for k, v in usd.items()},
                   os.path.join(diff_dst, os.path.basename(src_pt)))
        print(f"exported {src_pt}")

    for sub_src, sub_dst, names in (
            (enc_src, enc_dst, ("args.json", "feat.npz")),
            (diff_src, diff_dst, ("args.json",))):
        for name in names:
            p = os.path.join(sub_src, name)
            if os.path.exists(p):
                shutil.copy2(p, os.path.join(sub_dst, name))
    print(f"done: {dst} is a reference-format tag")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--src", required=True,
                    help="reference tag dir (torch checkpoints)")
    ap.add_argument("--dst", required=True, help="output tag dir")
    ap.add_argument("--threshold", type=float, default=None,
                    help="TSDF clamp when the dataset npz is unreachable")
    ap.add_argument("--reverse", action="store_true",
                    help="export OUR tag at --src to reference torch "
                         "format at --dst instead")
    args = ap.parse_args(argv)

    if args.reverse:
        export_tag(args.src, args.dst)
        return 0

    enc_src = os.path.join(args.src, "encoding")
    diff_src = os.path.join(args.src, "diffusion")
    with open(os.path.join(enc_src, "args.json")) as f:
        enc_args = json.load(f)
    with open(os.path.join(diff_src, "args.json")) as f:
        diff_args = json.load(f)

    acfg = _ae_config(enc_args)
    ucfg = _unet_config(diff_args, acfg)

    enc_dst = os.path.join(args.dst, "encoding")
    diff_dst = os.path.join(args.dst, "diffusion")
    os.makedirs(enc_dst, exist_ok=True)
    os.makedirs(diff_dst, exist_ok=True)

    # AE bundle
    thr = _find_threshold(enc_args, args.threshold)
    src_pth = os.path.join(enc_src, "ckpt_final.pth")
    ti.import_ae_ckpt(src_pth, os.path.join(enc_dst, "ckpt_final.pth"),
                      acfg, threshold=thr)
    print(f"imported {src_pth}")

    # diffusion EMA files (every rate/step present)
    emas = sorted(glob.glob(os.path.join(diff_src, "ema_*.pt")))
    if not emas:
        raise SystemExit(f"no ema_*.pt under {diff_src}")
    for src_pt in emas:
        dst_pt = os.path.join(diff_dst, os.path.basename(src_pt))
        ti.import_diffusion_ema(src_pt, dst_pt, ucfg)
        print(f"imported {src_pt}")

    # schema-identical artifacts copy verbatim
    for sub, names in ((enc_src, ("args.json", "feat.npz")),
                       (diff_src, ("args.json",))):
        dst_sub = enc_dst if sub is enc_src else diff_dst
        for name in names:
            p = os.path.join(sub, name)
            if os.path.exists(p):
                shutil.copy2(p, os.path.join(dst_sub, name))

    print(f"done: {args.dst} is ready for sin3dm_tpu.cli.sample")
    return 0


if __name__ == "__main__":
    sys.exit(main())
