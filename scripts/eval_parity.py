#!/usr/bin/env python
"""Eval-metric parity harness CLI.

Compares the JAX SSFID/SIFID/LPIPS networks against the REFERENCE torch
modules on identical inputs (activations < 1e-4, Fréchet relative error
< 1e-6, full LPIPS scalar).  Pass the real checkpoints when available;
without them, synthetic random state dicts with the exact architecture
shapes are used (shape/transpose loader bugs do not depend on values).

    python scripts/eval_parity.py \
        [--clsshapenet Clsshapenet_128.pth] [--inception inception_v3.pth] \
        [--alexnet alexnet.pth] [--lpips_ckpt lpips_weights.ckpt] [--full]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")

    ap = argparse.ArgumentParser()
    ap.add_argument("--clsshapenet", default=None)
    ap.add_argument("--inception", default=None)
    ap.add_argument("--alexnet", default=None)
    ap.add_argument("--lpips_ckpt", default=None)
    ap.add_argument("--full", action="store_true",
                    help="reference-scale inputs (128^3 voxel, 299/512 px)")
    args = ap.parse_args()

    from sin3dm_tpu.evaluation.parity import run_all
    res = run_all(args.clsshapenet, args.inception, args.alexnet,
                  args.lpips_ckpt, full_size=args.full)
    for k in ("clsshapenet", "inception", "alexnet", "lpips_ckpt"):
        p = getattr(args, k)
        res.setdefault("weights", {})[k] = (
            "real" if p and os.path.exists(p) else "synthetic")
    print(json.dumps(res, indent=2))

    ok = (res["ssfid"]["act_max_abs_err"] < 1e-4
          and res["ssfid"]["frechet_rel_err"] < 1e-6
          and res["sifid"]["act_max_abs_err_dim64"] < 1e-4
          and res["sifid"]["act_max_abs_err_dim192"] < 1e-4
          and res["lpips"]["abs_err"] < 1e-5)
    print("PARITY OK" if ok else "PARITY FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
