#!/usr/bin/env python
"""Cross-check our LP implementation against the reference torch one at
canonical scale (VERDICT r3 item 1c).

Runs BOTH implementations on the same inputs — the 50 canonical
`voxel.npz` samples (checkpoints/towerruins/results50) vs the towerruins
training npz — and reports all four LP metrics plus Div side by side.

The reference protocol subsamples 1000 random gen patches per shape
(`patch_utils.py:144-147`); to compare implementations (not sampling
noise) the reference run here disables the subsample (patch_num=10**9,
i.e. shuffle-then-take-all).  The default-protocol reference numbers are
also printed for the record.

    python scripts/lp_crosscheck.py [--src DIR] [--ref NPZ] [--fast]
"""

import argparse
import glob
import importlib.util
import json
import os
import sys

PROJ = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, PROJ)
_REF_EVAL = "/root/reference/evaluation"


def _import_ref_patch_utils():
    spec = importlib.util.spec_from_file_location(
        "ref_patch_utils", os.path.join(_REF_EVAL, "patch_utils.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.path.insert(0, _REF_EVAL)
    try:
        spec.loader.exec_module(mod)
    finally:
        sys.path.remove(_REF_EVAL)
    return mod


def main():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default=os.path.join(
        PROJ, "checkpoints/towerruins/results50"))
    ap.add_argument("--ref", default=os.path.join(
        PROJ, "data/towerruins/towerruins.npz"))
    ap.add_argument("--fast", action="store_true",
                    help="first 8 samples only (smoke)")
    args = ap.parse_args()

    paths = sorted(glob.glob(os.path.join(args.src, "*", "voxel.npz")))
    if args.fast:
        paths = paths[:8]
    assert paths, f"no voxel.npz under {args.src}"
    print(f"{len(paths)} generated grids vs {args.ref}", flush=True)

    rpu = _import_ref_patch_utils()

    # --- reference torch implementation, subsample disabled -------------
    ref_all = rpu.eval_LP_given_paths(paths, args.ref, patch_num=10**9)
    ref_all.update(rpu.eval_Div_given_paths(paths))
    # --- reference torch implementation, canonical protocol -------------
    ref_1000 = rpu.eval_LP_given_paths(paths, args.ref, patch_num=1000)

    # --- ours ------------------------------------------------------------
    from sin3dm_tpu.evaluation import patch_metrics as pm
    ref_grid = pm.load_sdf_npz_as_voxel(args.ref)
    gen_grids = [pm.load_voxel_npz(p) for p in paths]
    ours = pm.eval_lp_full(gen_grids, ref_grid)
    ours["Div"] = pm.eval_div(gen_grids)

    diffs = {k: abs(float(ours[k]) - float(ref_all[k]))
             for k in ("LP-IOU-avg", "LP-IOU-percent",
                       "LP-F-score-avg", "LP-F-score-percent", "Div")}
    out = {"n_samples": len(paths),
           "reference_torch_all_patches": {k: float(v)
                                           for k, v in ref_all.items()},
           "reference_torch_protocol_1000": {k: float(v)
                                             for k, v in ref_1000.items()},
           "ours_jax_all_patches": ours,
           "abs_diff_vs_reference": diffs}
    print(json.dumps(out, indent=2))
    ok = max(diffs.values()) < 2e-3
    print("LP CROSSCHECK OK" if ok else "LP CROSSCHECK DIVERGED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
