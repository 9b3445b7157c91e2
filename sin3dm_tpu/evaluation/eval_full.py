"""Full evaluation driver — counterpart of the reference
`evaluation/eval_full.py:16-88`: SSFID, LP-IoU, LP-F-score, Div over
generated voxel grids, multi-view SIFID (dims 64/192) and LPIPS over
renders; one JSON of all metrics.

Weight-gated metrics degrade gracefully: geometry metrics (LP-*, Div) are
fully self-contained; SSFID/SIFID/LPIPS need pretrained torch checkpoints
(no egress here) and are skipped with a note when the paths are absent.

Usage:
    python -m sin3dm_tpu.evaluation.eval_full -s RESULT_DIR -r REF_DIR \
        [--ssfid_weights Clsshapenet_128.pth]
        [--inception_weights inception_v3.pth]
        [--alexnet_weights alexnet.pth --lpips_weights lpips_weights.ckpt]
"""

from __future__ import annotations

import argparse
import glob
import json
import os


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-s", "--src", type=str, required=True,
                        help="generated results dir (contains NNN/ subdirs)")
    parser.add_argument("-r", "--ref", type=str, required=True,
                        help="reference data dir (contains *.npz + "
                             "renderings/)")
    parser.add_argument("-o", "--output", type=str, default=None)
    # weight paths: flag > env var > conventional filename — the env vars
    # let wrapper scripts (scripts/verify_metric_parity.sh) thread paths
    # through without touching every intermediate CLI
    env = os.environ.get
    parser.add_argument("--ssfid_weights", type=str,
                        default=env("SSFID_WEIGHTS", "Clsshapenet_128.pth"))
    parser.add_argument("--inception_weights", type=str,
                        default=env("INCEPTION_WEIGHTS", "inception_v3.pth"))
    parser.add_argument("--alexnet_weights", type=str,
                        default=env("ALEXNET_WEIGHTS", "alexnet.pth"))
    parser.add_argument("--lpips_weights", type=str,
                        default=env("LPIPS_WEIGHTS", "lpips_weights.ckpt"))
    args = parser.parse_args(argv)

    from . import patch_metrics

    results = {}

    gen_vox_paths = sorted(glob.glob(os.path.join(args.src, "*",
                                                  "*voxel.npz")))
    ref_npz = sorted([p for p in glob.glob(os.path.join(args.ref, "*.npz"))
                      if "voxel" not in os.path.basename(p)])
    print(f"{len(gen_vox_paths)} generated voxel grids; ref npz: {ref_npz}")

    if gen_vox_paths and ref_npz:
        ref_grid = patch_metrics.load_sdf_npz_as_voxel(ref_npz[0])
        gen_grids = [patch_metrics.load_voxel_npz(p) for p in gen_vox_paths]

        lp = patch_metrics.eval_lp_full(gen_grids, ref_grid)
        results.update(lp)  # reference key names (`patch_utils.py:163-166`)
        # legacy aliases (avg variant) kept for earlier RESULTS entries
        results["LP_IOU"] = lp["LP-IOU-avg"]
        results["LP_F_score"] = lp["LP-F-score-avg"]
        results["Div"] = patch_metrics.eval_div(gen_grids)

        if os.path.exists(args.ssfid_weights):
            from .ssfid import eval_ssfid
            results.update(eval_ssfid(gen_vox_paths, ref_npz[0],
                                      args.ssfid_weights))
        else:
            results["SSFID_note"] = (
                f"skipped: weights '{args.ssfid_weights}' not found")

    gen_render_dirs = sorted(glob.glob(os.path.join(args.src, "*",
                                                    "renderings")))
    ref_render_dir = os.path.join(args.ref, "renderings")
    if gen_render_dirs and os.path.isdir(ref_render_dir):
        if os.path.exists(args.inception_weights):
            from .sifid import calculate_multiview_sifid
            for dims in (64, 192):
                results.update(calculate_multiview_sifid(
                    gen_render_dirs, ref_render_dir,
                    args.inception_weights, dims=dims))
        else:
            results["sifid_note"] = (
                f"skipped: weights '{args.inception_weights}' not found")
        if (os.path.exists(args.alexnet_weights)
                and os.path.exists(args.lpips_weights)):
            from .lpips import calculate_multiview_lpips
            results.update(calculate_multiview_lpips(
                gen_render_dirs, args.alexnet_weights, args.lpips_weights))
        else:
            results["lpips_note"] = "skipped: alexnet/lpips weights not found"

    out_path = args.output or os.path.join(args.src, "eval_results.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))
    return results


if __name__ == "__main__":
    main()
