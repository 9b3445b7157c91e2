"""FULL-DRIVER eval parity vs the reference, synthetic weights.

Runs the reference's own torch evaluation driver functions
(`/root/reference/evaluation/ssfid.py:81`, `patch_utils.py:125,169`) AND
our `sin3dm_tpu.evaluation.eval_full` on the SAME generated sample set,
with the SAME synthetic SSFID classifier weights, and asserts
metric-level agreement — closing the gap between activation-level parity
(scripts/eval_parity.py) and the numbers a user actually reads
(VERDICT r4 next #4).

Scope note: the reference's SIFID/LPIPS paths import torchvision, which
is not in this image — those metrics are covered by the metric-level
comparisons in `sin3dm_tpu/evaluation/parity.py` (full LPIPS scalar,
Fréchet on inception activations) instead.  This driver comparison
covers every voxel metric end-to-end: SSFID (avg+std), LP-IoU,
LP-F-score (avg+percent), Div.

    python scripts/eval_driver_parity.py -s RESULT_DIR -r REF_DIR \
        [-o artifacts/eval_driver_parity.json]

RESULT_DIR holds per-sample dirs with voxel.npz (cli.sample output);
REF_DIR holds the training npz (dataset dir).
"""

import argparse
import glob
import json
import os
import sys
import tempfile

PROJ = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, PROJ)
REF_EVAL = "/root/reference/evaluation"


def run_reference(gen_vox_paths, ref_npz, weights_path):
    """The reference torch driver pieces, invoked exactly as
    `eval_full.py:43-88` does."""
    sys.path.insert(0, REF_EVAL)
    try:
        import patch_utils as ref_patch
        import ssfid as ref_ssfid
    finally:
        sys.path.remove(REF_EVAL)

    # eval_SSFID_given_paths hardcodes ./Clsshapenet_128.pth
    cwd = os.getcwd()
    with tempfile.TemporaryDirectory() as d:
        os.link(weights_path, os.path.join(d, "Clsshapenet_128.pth"))
        os.chdir(d)
        try:
            res = dict(ref_ssfid.eval_SSFID_given_paths(
                gen_vox_paths, ref_npz, model_out_layer=2, device="cpu"))
        finally:
            os.chdir(cwd)
    res.update(ref_patch.eval_LP_given_paths(gen_vox_paths, ref_npz))
    res.update(ref_patch.eval_Div_given_paths(gen_vox_paths))
    return {k: float(v) for k, v in res.items()}


def run_ours(src, ref_dir, weights_path, out_json):
    from sin3dm_tpu.evaluation import eval_full
    return eval_full.main(["-s", src, "-r", ref_dir,
                           "--ssfid_weights", weights_path,
                           "-o", out_json])


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-s", "--src", required=True)
    ap.add_argument("-r", "--ref", required=True)
    ap.add_argument("-o", "--output",
                    default=os.path.join(PROJ, "artifacts",
                                         "eval_driver_parity.json"))
    ap.add_argument("--seed", type=int, default=0,
                    help="synthetic classifier weight seed")
    args = ap.parse_args(argv)

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")
    import torch

    from sin3dm_tpu.evaluation import parity

    # absolute paths: run_reference chdirs for the hardcoded weights name
    args.src = os.path.abspath(args.src)
    args.ref = os.path.abspath(args.ref)
    gen_vox_paths = sorted(glob.glob(os.path.join(args.src, "*",
                                                  "*voxel.npz")))
    ref_npz = sorted([p for p in glob.glob(os.path.join(args.ref, "*.npz"))
                      if "voxel" not in os.path.basename(p)])
    if not gen_vox_paths or not ref_npz:
        raise SystemExit(f"need voxel.npz under {args.src}/* and a dataset "
                         f"npz in {args.ref}")
    print(f"{len(gen_vox_paths)} generated grids vs {ref_npz[0]}")

    with tempfile.TemporaryDirectory() as d:
        weights = os.path.join(d, "Clsshapenet_128.pth")
        torch.save(parity.synth_clsshapenet_state_dict(args.seed), weights)

        theirs = run_reference(gen_vox_paths, ref_npz[0], weights)
        ours = run_ours(args.src, args.ref, weights,
                        os.path.join(d, "ours.json"))

    pairs = {
        # our key -> reference key, relative tolerance
        "SSFID_avg": ("SSFID_avg", 2e-3),
        "SSFID_std": ("SSFID_std", 2e-2),
        "LP-IOU-avg": ("LP-IOU-avg", 1e-4),
        "LP-IOU-percent": ("LP-IOU-percent", 2e-3),
        "LP-F-score-avg": ("LP-F-score-avg", 1e-4),
        "LP-F-score-percent": ("LP-F-score-percent", 2e-3),
        "Div": ("Div", 1e-4),
    }
    report = {"n_samples": len(gen_vox_paths), "reference_torch": theirs,
              "ours_jax": {k: ours.get(k) for k in pairs}, "checks": {}}
    failures = []
    for ok, (tk, tol) in pairs.items():
        if tk not in theirs or ok not in ours:
            continue  # percent variants only exist when patch_num applies
        a, b = float(ours[ok]), float(theirs[tk])
        rel = abs(a - b) / max(abs(b), 1e-9)
        report["checks"][ok] = {"ours": a, "reference": b,
                                "rel_err": rel, "tol": tol,
                                "pass": bool(rel <= tol)}
        if rel > tol:
            failures.append(f"{ok}: ours {a} vs reference {b} "
                            f"(rel {rel:.2e} > {tol})")
    os.makedirs(os.path.dirname(args.output), exist_ok=True)
    with open(args.output, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report["checks"], indent=2))
    if failures:
        raise SystemExit("DRIVER PARITY FAILED:\n" + "\n".join(failures))
    print(f"driver parity OK -> {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
