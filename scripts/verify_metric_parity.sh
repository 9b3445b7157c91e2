#!/usr/bin/env bash
# One-command real-weight metric validation — run the moment the eval
# checkpoints exist (scripts/fetch_eval_weights.sh documents how to get
# them into $WEIGHTS_DIR).  Two stages:
#
#  1. evaluation.parity.run_all --full with the REAL weights: proves the
#     JAX SSFID/SIFID/LPIPS towers reproduce the reference torch modules
#     at reference scale (128^3 voxels, 299/512 px images).
#  2. eval50 SSFID: re-runs the canonical 50-sample evaluation with SSFID
#     enabled, closing the BASELINE "SSFID within 2%" contract.
#
#   scripts/verify_metric_parity.sh [WEIGHTS_DIR]   # default ./eval_weights
set -euo pipefail

PROJ_DIR=$(cd "$(dirname "$0")/.." && pwd)
export PYTHONPATH=$PROJ_DIR:${PYTHONPATH:-}
DIR=${1:-eval_weights}

CLS="$DIR/Clsshapenet_128.pth"
INC="$DIR/inception_v3_google-0cc3c7bd.pth"
ALEX="$DIR/alexnet-owt-7be5be79.pth"
LPIPS=${LPIPS_CKPT:-/root/reference/evaluation/lpips_weights.ckpt}

for f in "$CLS" "$INC" "$ALEX" "$LPIPS"; do
    [ -f "$f" ] || { echo "missing $f — run scripts/fetch_eval_weights.sh" >&2; exit 1; }
done

echo "== stage 0: full-DRIVER parity, synthetic weights (always runs) =="
# the reference's own torch SSFID/LP/Div driver vs our eval_full on the
# committed 16-sample voxel set — asserts metric-level agreement
# (artifacts/eval_driver_parity.json); regenerate the sample set with
#   python -m sin3dm_tpu.cli.sample --tag checkpoints/towerruins \
#       --n_samples 16 --vox --reso 256 --output results_parity
# and the dataset npz with sin3dm_tpu.dataio.mesh_sampler on
# /root/reference/data/towerruins/mesh/model.obj (reso 256).
if [ -d "$PROJ_DIR/checkpoints/towerruins/results_parity" ] \
        && [ -f "$PROJ_DIR/data/towerruins/towerruins.npz" ]; then
    python "$PROJ_DIR/scripts/eval_driver_parity.py" \
        -s "$PROJ_DIR/checkpoints/towerruins/results_parity" \
        -r "$PROJ_DIR/data/towerruins"
else
    echo "  (skipped: sample set or dataset npz missing)"
fi

echo "== stage 1: full-scale network parity (real weights) =="
python "$PROJ_DIR/scripts/eval_parity.py" --full \
    --clsshapenet "$CLS" --inception "$INC" \
    --alexnet "$ALEX" --lpips_ckpt "$LPIPS"

echo "== stage 2: canonical 50-sample eval with SSFID =="
# eval_full picks up the classifier path via env (see evaluation/eval_full.py)
export SSFID_WEIGHTS="$CLS" INCEPTION_WEIGHTS="$INC" ALEXNET_WEIGHTS="$ALEX"
export LPIPS_WEIGHTS="$LPIPS"
exec "$PROJ_DIR/scripts/eval50.sh"
