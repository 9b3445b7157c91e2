#!/usr/bin/env bash
# Canonical-scale evaluation on an EXISTING checkpoint (the sample/render/
# eval tail of run_single.sh): 50 samples, 50k faces, DDPM-1000 — the
# reference recipe's scale (`/root/reference/scripts/run_single.sh:34-38`)
# without retraining.
set -e

PROJ_DIR=$(cd "$(dirname "$0")/.." && pwd)
export PYTHONPATH=$PROJ_DIR:${PYTHONPATH:-}

EXP_DIR=${EXP_DIR:-$PROJ_DIR/checkpoints/towerruins}
DATA_PATH=${DATA_PATH:-$PROJ_DIR/data/towerruins/towerruins.npz}
BLENDER_PATH=${BLENDER_PATH:-soft}   # "soft" -> built-in rasterizer
N_SAMPLES=${N_SAMPLES:-50}
OUT=${OUT:-results50}

python -m sin3dm_tpu.cli.sample \
    --tag "$EXP_DIR" \
    --n_samples "$N_SAMPLES" \
    --n_faces 50000 \
    --output "$OUT"

RESULT_DIR=$EXP_DIR/$OUT

python "$PROJ_DIR/rendering/mvrender_script.py" -s "$RESULT_DIR" \
    -bl "$BLENDER_PATH"

python -m sin3dm_tpu.evaluation.eval_full \
    -s "$RESULT_DIR" -r "$(dirname "$DATA_PATH")"
