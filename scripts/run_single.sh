#!/usr/bin/env bash
# Canonical single-shape run (counterpart of the reference
# scripts/run_single.sh): preprocess -> train -> sample -> render -> eval.
set -e

PROJ_DIR=$(cd "$(dirname "$0")/.." && pwd)
export PYTHONPATH=$PROJ_DIR

OBJ_PATH=${OBJ_PATH:-$PROJ_DIR/data/towerruins/mesh/model.obj}
DATA_PATH=${DATA_PATH:-$PROJ_DIR/data/towerruins/towerruins.npz}
BLENDER_PATH=${BLENDER_PATH:-soft}   # "soft" -> built-in rasterizer

# 1. preprocess
python -m sin3dm_tpu.dataio.mesh_sampler \
    -s "$OBJ_PATH" -d "$DATA_PATH" --n_surf 5000000 --watertight

# 2. render reference views for SIFID/LPIPS
python "$PROJ_DIR/rendering/mvrender_script.py" \
    -s "$(dirname "$OBJ_PATH")" -bl "$BLENDER_PATH" || true

# 3. train (autoencoder + diffusion).  STEPS_PER_CALL fuses K optimizer
# steps into one XLA dispatch — essential on high-RTT device links
# (remote/tunneled chips); harmless locally.
STEPS_PER_CALL=${STEPS_PER_CALL:-20}
DATA_TAG=$(basename "$DATA_PATH" .npz)
EXP_DIR=checkpoints/$DATA_TAG
python -m sin3dm_tpu.cli.train \
    --tag "$EXP_DIR" \
    --data_path "$DATA_PATH" \
    --predict_xstart True \
    --enc_net_type skip \
    --enc_lr_decay 0.1 \
    --enc_lr_split 0.2 \
    --steps_per_call "$STEPS_PER_CALL"

# 4. sample
python -m sin3dm_tpu.cli.sample \
    --tag "$EXP_DIR" \
    --n_samples 50 \
    --n_faces 50000 \
    --output results50

RESULT_DIR=$EXP_DIR/results50

# 5. render generated views
python "$PROJ_DIR/rendering/mvrender_script.py" -s "$RESULT_DIR" \
    -bl "$BLENDER_PATH"

# 6. evaluate
python -m sin3dm_tpu.evaluation.eval_full \
    -s "$RESULT_DIR" -r "$(dirname "$DATA_PATH")"
