#!/usr/bin/env bash
# Post-training quality evaluation for a trained tag (run from anywhere):
#   TAG=/tmp/tr_full DATA_DIR=/tmp scripts/quality_eval.sh
# Samples N shapes (DDPM-1000), decodes meshes, renders gen + reference
# with the same renderer, and runs the metric suite.
set -e
PROJ_DIR=$(cd "$(dirname "$0")/.." && pwd)
export PYTHONPATH=$PROJ_DIR:/root/.axon_site

TAG=${TAG:-/tmp/tr_full}
DATA_DIR=${DATA_DIR:-/tmp}          # dir containing the training .npz
N=${N:-8}
OUT=${OUT:-results_eval}

cd "$(dirname "$TAG")"
python -m sin3dm_tpu.cli.sample --tag "$(basename "$TAG")" \
    --n_samples "$N" --output "$OUT" --reso 256 --n_faces 10000 \
    --texreso 2048 --copy_mtl false

# renders (software rasterizer: same camera protocol for both sides)
python "$PROJ_DIR/rendering/mvrender_script.py" -s "$TAG/$OUT" -bl soft
mkdir -p "$DATA_DIR/renderings"
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python - <<EOF
from sin3dm_tpu.rendering.softraster import render_multiview
render_multiview("/root/reference/data/towerruins/mesh/model.obj",
                 "$DATA_DIR/renderings")
EOF

python -m sin3dm_tpu.evaluation.eval_full -s "$TAG/$OUT" -r "$DATA_DIR"
