#!/bin/bash
# End-to-end 3-stage training + coco-eval on the synthetic learnable pose
# dataset (tools/make_synth_pose_dataset.py) — the full reference recipe
# (multipose_{keypoint,detection,prn}_train.py + multipose_coco_eval.py)
# through this framework's CLI on one TPU chip.
#
# Usage: tools/train_synth_e2e.sh [DATA_ROOT] [SAVE_DIR]
# Produces $SAVE_DIR/{kp,det,prn}/ checkpoints, eval results + AP summary
# on the synthetic val split.
set -u
ROOT=${1:-/tmp/mpn_synth_coco}
SAVE=${2:-/tmp/mpn_synth_models}
REPO=$(cd "$(dirname "$0")/.." && pwd)
export PYTHONPATH=$REPO:${PYTHONPATH:-}
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache}
cd "$REPO"

[ -f "$ROOT/COCO.json" ] || python tools/make_synth_pose_dataset.py \
    --root "$ROOT" --n-train 320 --n-val 48

# newest best-copy = lowest val loss; sort on the BASENAME (the save dir
# path may itself contain underscores and would shift the sort field)
best() { ls "$SAVE/$1" | grep '\.best$' | sort -t_ -k2 -n | tail -1 \
         | sed "s|^|$SAVE/$1/|"; }

# stage 1: keypoint subnet (reference: Adam 1e-4, 480^2;
# multipose_keypoint_train.py:107-113)
python -m multiposenet_tpu.cli train --subnet keypoint \
  --coco-root "$ROOT" --backbone resnet101 --bf16 --inp-size 480 \
  --batch-size 16 --max-epoch 60 --num-workers 4 \
  --save-dir "$SAVE" --exp-name kp || exit 1

# stage 2: detection subnet from the stage-1 checkpoint (reference: 608^2,
# lr 1e-5 from a *trained* baseline, multipose_detection_train.py:44-53;
# the RetinaNet head starts fresh here so lr=1e-4)
python -m multiposenet_tpu.cli train --subnet detection \
  --coco-root "$ROOT" --backbone resnet101 --bf16 --inp-size 608 \
  --batch-size 8 --lr 1e-4 --max-epoch 30 --num-workers 4 \
  --save-dir "$SAVE" --exp-name det --init-params "$(best kp)" || exit 1

# stage 3: PRN (reference: Adam 1e-3, multipose_prn_train.py:36-47)
python -m multiposenet_tpu.cli train --subnet prn \
  --coco-root "$ROOT" --backbone resnet101 \
  --batch-size 8 --lr 1e-3 --max-epoch 20 --num-workers 4 \
  --save-dir "$SAVE" --exp-name prn --init-params "$(best det)" || exit 1

# full multi-scale + flip coco-eval on the synthetic val split
python -m multiposenet_tpu.cli coco-eval \
  --coco-root "$ROOT" --backbone resnet101 --ckpt "$(best prn)" \
  --result-file "$SAVE/synth_eval_results.json"
