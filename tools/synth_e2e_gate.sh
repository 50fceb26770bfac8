#!/bin/bash
# Synthetic end-to-end regression gate: the full 3-stage staged-training
# recipe + 5-scale+flip coco-eval, shrunk (resnet50, 240^2/320^2, 128
# train / 16 val images) and ASSERTING an OKS AP floor on the synthetic
# val split.  Measured round 3 on the tunneled v5e: PASS, AP=0.630, ~95
# min wall COLD (per-shape remote compiles dominate; a warm
# JAX_COMPILATION_CACHE_DIR cuts it to roughly a third).
#
# This is the runnable-every-round distillation of tools/train_synth_e2e.sh
# (resnet101, 480^2, ~143 min, scored AP 0.863): it exercises the exact
# bug class that run caught — staged checkpoint init (params + BN running
# stats), freeze masks, LR plateau, the eval protocol — and fails loudly
# if any regresses.  The reference's analogous oracle is its published AP
# table (README.md:38-51), which needs real COCO; this needs nothing but
# the repo.
#
# Usage: tools/synth_e2e_gate.sh [DATA_ROOT] [SAVE_DIR] [AP_FLOOR]
# Exit 0 iff every stage trains AND final AP >= AP_FLOOR (default 0.60 —
# measured 0.643 on the tunneled v5e, round 4; a >6.7% AP regression
# fails the default gate) AND the coco-eval pass emitted zero
# capacity-truncation warnings (escalation makes truncation impossible
# by design — enforce it; INFO "re-dispatching" escalation lines are the
# intended path and do NOT fail the gate).
#
# GATE_PRECISION=f32 drops --bf16 from stages 1-2 (the bf16-training AP
# control: same data, same recipe, f32 params/compute — record dAP vs
# the bf16-trained checkpoint in docs/PERF.md).
set -u
ROOT=${1:-/tmp/mpn_gate_coco}
SAVE=${2:-/tmp/mpn_gate_models}
FLOOR=${3:-0.60}
BF16_FLAG=--bf16
[ "${GATE_PRECISION:-bf16}" = f32 ] && BF16_FLAG=
REPO=$(cd "$(dirname "$0")/.." && pwd)
export PYTHONPATH=$REPO:${PYTHONPATH:-}
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache}
cd "$REPO"

# dataset v2: 30% CROWD scenes (6-10 small overlapping figures) so the PRN
# fallback/contention branches AND the evaluator's crowd-capacity
# escalation run under the gate; the marker regenerates stale v1 data
[ -f "$ROOT/.v2_crowds" ] || { python tools/make_synth_pose_dataset.py \
    --root "$ROOT" --n-train 128 --n-val 16 --width 320 --height 240 \
    --crowd-frac 0.3 && touch "$ROOT/.v2_crowds"; } || exit 1

# newest best-copy = lowest val loss; sort on the BASENAME (the save dir
# path may itself contain underscores and would shift the sort field)
best() { ls "$SAVE/$1" | grep '\.best$' | sort -t_ -k2 -n | tail -1 \
         | sed "s|^|$SAVE/$1/|"; }

# stage 1: keypoint subnet (shrunk from the reference recipe,
# multipose_keypoint_train.py:107-113)
python -m multiposenet_tpu.cli train --subnet keypoint \
  --coco-root "$ROOT" --backbone resnet50 $BF16_FLAG --inp-size 240 \
  --batch-size 16 --max-epoch 30 --num-workers 4 \
  --save-dir "$SAVE" --exp-name kp || exit 1

# stage 2: detection subnet from the stage-1 best checkpoint — exercises
# the params+batch_stats staged restore (the round-2 BN bug's trigger)
python -m multiposenet_tpu.cli train --subnet detection \
  --coco-root "$ROOT" --backbone resnet50 $BF16_FLAG --inp-size 320 \
  --batch-size 8 --lr 1e-4 --max-epoch 16 --num-workers 4 \
  --save-dir "$SAVE" --exp-name det --init-params "$(best kp)" || exit 1

# stage 3: PRN
python -m multiposenet_tpu.cli train --subnet prn \
  --coco-root "$ROOT" --backbone resnet50 \
  --batch-size 8 --lr 1e-3 --max-epoch 12 --num-workers 4 \
  --save-dir "$SAVE" --exp-name prn --init-params "$(best det)" || exit 1

# full multi-scale + flip protocol on the synthetic val split + AP floor.
# Base capacities are deliberately LOW (8 peaks/joint, 8 people) so the
# 6-10-person crowd scenes SATURATE them and the escalation tiers
# (re-dispatch at cfg.peaks.escalate_max_peaks / prn.escalate_max_people)
# run under the gate — output must match unbounded processing, so the AP
# floor also guards the escalation path.
python -m multiposenet_tpu.cli coco-eval \
  --coco-root "$ROOT" --backbone resnet50 --ckpt "$(best prn)" \
  --max-peaks 8 --max-people 8 \
  --result-file "$SAVE/gate_results.json" \
  --metrics-file "$SAVE/gate_metrics.json" 2>&1 \
  | tee "$SAVE/coco_eval.log"
[ "${PIPESTATUS[0]}" = 0 ] || exit 1

# AP floor + zero-truncation assert (escalation must have re-dispatched
# every saturated crowd image; see check_ap_floor.py docstring)
python tools/check_ap_floor.py "$SAVE/gate_metrics.json" "$FLOOR" \
  "$SAVE/coco_eval.log" || exit 1

# AP-evidence ablation matrix on the freshly trained checkpoint: every
# bounded eval-path toggle (bf16, fold-bn, host chain, XLA NMS, host
# grouping) must stay within |dAP| <= 0.02 of the default device path —
# protocol-level evidence for each numerics-only default (tools/
# ap_ablation.py; VERDICT r3 item 1).  ABLATIONS=0 skips.
if [ "${ABLATIONS:-1}" = 1 ]; then
  python tools/ap_ablation.py --coco-root "$ROOT" --ckpt "$(best prn)" \
    --backbone resnet50 --out-dir "$SAVE/ablation" --assert-tol 0.02 || exit 1
fi
