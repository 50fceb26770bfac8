#!/bin/bash
# One-command real-data AP parity run (docs/ROADMAP.md item 1; target:
# the reference's published table, /root/reference/README.md:38-51 and
# BASELINE.md AP 0.590).  The moment real COCO val2017 + the reference's
# ckpt_baseline_resnet101.h5 exist, this single command produces the
# parity verdict:
#
#   tools/real_parity_runbook.sh COCO_ROOT REF_CKPT.h5 [OUT_DIR]
#
#   1. convert the torch h5 into this repo's orbax layout
#      (tools/convert_torch_ckpt.py — forward parity of the conversion is
#      differential-tested in tests/test_reference_parity.py)
#   2. precompile the multi-scale shape set for EVERY eval mode
#   3. coco-eval three ways: the fast device-default path, the
#      reference-exact host chain (f32, host resize/peaks/grouping), and
#      the bf16 serving path (--bf16; the production inference dtype)
#   4. diff the 10 OKS stats: fast vs reference-exact (strict, plus the
#      published-baseline floor) and bf16 vs fast (mode-tol 0.01 — the
#      measured synth-gate bf16 eval drift is < 0.007, docs/PERF.md)
#      via tools/diff_parity_metrics.py; non-zero exit on disagreement
#
# Env overrides:
#   BACKBONE=resnet101   MAX_IMAGES=     (limit, for smoke runs)
#   DRY_RUN=1            (synthetic stand-in data: skip the baseline
#                         comparison, keep the mode-agreement check)
#   EXTRA_EVAL_FLAGS=    (appended to precompile AND coco-eval, e.g.
#                         "--inp-size 96" for cheap smoke runs)
#   JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache (default; cold TPU compiles
#                         are minutes per shape, cached ones instant)
set -u
COCO=${1:?usage: real_parity_runbook.sh COCO_ROOT REF_CKPT.h5 [OUT_DIR]}
H5=${2:?missing reference checkpoint h5 (ckpt_baseline_resnet101.h5)}
OUT=${3:-/tmp/mpn_parity}
BACKBONE=${BACKBONE:-resnet101}
REPO=$(cd "$(dirname "$0")/.." && pwd)
export PYTHONPATH=$REPO:${PYTHONPATH:-}
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache}
cd "$REPO"
mkdir -p "$OUT"

MI=(${EXTRA_EVAL_FLAGS:-})
[ -n "${MAX_IMAGES:-}" ] && MI+=(--max-images "$MAX_IMAGES")
REF_FLAGS=(--host-resize --host-peaks --host-image-resize --host-grouping)

python tools/convert_torch_ckpt.py "$H5" "$OUT/ckpt" \
    --backbone "$BACKBONE" || exit 1

for mode in fast ref bf16; do
  FLAGS=()
  [ "$mode" = ref ] && FLAGS=("${REF_FLAGS[@]}")
  [ "$mode" = bf16 ] && FLAGS=(--bf16)
  python -m multiposenet_tpu.cli precompile \
      --coco-root "$COCO" --backbone "$BACKBONE" --ckpt "$OUT/ckpt" \
      "${MI[@]}" "${FLAGS[@]}" || exit 1
  python -m multiposenet_tpu.cli coco-eval \
      --coco-root "$COCO" --backbone "$BACKBONE" --ckpt "$OUT/ckpt" \
      "${MI[@]}" "${FLAGS[@]}" \
      --result-file "$OUT/results_$mode.json" \
      --metrics-file "$OUT/metrics_$mode.json" || exit 1
done

DIFF_FLAGS=()
[ -n "${DRY_RUN:-}" ] && DIFF_FLAGS=(--no-baseline)
python tools/diff_parity_metrics.py \
    "$OUT/metrics_fast.json" "$OUT/metrics_ref.json" \
    --baseline-ap 0.590 "${DIFF_FLAGS[@]}" || exit 1

# bf16 serving mode vs the f32 device default: numerics-only toggle, bound
# at 0.01 (synth-gate ablation measured < 0.007); no baseline re-check
echo "== bf16 vs fast =="
python tools/diff_parity_metrics.py \
    "$OUT/metrics_bf16.json" "$OUT/metrics_fast.json" \
    --mode-tol 0.01 --no-baseline
