#!/bin/bash
# Seed-sweep the reference-oracle differential harness: re-run every
# torch-vs-Flax parity test (model forwards, converter, losses, training
# differentials, the reference's own eval host code) on FRESH oracle
# weights and inputs.  MPN_ORACLE_SEED=k shifts every seed by k*1000
# (tests/reference_oracle.py); seed 0 is the pinned CI configuration that
# the normal suite runs.
#
# Usage: tools/fuzz_reference_parity.sh [N_SEEDS]   (default 5)
# Exits nonzero on the first seed with a parity failure.
set -u
N=${1:-5}
REPO=$(cd "$(dirname "$0")/.." && pwd)
export PYTHONPATH=$REPO:${PYTHONPATH:-}
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache}
cd "$REPO"

for k in $(seq 1 "$N"); do
  echo "=== oracle fuzz: MPN_ORACLE_SEED=$k ==="
  MPN_ORACLE_SEED=$k python -m pytest -q \
    tests/test_reference_parity.py \
    tests/test_reference_eval_parity.py \
    tests/test_reference_train_parity.py || exit 1
done
echo "=== oracle fuzz: all $N seeds green ==="
