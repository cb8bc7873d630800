#!/bin/bash
# One-shot TPU re-validation after a worker restart: kernel-shape sanity,
# then the two production benches, then the raw-piece-size experiment.
# Usage: bash scripts/tpu_revalidate.sh [logdir]
set -u
LOG=${1:-/tmp/tpu_reval}
mkdir -p "$LOG"
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

run() {
  name=$1; shift
  echo "== $name: $*" | tee -a "$LOG/summary.txt"
  timeout 2400 "$@" > "$LOG/$name.log" 2>&1
  rc=$?
  tail -2 "$LOG/$name.log" | tee -a "$LOG/summary.txt"
  echo "rc=$rc" | tee -a "$LOG/summary.txt"
  return $rc
}

run alive python -c "import jax, jax.numpy as jnp; print('alive', float((jnp.ones((8,128))+1).sum()))" || exit 1
run shape_tz python scripts/bench_family_shapes.py tz || exit 1
run shape_c6 python scripts/bench_family_shapes.py c6 || exit 1
run bench_lts python scripts/bench_lts.py
run bench_fine python bench.py
ESR_GATHER_PIECE_RAW=393216 run costlaw_p4 python scripts/bench_gather_costlaw.py
echo "DONE" | tee -a "$LOG/summary.txt"
