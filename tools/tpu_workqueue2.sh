#!/bin/bash
# Follow-up TPU measurement queue (run after tools/tpu_workqueue.sh drains):
# bs32 training with per-block remat — PERF.md round-4 named this the obvious
# next probe (bs32 temp-HBM ~10 GiB without remat; bs16-none showed batch
# still amortizes). Inference bs24/32 is NOT here: batch-32 inference was
# measured-closed round 2 ("throughput flat").
#
#   bash tools/tpu_workqueue2.sh [outdir]   # default /tmp/q2
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/q2}
mkdir -p "$OUT"

run() { # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a "$OUT/queue.log"
  timeout "$t" "$@" >"$OUT/$name.log" 2>&1
  echo "rc=$? $name" | tee -a "$OUT/queue.log"
}

run probe 120 python -c "import jax; print(jax.devices())" || true

# bs32 remat probe (blocks first; none is expected to OOM — try it second)
run remat_blocks_bs32 2400 python tools/bench_train.py \
    --remat blocks --batch 32 --steps 20
run remat_none_bs32 2400 python tools/bench_train.py \
    --remat none --batch 32 --steps 20

echo "QUEUE2 DONE $(date +%H:%M:%S)" | tee -a "$OUT/queue.log"
