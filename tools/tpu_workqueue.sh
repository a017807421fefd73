#!/bin/bash
# One-shot capture of every TPU measurement this round is blocked on.
# Run it the moment the axon tunnel is back up (tools/../tmp tunnel probe
# writes "UP" to /tmp/tunnel_status.log). Items run strictly sequentially
# (only one process can use the TPU) and each is bounded, so a mid-queue
# tunnel loss costs one item, not the queue.
#
#   bash tools/tpu_workqueue.sh [outdir]   # default /tmp/q
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/q}
mkdir -p "$OUT"

run() { # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a "$OUT/queue.log"
  timeout "$t" "$@" >"$OUT/$name.log" 2>&1
  echo "rc=$? $name" | tee -a "$OUT/queue.log"
}

# 0. fast tunnel sanity (bench.py watchdog would also catch it)
run probe 120 python -c "import jax; print(jax.devices())" || true

# 1. headline + int8 bench
run bench 900 python bench.py
run bench_int8 900 python bench.py --int8

# 2. MFU: FLOPs/pair (cost analysis) x measured pairs/s
PAIRS=$(grep -o '"value": [0-9.]*' "$OUT/bench.log" | head -1 | grep -o '[0-9.]*')
run mfu 600 python tools/mfu.py --pairs-per-s "${PAIRS:-0}"

# 3. per-block remat table: temp-HBM + ms/step, flagship @640
for bs in 8 16; do
  for r in none blocks; do
    run "remat_${r}_bs${bs}" 1500 python tools/bench_train.py \
        --remat "$r" --batch "$bs" --steps 20
  done
done

# 4. @640 device-aug A/B: both legs (the round-3 device leg lived in /tmp
#    and did not survive the VM reset)
run ab640 10800 python tools/ab_device_aug.py --epochs 20 \
    --out /tmp/ab_devaug

echo "QUEUE DONE $(date +%H:%M:%S)" | tee -a "$OUT/queue.log"
