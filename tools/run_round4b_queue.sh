#!/bin/bash
# Round-4 follow-up queue: trp-cage campaign (subprocess-isolated
# phases) + golden anchor.  Serial; gates on the backend like the main
# round-4 queue.
cd "$(dirname "$0")/.." || exit 1
mkdir -p out/round4_logs
L=out/round4_logs

run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S) ===" | tee -a "$L/queue_b.log"
  timeout "$tmo" "$@" > "$L/$name.log" 2>&1
  rc=$?
  echo "=== $name exit $rc $(date -u +%H:%M:%S) ===" | tee -a "$L/queue_b.log"
  return $rc
}

gate() {
  timeout 700 python -u tools/wait_tpu.py 600 >> "$L/queue_b.log" 2>&1 || {
    echo "gate: backend down before $1" | tee -a "$L/queue_b.log"; return 1; }
}

gate trpcage2 && run trpcage2 12600 python -u tools/run_trpcage_production.py \
    --generations 1000 --budget-s 7200 --out out/trpcage_tpu
gate golden2 && run golden2 2400 python -u tools/trpcage_golden.py out/trpcage_tpu
echo "queue_b done $(date -u)" | tee -a "$L/queue_b.log"
