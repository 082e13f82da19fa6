#!/bin/bash
# Round-4 fifth queue: after queue_d (campaign + golden + v5e_full),
# measure the Verlet-list mode on hardware and rerun the Girsanov study
# (its queue_d attempt died on the since-fixed shadowing bug).
cd "$(dirname "$0")/.." || exit 1
mkdir -p out/round4_logs
L=out/round4_logs

for i in $(seq 1 420); do
  grep -q "queue_d done" "$L/queue_d.log" 2>/dev/null && break
  sleep 60
done

run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S) ===" | tee -a "$L/queue_e.log"
  timeout "$tmo" "$@" > "$L/$name.log" 2>&1
  rc=$?
  echo "=== $name exit $rc $(date -u +%H:%M:%S) ===" | tee -a "$L/queue_e.log"
  return $rc
}

gate() {
  timeout 700 python -u tools/wait_tpu.py 600 >> "$L/queue_e.log" 2>&1 || {
    echo "gate: backend down before $1" | tee -a "$L/queue_e.log"; return 1; }
}

gate girsanov3 && run girsanov3 1800 python -u tools/girsanov_variance.py
gate verletperf && run verletperf 3600 python -u tools/nb_perf.py --verlet --walkers 8
echo "queue_e done $(date -u)" | tee -a "$L/queue_e.log"
