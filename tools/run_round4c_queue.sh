#!/bin/bash
# Round-4 third queue: waits for queue_b (trp-cage campaign + golden),
# then: villin true-lag rerun (staged bootstrap), tagged Girsanov rerun
# (records the kernel-eligibility flag correctly), full-scale v5e
# retest (7.7k atoms) LAST.
cd "$(dirname "$0")/.." || exit 1
mkdir -p out/round4_logs
L=out/round4_logs

# wait for queue_b to finish (marker line), up to 4.5 h
for i in $(seq 1 270); do
  grep -q "queue_b done" "$L/queue_b.log" 2>/dev/null && break
  sleep 60
done

run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S) ===" | tee -a "$L/queue_c.log"
  timeout "$tmo" "$@" > "$L/$name.log" 2>&1
  rc=$?
  echo "=== $name exit $rc $(date -u +%H:%M:%S) ===" | tee -a "$L/queue_c.log"
  return $rc
}

gate() {
  timeout 700 python -u tools/wait_tpu.py 600 >> "$L/queue_c.log" 2>&1 || {
    echo "gate: backend down before $1" | tee -a "$L/queue_c.log"; return 1; }
}

gate villin2 && run villin2 5400 python -u tools/run_villin_scale.py --reference-lag
gate girsanov2 && run girsanov2 1800 python -u tools/girsanov_variance.py
gate v5e_full 2>/dev/null && run v5e_full 7200 python -u tools/repro_v5e_faults.py
echo "queue_c done $(date -u)" | tee -a "$L/queue_c.log"
