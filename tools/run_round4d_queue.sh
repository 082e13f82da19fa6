#!/bin/bash
# Round-4 fourth queue: waits for the orphaned villin2 stage to finish,
# then girsanov rerun -> trp-cage campaign relaunch (checkpointed,
# resumes pilot+sweep) -> golden anchor -> full-scale v5e retest LAST
# (the fault prober can wedge the claim; nothing may follow it).
cd "$(dirname "$0")/.." || exit 1
mkdir -p out/round4_logs
L=out/round4_logs

# wait for the villin process to exit (poll liveness, no pattern kills)
for i in $(seq 1 120); do
  ps aux | grep "run_villin_scale" | grep -v grep > /dev/null || break
  sleep 60
done

run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S) ===" | tee -a "$L/queue_d.log"
  timeout "$tmo" "$@" > "$L/$name.log" 2>&1
  rc=$?
  echo "=== $name exit $rc $(date -u +%H:%M:%S) ===" | tee -a "$L/queue_d.log"
  return $rc
}

gate() {
  timeout 700 python -u tools/wait_tpu.py 600 >> "$L/queue_d.log" 2>&1 || {
    echo "gate: backend down before $1" | tee -a "$L/queue_d.log"; return 1; }
}

gate girsanov2 && run girsanov2 1800 python -u tools/girsanov_variance.py

# campaign relaunch: reuses pilot.pkl + completed sweep, resumes from
# campaign checkpoints; relaunch up to 3 times on crashes
for a in 1 2 3; do
  gate trpcage3 || break
  run trpcage3 12600 python -u tools/run_trpcage_production.py \
      --generations 1000 --budget-s 7200 --out out/trpcage_tpu
  rc=$?
  [ $rc -eq 0 ] && break
  echo "trpcage3 attempt $a failed rc=$rc; retrying" | tee -a "$L/queue_d.log"
  sleep 120
done

gate golden3 && run golden3 2400 python -u tools/trpcage_golden.py out/trpcage_tpu
gate v5e_full && run v5e_full 7200 python -u tools/repro_v5e_faults.py
echo "queue_d done $(date -u)" | tee -a "$L/queue_d.log"
