#!/bin/bash
# Round-3 TPU evidence queue (serial: the TPU is single-tenant).
# Waits for the backend, then runs each job with its own timeout,
# continuing past failures.  Logs under out/round3_logs/.
cd "$(dirname "$0")/.." || exit 1
mkdir -p out/round3_logs
L=out/round3_logs

run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S) ===" | tee -a "$L/queue.log"
  timeout "$tmo" "$@" > "$L/$name.log" 2>&1
  rc=$?
  echo "=== $name exit $rc $(date -u +%H:%M:%S) ===" | tee -a "$L/queue.log"
}

gate() {
  # re-probe before each stage: a faulted stage can wedge the device
  # claim, and every later stage would burn its whole timeout blocked
  timeout 700 python -u tools/wait_tpu.py 600 >> "$L/queue.log" 2>&1
  if [ $? -ne 0 ]; then
    echo "gate: backend down before $1; skipping" | tee -a "$L/queue.log"
    return 1
  fi
  return 0
}

# 0) wait for the backend (hang-safe subprocess probes)
run wait_tpu 22000 python -u tools/wait_tpu.py 21600 || true
if ! tail -1 "$L/wait_tpu.log" | grep -q "devices:"; then
  echo "backend never came up; aborting queue" | tee -a "$L/queue.log"
  exit 1
fi

# 1) trp-cage: pilot + lag sweep + budgeted production campaign
run trpcage 10800 python -u tools/run_trpcage_production.py \
    --generations 1000 --budget-s 7200

# 2) Girsanov variance study v2 (full)
gate girsanov && run girsanov 3600 python -u tools/girsanov_variance.py

# 3) villin at the true reference lag
gate villin && run villin 3600 python -u tools/run_villin_scale.py --reference-lag

# 4) TPU test lane
gate tpulane && run tpulane 3600 env ISOKANN_TPU_LANE=1 python -m pytest tests -m tpu -q

# 5) north-star benchmark
gate bench && run bench 3000 python -u bench.py

echo "queue done $(date -u)" | tee -a "$L/queue.log"
