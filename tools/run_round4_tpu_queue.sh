#!/bin/bash
# Round-4 TPU evidence queue (serial: the TPU is single-tenant).
#
# Ordering lesson from round 3 (the backend never came up and the
# 3-hour trp-cage stage sat first in line): run the CHEAP, critical
# stages first so a short backend window still yields the TPU lane and
# the north-star bench; the long campaigns follow; the v5e fault
# retest goes LAST because a fault can wedge the server-side device
# claim for an hour+ (round-3 memory) and must not poison the rest.
#
# Logs under out/round4_logs/.
cd "$(dirname "$0")/.." || exit 1
mkdir -p out/round4_logs
L=out/round4_logs

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

# 1) TPU test lane (7 hardware-gated tests)
run tpulane 3600 env ISOKANN_TPU_LANE=1 python -m pytest tests -m tpu -q

# 2) north-star benchmark
gate bench && run bench 3000 python -u bench.py

# 3) Girsanov variance study, TPU kernel path
gate girsanov && run girsanov 3600 python -u tools/girsanov_variance.py

# 4) villin at the true reference lag (measured, not extrapolated)
gate villin && run villin 3600 python -u tools/run_villin_scale.py --reference-lag

# 5) trp-cage: pilot + lag sweep + budgeted production campaign
#    (now with integrated plateau rates + CK validation)
gate trpcage && run trpcage 10800 python -u tools/run_trpcage_production.py \
    --generations 1000 --budget-s 7200 --out out/trpcage_tpu

# 6) golden-anchor the trp-cage chi against an Ulam/MSM ground truth
if [ -f tools/trpcage_golden.py ]; then
  gate golden && run golden 2400 python -u tools/trpcage_golden.py out/trpcage_tpu
fi

# 7) v5e Pallas fault retest on the current runtime — LAST: a fault can
#    wedge the device claim server-side
gate v5e && run v5e 4000 python -u tools/repro_v5e_faults.py --small

echo "queue done $(date -u)" | tee -a "$L/queue.log"
