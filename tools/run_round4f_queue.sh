#!/bin/bash
# Round-4 sixth queue: after the equilibrium-golden ensemble finishes,
# (a) re-measure the Verlet mode with the lane-padding fix, (b) resume
# the trp-cage campaign from gen 550 to the full reference 1000
# generations (the round's earlier 7200s budget stopped it at 579),
# (c) re-evaluate BOTH golden anchors against the final chi — the
# equilibrium re-run reuses its checkpointed frames (--resume), only
# chi changes.
cd "$(dirname "$0")/.." || exit 1
mkdir -p out/round4_logs
L=out/round4_logs

# wait for the golden_eq process to exit (poll pid, no pattern kills)
if [ -f /tmp/golden_eq.pid ]; then
  GP=$(cat /tmp/golden_eq.pid)
  for i in $(seq 1 90); do
    kill -0 "$GP" 2>/dev/null || break
    sleep 60
  done
fi

run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S) ===" | tee -a "$L/queue_f.log"
  timeout "$tmo" "$@" > "$L/$name.log" 2>&1
  rc=$?
  echo "=== $name exit $rc $(date -u +%H:%M:%S) ===" | tee -a "$L/queue_f.log"
  return $rc
}

gate() {
  timeout 700 python -u tools/wait_tpu.py 600 >> "$L/queue_f.log" 2>&1 || {
    echo "gate: backend down before $1" | tee -a "$L/queue_f.log"; return 1; }
}

gate verletperf2 && run verletperf2 2400 python -u tools/nb_perf.py --verlet --walkers 8

# campaign resume to the full reference 1000 generations; relaunch up
# to 3 times on crashes (checkpoints every 50 gens)
for a in 1 2 3; do
  gate trpcage4 || break
  run trpcage4 10800 python -u tools/run_trpcage_production.py \
      --generations 1000 --budget-s 14500 --out out/trpcage_tpu
  rc=$?
  [ $rc -eq 0 ] && break
  echo "trpcage4 attempt $a failed rc=$rc; retrying" | tee -a "$L/queue_f.log"
  sleep 120
done

# golden anchors against the FINAL chi: burst-pair anchor (host) and
# the equilibrium ensemble (frames reused from the checkpoint)
run golden4 2400 python -u tools/trpcage_golden.py out/trpcage_tpu
gate golden_eq2 && run golden_eq2 3000 python -u tools/trpcage_golden_eq.py \
    out/trpcage_tpu --ns 5 --walkers 32
echo "queue_f done $(date -u)" | tee -a "$L/queue_f.log"
