#!/bin/bash
# Round-4 seventh queue (the golden-anchor chain): extend the trp-cage
# equilibrium ensemble to 20 ns/walker (640 ns total — the 12.5-ps
# 5-ns/walker round saw the slow ~8 ns MSM mode exactly once), then the
# method-equivalence anchor (trajectory-trained ISOKANN vs MSM at the
# same lag on the same frames), then re-measure the Verlet mode with
# the class-c work cap.
cd "$(dirname "$0")/.." || exit 1
mkdir -p out/round4_logs
L=out/round4_logs

run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S) ===" | tee -a "$L/queue_g.log"
  timeout "$tmo" "$@" > "$L/$name.log" 2>&1
  rc=$?
  echo "=== $name exit $rc $(date -u +%H:%M:%S) ===" | tee -a "$L/queue_g.log"
  return $rc
}

gate() {
  timeout 700 python -u tools/wait_tpu.py 600 >> "$L/queue_g.log" 2>&1 || {
    echo "gate: backend down before $1" | tee -a "$L/queue_g.log"; return 1; }
}

# ensemble extension is crash-resumable: retry up to 3 times
for a in 1 2 3; do
  gate golden_eq3 || break
  run golden_eq3 3600 python -u tools/trpcage_golden_eq.py out/trpcage_tpu \
      --ns 20 --walkers 32 --budget-s 2700
  rc=$?
  [ $rc -eq 0 ] && break
  echo "golden_eq3 attempt $a failed rc=$rc; resuming" | tee -a "$L/queue_g.log"
  sleep 90
done

gate traj_iso && run traj_iso 2400 python -u tools/trpcage_traj_iso.py \
    out/trpcage_tpu --lag-ps 625
gate verletperf3 && run verletperf3 2400 python -u tools/nb_perf.py --verlet --walkers 8
echo "queue_g done $(date -u)" | tee -a "$L/queue_g.log"
