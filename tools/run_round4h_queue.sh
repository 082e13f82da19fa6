#!/bin/bash
# Round-4 eighth queue: the host restart wiped every gitignored .pkl, so
# (1) regenerate the deca-alanine campaign artifact (full pipeline:
#     pilot -> lag sweep -> 400-generation campaign -> rates/CK/reactive
#     path — same args as the committed 2026-08-19 run), then
# (2) run the mid-scale equilibrium golden anchor on it (ROADMAP round-5
#     item 0: deca helix-coil has abundant transitions, expect the
#     ala2-grade corr), then
# (3) re-measure the Verlet neighbor mode under the new walker-axis work
#     cap, cells + verlet from separate fresh processes (class-c fault
#     posture), then
# (4) a bench.py health check.
cd "$(dirname "$0")/.." || exit 1
mkdir -p out/round4_logs
L=out/round4_logs

run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S) ===" | tee -a "$L/queue_h.log"
  timeout "$tmo" "$@" > "$L/$name.log" 2>&1
  rc=$?
  echo "=== $name exit $rc $(date -u +%H:%M:%S) ===" | tee -a "$L/queue_h.log"
  return $rc
}

gate() {
  timeout 700 python -u tools/wait_tpu.py 600 >> "$L/queue_h.log" 2>&1 || {
    echo "gate: backend down before $1" | tee -a "$L/queue_h.log"; return 1; }
}

# 1. deca campaign (checkpoint-resumable; retries resume, not restart)
for a in 1 2 3; do
  gate deca_campaign || break
  run deca_campaign$a 7200 python -u tools/run_trpcage_production.py \
      --sequence AAAAAAAAAA --name deca --generations 400 --budget-s 5400
  rc=$?
  [ $rc -eq 0 ] && break
  echo "deca_campaign attempt $a failed rc=$rc; resuming" \
    | tee -a "$L/queue_h.log"
  sleep 90
done

# 2. equilibrium golden anchor, 20 ns/walker, crash-resumable
for a in 1 2 3 4; do
  gate deca_golden || break
  run deca_golden$a 3600 python -u tools/trpcage_golden_eq.py \
      out/deca_production --name deca --label "deca-alanine (Ala10)" \
      --ns 20 --walkers 32 --budget-s 2700
  rc=$?
  [ $rc -eq 0 ] && break
  echo "deca_golden attempt $a failed rc=$rc; resuming" \
    | tee -a "$L/queue_h.log"
  sleep 90
done

# 3. Verlet perf under the walker cap: cells baseline and verlet mode in
#    separate fresh processes
gate cellsperf && run cellsperf 2400 python -u tools/nb_perf.py \
    --cells-only --walkers 8
gate verletperf && run verletperf7 2400 python -u tools/nb_perf.py \
    --verlet-only --walkers 8

# 4. bench health check
gate bench && run bench_h 1800 python -u bench.py
echo "queue_h done $(date -u)" | tee -a "$L/queue_h.log"
