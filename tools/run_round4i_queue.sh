#!/bin/bash
# Round-4 ninth queue: the 2026-08-20 host restart wiped the gitignored
# deca checkpoints (iso_final.pkl, golden_eq_frames.npz) before the
# anchor work finished.  Regenerate and CLOSE ROADMAP round-5 item 0:
# (1) deca campaign regeneration (same args as the committed
#     2026-08-19 run); restart-proof iso_final.pkl with git add -f,
# (2) 20 ns/walker equilibrium ensemble; restart-proof the frames as a
#     float16 npz,
# (3) trajectory-ISOKANN vs grid MSM on the SAME frames at the 250 ps
#     lag (estimator-equivalence anchor; the npz probe showed
#     identifiability 0.987 and gap 0.81 there, so the ground truth is
#     well-determined at that rung),
# (4) full anchor-hyperparameter probe (CPU; lag x TICA-dim x bins),
# (5) Verlet/cells full-scale perf, fresh processes (ROADMAP item 8),
# (6) bench.py health check.
cd "$(dirname "$0")/.." || exit 1
mkdir -p out/round4_logs
L=out/round4_logs

run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S) ===" | tee -a "$L/queue_i.log"
  timeout "$tmo" "$@" > "$L/$name.log" 2>&1
  rc=$?
  echo "=== $name exit $rc $(date -u +%H:%M:%S) ===" | tee -a "$L/queue_i.log"
  return $rc
}

gate() {
  timeout 700 python -u tools/wait_tpu.py 600 >> "$L/queue_i.log" 2>&1 || {
    echo "gate: backend down before $1" | tee -a "$L/queue_i.log"; return 1; }
}

commit_safe() {
  # targeted restart-proofing commit: only the named paths, never -a
  msg=$1; shift
  git add -f "$@" 2>> "$L/queue_i.log" && \
    git commit -m "$msg" -- "$@" >> "$L/queue_i.log" 2>&1
}

# 1. deca campaign (checkpoint-resumable; retries resume, not restart)
if [ ! -f out/deca_production/iso_final.pkl ]; then
  for a in 1 2 3; do
    gate deca_campaign || break
    run deca_campaign_i$a 7200 python -u tools/run_trpcage_production.py \
        --sequence AAAAAAAAAA --name deca --generations 400 --budget-s 5400
    rc=$?
    [ $rc -eq 0 ] && break
    echo "deca_campaign attempt $a failed rc=$rc; resuming" \
      | tee -a "$L/queue_i.log"
    sleep 90
  done
fi
[ -f out/deca_production/iso_final.pkl ] && commit_safe \
  "Restart-proof the regenerated deca campaign checkpoint" \
  out/deca_production/iso_final.pkl out/deca_production/results.json \
  out/deca_production/campaign_telemetry.json

# 2. equilibrium golden ensemble, 20 ns/walker, crash-resumable
for a in 1 2 3 4; do
  gate deca_golden || break
  run deca_golden_i$a 3600 python -u tools/trpcage_golden_eq.py \
      out/deca_production --name deca --label "deca-alanine (Ala10)" \
      --ns 20 --walkers 32 --budget-s 2700
  rc=$?
  [ $rc -eq 0 ] && break
  echo "deca_golden attempt $a failed rc=$rc; resuming" \
    | tee -a "$L/queue_i.log"
  sleep 90
done
if [ -f out/deca_production/golden_eq_frames.npz ]; then
  python - <<'EOF' >> "$L/queue_i.log" 2>&1
import numpy as np
z = np.load('out/deca_production/golden_eq_frames.npz')
np.savez_compressed('out/deca_production/golden_eq_frames_f16.npz',
                    frames=z['frames'].astype(np.float16),
                    x=z['x'], v=z['v'], key=z['key'])
print('f16 frames:', __import__('os').path.getsize(
    'out/deca_production/golden_eq_frames_f16.npz') / 1e6, 'MB')
EOF
  commit_safe "Restart-proof the deca equilibrium frames (float16)" \
    out/deca_production/golden_eq_frames_f16.npz \
    out/deca_production/trpcage_golden_eq.npz \
    out/golden_md.json
fi

# 3. trajectory-ISOKANN vs MSM at the identifiable 250 ps rung
gate traj_iso && run deca_traj_iso 3600 python -u tools/trpcage_traj_iso.py \
    out/deca_production --name deca --label "deca-alanine (Ala10)" \
    --lag-ps 250 --stride-ps 12.5
commit_safe "Deca trajectory-ISOKANN anchor run artifacts" \
  data/golden/deca_traj_iso.npz out/golden_md.json \
  out/deca_production/traj_iso.json out/deca_production/results.json \
  2>/dev/null

# 4. full anchor probe (CPU: frames + chi eval only)
run deca_probe 5400 python -u tools/golden_anchor_probe.py \
    out/deca_production --lags 25,62.5,125,250 --dims 2,3 --bins 12,8,6

# 5. Verlet perf under the walker cap, fresh processes
gate cellsperf && run cellsperf_i 2400 python -u tools/nb_perf.py \
    --cells-only --walkers 8
gate verletperf && run verletperf_i 2400 python -u tools/nb_perf.py \
    --verlet-only --walkers 8

# 6. bench health check
gate bench && run bench_i 1800 python -u bench.py
echo "queue_i done $(date -u)" | tee -a "$L/queue_i.log"
