#!/bin/bash
# Relaunches the round-4 TPU evidence queue until it completes once.
# The queue aborts when its wait-for-backend window expires; during a
# multi-hour tunnel outage this supervisor relaunches it, surviving
# session restarts.  Never runs two queues at once.
cd "$(dirname "$0")/.." || exit 1
L=out/round4_logs
mkdir -p "$L"

# wait for any currently-running queue instance to exit first
if [ -f /tmp/queue4.pid ]; then
  while kill -0 "$(cat /tmp/queue4.pid)" 2>/dev/null; do sleep 60; done
fi

for i in $(seq 1 12); do
  if grep -q "queue done" "$L/queue.log" 2>/dev/null; then
    echo "supervisor: queue already completed" | tee -a "$L/queue.log"
    exit 0
  fi
  echo "supervisor: launch attempt $i $(date -u +%H:%M:%S)" >> "$L/queue.log"
  bash tools/run_round4_tpu_queue.sh & echo $! > /tmp/queue4.pid
  wait "$(cat /tmp/queue4.pid)"
  grep -q "queue done" "$L/queue.log" 2>/dev/null && exit 0
  sleep 120
done
echo "supervisor: gave up after 12 attempts $(date -u)" | tee -a "$L/queue.log"
exit 1
