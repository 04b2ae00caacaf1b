#!/bin/bash
# Probe the TPU every 5 min; when jax.devices() answers, run the round-3
# queue. Loops until the queue's terminal artifact exists, so a tunnel
# wedge MID-queue (stages time out, queue returns early) gets retried on
# the next probe cycle — every stage is artifact-guarded and the queue is
# flock'd, so relaunching is idempotent.
DONE_ARTIFACT=/root/repo/quality_r2/continue_summary_cos.json
while true; do
  if [ -e "$DONE_ARTIFACT" ]; then
    echo "[$(date -u +%H:%M:%S)] terminal artifact present; watchdog exiting"
    exit 0
  fi
  n=$(timeout 240 python -c "import jax; print(len(jax.devices()))" 2>/dev/null | tail -1)
  if [[ "$n" =~ ^[0-9]+$ ]] && [ "$n" -ge 1 ]; then
    echo "[$(date -u +%H:%M:%S)] TPU up ($n device); (re)launching queue"
    bash /root/repo/scripts/round3_queue.sh
    echo "[$(date -u +%H:%M:%S)] queue returned; re-probing in 600s"
    sleep 600
  else
    echo "[$(date -u +%H:%M:%S)] tpu still down"
    sleep 300
  fi
done
