#!/bin/bash
# Round-4 follow-on queue: stages added after round4_queue.sh launched
# (a running bash script must never be edited in place — bash reads it
# incrementally). Blocks on the SAME lock, so it starts the moment the
# main queue finishes; artifact-guarded and re-runnable like the main one.
#
# Usage: nohup bash scripts/round4_queue_b.sh > /tmp/r4queue/driver_b.log 2>&1 &
set -u
cd /root/repo
LOG=/tmp/r4queue
mkdir -p "$LOG"

exec 9>"$LOG/queue.lock"
flock 9 || exit 1   # blocking: wait for the main queue to finish

stamp() { date -u +%H:%M:%S; }

run() { # run <name> <artifact-guard> <cmd...>
  local name=$1 artifact=$2; shift 2
  if [ -e "$artifact" ]; then echo "[$(stamp)] skip $name ($artifact exists)"; return 0; fi
  echo "[$(stamp)] run  $name -> $LOG/$name.log"
  timeout 14400 "$@" > "$LOG/$name.log" 2>&1
  local rc=$?
  echo "[$(stamp)] done $name rc=$rc"
  return $rc
}

# --- B1. time-parallel DDIM production-scale accuracy cert (VERDICT r3
#         weak #6: deviation was pinned only on toy models; this runs the
#         real checkpoint at the pipeline's hardwired tol/window).
run parallel_dev quality_r2/parallel_dev_cert.json \
  python scripts/parallel_dev_cert.py --root ./quality_r2 --steps 50

echo "[$(stamp)] queue B complete"
