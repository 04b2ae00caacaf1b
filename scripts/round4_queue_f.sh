#!/bin/bash
# Round-4 queue F: sampler-cert follow-ups behind queue E (same lock).
#   - dpmpp50: regenerate the lost DPM-Solver++(2M) cert cited in
#     BASELINE.md (sampler table entry).
#   - cached k=3 / k=4: the round-4 A/B measured k=3 at 11.25 img/s
#     steady (BENCH_LOCAL.json) but the headline stays at the certified
#     k=2 until a green 200/class cert exists for a larger interval.
#     These certs are the promotion gate; the default flip happens in a
#     reviewed commit, not here.
# Every artifact is committed the moment it lands (see queue E header).
#
# Usage: nohup bash scripts/round4_queue_f.sh > /tmp/r4queue/driver_f.log 2>&1 &
set -u
cd /root/repo
LOG=/tmp/r4queue
mkdir -p "$LOG"

exec 9>"$LOG/queue.lock"
flock 9 || exit 1

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

commit_artifacts() { # commit_artifacts <message> <path...>
  local msg=$1; shift
  local have=0
  for p in "$@"; do [ -e "$p" ] && have=1; done
  [ "$have" = 1 ] || return 0
  for p in "$@"; do [ -e "$p" ] && git add -f "$p"; done
  git diff --cached --quiet && return 0
  git commit -q -m "$msg

No-Verification-Needed: evidence artifacts only (JSON), no runtime surface" \
    && echo "[$(stamp)] committed: $msg"
}

run dpmpp_cert quality_r2/dpmpp50_cert.json \
  python scripts/ddim_cert.py --root ./quality_r2 --method dpmpp --steps 50
commit_artifacts "Regenerate DPM-Solver++(2M)-50 quality cert" \
  quality_r2/dpmpp50_cert.json

run cached3_cert quality_r2/ddpm_cached3_cert.json \
  python scripts/ddim_cert.py --root ./quality_r2 --method ddpm_cached --steps 3
commit_artifacts "Certify ddpm_cached k=3 at 200 images/class (headline-promotion gate)" \
  quality_r2/ddpm_cached3_cert.json

run cached4_cert quality_r2/ddpm_cached4_cert.json \
  python scripts/ddim_cert.py --root ./quality_r2 --method ddpm_cached --steps 4
commit_artifacts "Certify ddpm_cached k=4 at 200 images/class (exploratory)" \
  quality_r2/ddpm_cached4_cert.json

echo "[$(stamp)] queue F complete"
