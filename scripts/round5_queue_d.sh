#!/bin/bash
# Round-5 queue, part D: make the reference-scale cert REAL.
#
# Found while auditing the line-sweep confirm leg: the sampler draws one
# condition per CSV row, and every quality_r2 test CSV has 200 rows — so
# round 4's `refscale500_cert.json` (--gen_count 500) silently capped at
# 200 and its "within 0.01 of the 200/class numbers" reading was
# actually "identical, because it was the same 200 images". Same for the
# line sweep's n=500 confirm. This queue replaces that hollow evidence
# with a genuine robustness check on 500 FRESH conditions per class
# (seed-7 renders, disjoint from the seed-1/2/3 train/val/test sets):
#   D1 exact DDPM-1000 CFG-3 on the 500-row fresh sets (the true
#      reference-workload cert, /root/reference/generate_cond.py:51)
#   D2 the headline distilled student on the same fresh sets
#   D3 the line-class winner (s=2.0) on 500 fresh line conditions
#
# Usage: nohup bash scripts/round5_queue_d.sh > /tmp/r5queue/driver_d.log 2>&1 &
set -u
cd /root/repo
LOG=/tmp/r5queue
mkdir -p "$LOG"

exec 9>"$LOG/queue.lock"
flock -n 9 || { echo "another queue still running"; exit 1; }

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

No-Verification-Needed: evidence artifacts only (JSON/ckpt/PNG), no runtime surface" \
    && echo "[$(stamp)] committed: $msg"
}

timeout 300 python -c "import jax; print(jax.devices())" || {
  echo "[$(stamp)] TPU unreachable; aborting queue"; exit 2; }

# commit the fresh test sets first: certs must cite committed inputs
commit_artifacts "Fresh 500-condition test sets (seed 7) for true reference-scale certs" \
  quality_r2/data/line_224x224_test500 \
  quality_r2/data/circle_224x224_test500 \
  quality_r2/data/arc_224x224_test500

# --- D1. exact DDPM-1000 on 500 fresh conditions/class
run refscale500_true quality_r2/refscale500_true_cert.json \
  python scripts/ddim_cert.py --root ./quality_r2 \
    --ckpt ./model_para/trained_para_cont.msgpack \
    --method ddpm_cached --steps 1 --gen_count 500 \
    --test_suffix _test500 \
    --prediction_type epsilon --guidance 3.0 \
    --gen_tag refscale500_true --out_name refscale500_true_cert.json \
    --ddpm_summary ./continue_summary.json \
&& commit_artifacts "TRUE reference-scale cert: exact DDPM-1000 on 500 fresh conditions/class" \
  quality_r2/refscale500_true_cert.json

# --- D2. the headline distilled student on the same fresh sets
run distill8_test500 quality_r2/distill8_test500_cert.json \
  python scripts/ddim_cert.py --root ./quality_r2 \
    --ckpt ./model_para/distilled_final.msgpack \
    --method ddim --steps 8 --spacing trailing --gen_count 500 \
    --test_suffix _test500 \
    --prediction_type v --guidance 0 \
    --gen_tag distill8_test500 --out_name distill8_test500_cert.json \
    --ddpm_summary ./continue_summary.json \
&& commit_artifacts "Headline distilled student certified on 500 fresh conditions/class" \
  quality_r2/distill8_test500_cert.json

# --- D3. line-class winner s=2.0 on 500 fresh line conditions
run line_g2_test500 quality_r2/line_g2_test500.json \
  python scripts/line_guidance_sweep.py --root ./quality_r2 \
    --ckpt ./model_para/trained_para_cont_cos_ema.msgpack \
    --scales 2 --gen_count 500 --confirm_count 0 \
    --csv ./data/line_224x224_test500/line_224x224_test500.csv \
    --gt_dir ./data/line_224x224_test500 \
    --out_name line_g2_test500.json \
&& commit_artifacts "Line guidance winner s=2.0 confirmed on 500 fresh conditions" \
  quality_r2/line_g2_test500.json

# --- D4. is the s=2 win line-specific? All three classes at guidance 2
#     on the standard 200-row set (exact DDPM, cos+EMA checkpoint): if
#     circle/arc also improve, the right recommendation is a global
#     guidance change, not a per-class policy.
run allclass_g2 quality_r2/allclass_g2_cert.json \
  python scripts/ddim_cert.py --root ./quality_r2 \
    --ckpt ./model_para/trained_para_cont_cos_ema.msgpack \
    --method ddpm_cached --steps 1 \
    --prediction_type epsilon --guidance 2.0 \
    --gen_tag allclass_g2 --out_name allclass_g2_cert.json \
    --ddpm_summary ./continue_summary_cos.json --ddpm_metrics_key metrics_ema \
&& commit_artifacts "All-class guidance-2.0 cert: is the line win class-specific?" \
  quality_r2/allclass_g2_cert.json

echo "[$(stamp)] queue D complete"
