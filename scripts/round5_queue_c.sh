#!/bin/bash
# Round-5 queue, part C: the distill-rebase NEGATIVE result follow-ups.
#
# Part B's re-distillation from the (better-at-DDPM-1000) cos+EMA
# teacher produced a WORSE 8-step student than round 4's (line recall
# 0.541 vs 0.835, far-noise 0.536 vs 0.163 — distill8_cos_cert.json vs
# distill8_cert.json). The round-4 student (distilled from
# trained_para_cont) therefore stays the headline distilled checkpoint,
# and this queue closes the evidence around that decision:
#   C1 re-certify the ROUND-4 student on this fresh VM — proves the
#      strong committed cert reproduces (deterministic seeds) AND
#      restocks its generated-image dir for strips/diversity.
#   C2 same-regime control for the round-4 student's OWN teacher
#      (trained_para_cont at DDIM-8 trailing CFG-3): the
#      apples-to-apples column ADVICE r4 #4 asked for, previously run
#      only for the cos+EMA teacher.
#   C3 strips for the round-4 student (overwrites the *_distill8.png
#      strips part B built from the cos student) + strips for the cos
#      student under their own *_distill8_cos.png names.
#   C4 diversity stat: round-4 student vs its teacher's exact-DDPM set.
#
# Usage: nohup bash scripts/round5_queue_c.sh > /tmp/r5queue/driver_c.log 2>&1 &
set -u
cd /root/repo
LOG=/tmp/r5queue
mkdir -p "$LOG"

exec 9>"$LOG/queue.lock"
flock -n 9 || { echo "queue B still running"; exit 1; }

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

No-Verification-Needed: evidence artifacts only (JSON/PNG), no runtime surface" \
    && echo "[$(stamp)] committed: $msg"
}

timeout 300 python -c "import jax; print(jax.devices())" || {
  echo "[$(stamp)] TPU unreachable; aborting queue"; exit 2; }

# --- C1. reproduce the round-4 student cert on this VM (restocks images)
run distill8_recert quality_r2/distill8_cert_r5.json \
  python scripts/ddim_cert.py --root ./quality_r2 \
    --ckpt ./model_para/distilled_final.msgpack \
    --method ddim --steps 8 --spacing trailing \
    --prediction_type v --guidance 0 \
    --gen_tag distill8 --out_name distill8_cert_r5.json \
    --ddpm_summary ./continue_summary.json \
&& commit_artifacts "Reproduce the round-4 distilled-student cert on a fresh VM (restocks strip images)" \
  quality_r2/distill8_cert_r5.json

# --- C2. same-regime control for the round-4 student's own teacher
run teacher0_ddim8 quality_r2/teacher0_ddim8_cert.json \
  python scripts/ddim_cert.py --root ./quality_r2 \
    --ckpt ./model_para/trained_para_cont.msgpack \
    --method ddim --steps 8 --spacing trailing \
    --prediction_type epsilon --guidance 3.0 \
    --gen_tag teacher0_ddim8 --out_name teacher0_ddim8_cert.json \
    --ddpm_summary ./continue_summary.json \
&& commit_artifacts "Teacher DDIM-8 same-regime control for the round-4 student (ADVICE r4 #4, own-teacher column)" \
  quality_r2/teacher0_ddim8_cert.json

# --- C3. strips: round-4 student takes the *_distill8.png names; the
#     cos student keeps its own *_distill8_cos.png names
strips() { # strips <gen_tag> <suffix>
  local tag=$1 sfx=$2 c
  for c in line circle arc; do
    [ -d "quality_r2/generated_by_cond/$tag/$c" ] || continue
    python scripts/make_strips.py \
      --gt_dir "quality_r2/data/${c}_224x224_test" \
      --gen_dir "quality_r2/generated_by_cond/$tag/$c" \
      --out "docs/quality_r2/gt_vs_gen_${c}_${sfx}.png" --cols 10 || return 1
  done
}
strips distill8 distill8 \
&& strips distill8_cos distill8_cos \
&& strips teacher0_ddim8 teacher0_ddim8 \
&& commit_artifacts "Strips: round-4 student (headline) + cos student + own-teacher DDIM-8 control" \
  docs/quality_r2/gt_vs_gen_line_distill8.png \
  docs/quality_r2/gt_vs_gen_circle_distill8.png \
  docs/quality_r2/gt_vs_gen_arc_distill8.png \
  docs/quality_r2/gt_vs_gen_line_distill8_cos.png \
  docs/quality_r2/gt_vs_gen_circle_distill8_cos.png \
  docs/quality_r2/gt_vs_gen_arc_distill8_cos.png \
  docs/quality_r2/gt_vs_gen_line_teacher0_ddim8.png \
  docs/quality_r2/gt_vs_gen_circle_teacher0_ddim8.png \
  docs/quality_r2/gt_vs_gen_arc_teacher0_ddim8.png

# --- C4. diversity: round-4 student vs its own teacher's exact set.
#     The teacher's exact-DDPM images for trained_para_cont live under
#     the cached-k3 dir? No — use the continued_cos_ema exact set as the
#     DDPM yardstick AND the round-4 student; mode collapse shows up as
#     high within-class pairwise IoU regardless of which teacher.
run diversity_r4student quality_r2/diversity_distill8_r4.json \
  python scripts/diversity_stat.py \
    --dirs quality_r2/generated_by_cond/continued_cos_ema/line \
           quality_r2/generated_by_cond/continued_cos_ema/circle \
           quality_r2/generated_by_cond/continued_cos_ema/arc \
           quality_r2/generated_by_cond/distill8/line \
           quality_r2/generated_by_cond/distill8/circle \
           quality_r2/generated_by_cond/distill8/arc \
    --labels ddpm/line ddpm/circle ddpm/arc \
             student_r4/line student_r4/circle student_r4/arc \
    --out quality_r2/diversity_distill8_r4.json \
&& commit_artifacts "Diversity stat: round-4 (headline) student vs exact-DDPM set" \
  quality_r2/diversity_distill8_r4.json

echo "[$(stamp)] queue C complete"
