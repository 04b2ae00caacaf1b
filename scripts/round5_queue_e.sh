#!/bin/bash
# Round-5 queue, part E: guidance-2.0 distillation.
#
# Queue D's all-class guidance sweep showed the model is over-guided at
# the reference's CFG 3.0: s=2.0 improves EVERY class on EVERY metric
# at DDPM-1000 (far-noise 0.34/0.11/0.14 -> 0.07/0.02/0.03, gt_iou
# +0.13-0.17; quality_r2/allclass_g2_cert.json). The committed headline
# student folded guidance 3.0 into its weights — a 2.0-folded student
# should inherit the better operating point AND the few-step sharpness.
#   E0 teacher baseline at s=2: trained_para_cont, exact DDPM-1000
#      guidance 2.0 (the student's own teacher at the new operating point)
#   E1 progressive guided distillation 256->8 at guidance 2.0 from
#      trained_para_cont (the teacher that produced the good student;
#      the cos+EMA rebase was measured worse at s=3)
#   E2 cert the g2 student (same protocol as distill8_cert)
#   E3 strips
#
# Usage: nohup bash scripts/round5_queue_e.sh > /tmp/r5queue/driver_e.log 2>&1 &
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

# --- E0. the student's own teacher at the s=2 operating point
run teacher0_g2 quality_r2/ddpm_g2_teacher0_cert.json \
  python scripts/ddim_cert.py --root ./quality_r2 \
    --ckpt ./model_para/trained_para_cont.msgpack \
    --method ddpm_cached --steps 1 \
    --prediction_type epsilon --guidance 2.0 \
    --gen_tag teacher0_g2 --out_name ddpm_g2_teacher0_cert.json \
    --ddpm_summary ./continue_summary.json \
&& commit_artifacts "Teacher (trained_para_cont) exact-DDPM cert at guidance 2.0" \
  quality_r2/ddpm_g2_teacher0_cert.json

# --- E1. distill 256->8 at guidance 2.0
run distill_g2 quality_r2/model_para/distill_g2/distilled_final.msgpack \
  python -m diffusion_model_tpu.cli.distill \
    --unet_ckpt quality_r2/model_para/trained_para_cont.msgpack \
    --vae_ckpt "$(ls -d quality_r2/vae/*/vae_best.msgpack | head -1)" \
    --items "quality_r2/data/line_224x224/line_224x224.csv,quality_r2/data/line_224x224,1" \
    --items "quality_r2/data/circle_224x224/circle_224x224.csv,quality_r2/data/circle_224x224,2" \
    --items "quality_r2/data/arc_224x224/arc_224x224.csv,quality_r2/data/arc_224x224,3" \
    --steps_per_stage 1500 --batch_size 128 --guidance 2.0 \
    --rss_limit_gb 100 --log_rss_every 250 \
    --out_dir quality_r2/model_para/distill_g2 \
&& commit_artifacts "Distill 256->8 at guidance 2.0 (the measured-better operating point)" \
  quality_r2/model_para/distill_g2/distilled_final.msgpack \
  quality_r2/model_para/distill_g2/distilled_final.msgpack.arch.json

[ -e quality_r2/model_para/distill_g2/distilled_final.msgpack ] || {
  echo "[$(stamp)] g2 student missing; stopping"; exit 3; }

# --- E2. cert the g2 student
run distill8_g2_cert quality_r2/distill8_g2_cert.json \
  python scripts/ddim_cert.py --root ./quality_r2 \
    --ckpt ./model_para/distill_g2/distilled_final.msgpack \
    --method ddim --steps 8 --spacing trailing \
    --prediction_type v --guidance 0 \
    --gen_tag distill8_g2 --out_name distill8_g2_cert.json \
    --ddpm_summary ./continue_summary.json \
&& commit_artifacts "Certify the guidance-2.0 distilled 8-step student at 200 images/class" \
  quality_r2/distill8_g2_cert.json

# --- E3. strips
for c in line circle arc; do
  [ -d "quality_r2/generated_by_cond/distill8_g2/$c" ] || continue
  python scripts/make_strips.py \
    --gt_dir "quality_r2/data/${c}_224x224_test" \
    --gen_dir "quality_r2/generated_by_cond/distill8_g2/$c" \
    --out "docs/quality_r2/gt_vs_gen_${c}_distill8_g2.png" --cols 10
done
commit_artifacts "Strips: guidance-2.0 distilled student" \
  docs/quality_r2/gt_vs_gen_line_distill8_g2.png \
  docs/quality_r2/gt_vs_gen_circle_distill8_g2.png \
  docs/quality_r2/gt_vs_gen_arc_distill8_g2.png

echo "[$(stamp)] queue E complete"
