#!/bin/bash
# Round-5 queue, part B: resume after the 2026-08-20 VM re-image.
# R1 (cos+EMA continuation) and R2 (teacher DDIM-8 control) landed and
# committed before the reset; their certs/checkpoints are in the repo.
# What was lost is /tmp state and the UNCOMMITTED generated-image dirs
# (generated_by_cond/{continued_cos_ema,teacher_ddim8,ddpm_cached3}),
# which R6's strips + diversity stat need. This script:
#   B1 re-distill 256->8 from the cos+EMA teacher          (queue R3)
#   B2 cert the new student vs the EMA teacher's DDPM-1000 (queue R4)
#   B3 regenerate teacher exact-DDPM images via the cached-k=1 path
#      (cache_interval=1 == exact DDPM-1000; doubles as a fresh cert of
#      the cos+EMA teacher on the SAME seed set as the student cert)
#   B4 regenerate the teacher_ddim8 + ddpm_cached3 image dirs (certs
#      already committed; generation is deterministic per-seed so the
#      metrics reproduce — these runs exist only to restock the PNGs)
#   B5 line-class guidance sweep                           (queue R5)
#   B6 strips + diversity stat                             (queue R6)
#   B7 bench with the promoted k=3 default + distilled mode (queue R7)
# ADVICE r4 #2: every commit is gated on the producing run's rc.
# ADVICE r4 #3: only the distilled-final checkpoint is committed.
#
# Usage: nohup bash scripts/round5_queue_b.sh > /tmp/r5queue/driver.log 2>&1 &
set -u
cd /root/repo
LOG=/tmp/r5queue
mkdir -p "$LOG"

exec 9>"$LOG/queue.lock"
flock -n 9 || { echo "queue already running"; exit 1; }

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

# --- B0. bounded device probe: bail early if the tunnel is wedged
timeout 300 python -c "import jax; print(jax.devices())" || {
  echo "[$(stamp)] TPU unreachable; aborting queue"; exit 2; }

# --- B1. progressive guided distillation 256->8 from the cos+EMA teacher
run distill_cos quality_r2/model_para/distill_cos/distilled_final.msgpack \
  python -m diffusion_model_tpu.cli.distill \
    --unet_ckpt quality_r2/model_para/trained_para_cont_cos_ema.msgpack \
    --vae_ckpt "$(ls -d quality_r2/vae/*/vae_best.msgpack | head -1)" \
    --items "quality_r2/data/line_224x224/line_224x224.csv,quality_r2/data/line_224x224,1" \
    --items "quality_r2/data/circle_224x224/circle_224x224.csv,quality_r2/data/circle_224x224,2" \
    --items "quality_r2/data/arc_224x224/arc_224x224.csv,quality_r2/data/arc_224x224,3" \
    --steps_per_stage 1500 --batch_size 128 --guidance 3.0 \
    --rss_limit_gb 100 --log_rss_every 250 \
    --out_dir quality_r2/model_para/distill_cos \
&& commit_artifacts "Re-distill 256->8 from the cos+EMA teacher (VERDICT r4 next #2)" \
  quality_r2/model_para/distill_cos/distilled_final.msgpack \
  quality_r2/model_para/distill_cos/distilled_final.msgpack.arch.json

[ -e quality_r2/model_para/distill_cos/distilled_final.msgpack ] || {
  echo "[$(stamp)] distilled checkpoint missing; aborting queue"; exit 3; }

# --- B2. 8-step student cert vs the EMA teacher's DDPM-1000 metrics
run distill8_cos_cert quality_r2/distill8_cos_cert.json \
  python scripts/ddim_cert.py --root ./quality_r2 \
    --ckpt ./model_para/distill_cos/distilled_final.msgpack \
    --method ddim --steps 8 --spacing trailing \
    --prediction_type v --guidance 0 \
    --gen_tag distill8_cos --out_name distill8_cos_cert.json \
    --ddpm_summary ./continue_summary_cos.json --ddpm_metrics_key metrics_ema \
&& commit_artifacts "Certify cos+EMA-distilled 8-step student at 200 images/class" \
  quality_r2/distill8_cos_cert.json

# --- B3. teacher exact-DDPM images (cache_interval=1 == exact T=1000):
#     restocks generated_by_cond/continued_cos_ema/ for strips+diversity
#     AND certifies the cos+EMA teacher on the student cert's seed set.
run teacher_ddpm_regen quality_r2/ddpm_exact_cos_cert.json \
  python scripts/ddim_cert.py --root ./quality_r2 \
    --ckpt ./model_para/trained_para_cont_cos_ema.msgpack \
    --method ddpm_cached --steps 1 \
    --prediction_type epsilon --guidance 3.0 \
    --gen_tag continued_cos_ema --out_name ddpm_exact_cos_cert.json \
    --ddpm_summary ./continue_summary_cos.json --ddpm_metrics_key metrics_ema \
&& commit_artifacts "Exact-DDPM cert of the cos+EMA teacher on the cert seed set (restocks strip images)" \
  quality_r2/ddpm_exact_cos_cert.json

# --- B4. restock the teacher_ddim8 + ddpm_cached3 image dirs (certs
#     already committed; deterministic seeds -> metrics reproduce)
run teacher_ddim8_regen quality_r2/generated_by_cond/teacher_ddim8/arc \
  python scripts/ddim_cert.py --root ./quality_r2 \
    --ckpt ./model_para/trained_para_cont_cos_ema.msgpack \
    --method ddim --steps 8 --spacing trailing \
    --prediction_type epsilon --guidance 3.0 \
    --gen_tag teacher_ddim8 --out_name teacher_ddim8_cert.json \
    --ddpm_summary ./continue_summary_cos.json --ddpm_metrics_key metrics_ema \
&& commit_artifacts "Teacher DDIM-8 control regenerated post-reset" \
  quality_r2/teacher_ddim8_cert.json

run cached3_regen quality_r2/generated_by_cond/ddpm_cached3/arc \
  python scripts/ddim_cert.py --root ./quality_r2 \
    --ckpt ./model_para/trained_para_cont.msgpack \
    --method ddpm_cached --steps 3 \
    --prediction_type epsilon --guidance 3.0 \
    --ddpm_summary ./continue_summary.json \
&& commit_artifacts "Cached k=3 cert regenerated post-reset (headline checkpoint)" \
  quality_r2/ddpm_cached3_cert.json

# --- B5. line-class guidance sweep on the best checkpoint
run line_sweep quality_r2/line_guidance_sweep.json \
  python scripts/line_guidance_sweep.py --root ./quality_r2 \
    --ckpt ./model_para/trained_para_cont_cos_ema.msgpack \
    --scales 2 4 5 \
&& commit_artifacts "Line-class guidance sweep (VERDICT r4 next #6)" \
  quality_r2/line_guidance_sweep.json

# --- B6. visual strips (VERDICT r4 missing #2) + diversity stat (next #1)
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
if [ ! -e docs/quality_r2/gt_vs_gen_arc_distill8.png ]; then
  strips distill8_cos distill8 \
  && strips continued_cos_ema teacher_ddpm1000 \
  && strips teacher_ddim8 teacher_ddim8 \
  && strips ddpm_cached3 cached_k3 \
  && commit_artifacts "Commit GT-vs-generated strips for the promoted samplers (VERDICT r4 missing #2)" \
    docs/quality_r2/gt_vs_gen_line_distill8.png \
    docs/quality_r2/gt_vs_gen_circle_distill8.png \
    docs/quality_r2/gt_vs_gen_arc_distill8.png \
    docs/quality_r2/gt_vs_gen_line_teacher_ddpm1000.png \
    docs/quality_r2/gt_vs_gen_circle_teacher_ddpm1000.png \
    docs/quality_r2/gt_vs_gen_arc_teacher_ddpm1000.png \
    docs/quality_r2/gt_vs_gen_line_teacher_ddim8.png \
    docs/quality_r2/gt_vs_gen_circle_teacher_ddim8.png \
    docs/quality_r2/gt_vs_gen_arc_teacher_ddim8.png \
    docs/quality_r2/gt_vs_gen_line_cached_k3.png \
    docs/quality_r2/gt_vs_gen_circle_cached_k3.png \
    docs/quality_r2/gt_vs_gen_arc_cached_k3.png
fi

run diversity quality_r2/diversity_distill8.json \
  python scripts/diversity_stat.py \
    --dirs quality_r2/generated_by_cond/continued_cos_ema/line \
           quality_r2/generated_by_cond/continued_cos_ema/circle \
           quality_r2/generated_by_cond/continued_cos_ema/arc \
           quality_r2/generated_by_cond/distill8_cos/line \
           quality_r2/generated_by_cond/distill8_cos/circle \
           quality_r2/generated_by_cond/distill8_cos/arc \
    --labels teacher/line teacher/circle teacher/arc \
             student/line student/circle student/arc \
    --out quality_r2/diversity_distill8.json \
&& commit_artifacts "Diversity stat: distilled student vs teacher (VERDICT r4 next #1)" \
  quality_r2/diversity_distill8.json

# --- B7. price the distilled serving mode + the new k=3 headline
run bench_r5 "$LOG/bench_r5.done" \
  env BENCH_DISTILL=1 BENCH_REPS=3 python bench.py
grep -q '"metric"' "$LOG/bench_r5.log" 2>/dev/null && touch "$LOG/bench_r5.done" \
  && commit_artifacts "Record round-5 headline (cached k=3) + distilled-mode bench" BENCH_LOCAL.json

echo "[$(stamp)] queue complete"
