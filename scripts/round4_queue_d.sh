#!/bin/bash
# Round-4 queue D: relaunch of the distill leg after the host-RSS root
# cause was actually fixed (commit dd02db31: the stage-1 teacher pytree
# was host numpy and re-uploaded ~120 MB per step; queue C's run still
# leaked ~100 MB/step and was stopped at 47 GB RSS), plus the
# time-parallel DDIM cert re-run under the new tol_frame='x0' acceptance
# criterion (the old raw-frame cert failed with full-range deltas on
# ~0.2% of pixels; preserved as parallel_dev_cert_xframe.json).
# Blocks on the same lock as queues A/B/C; artifact-guarded; re-runnable.
#
# Usage: nohup bash scripts/round4_queue_d.sh > /tmp/r4queue/driver_d.log 2>&1 &
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

# --- D1. time-parallel DDIM production cert under tol_frame='x0'
run parallel_dev_x0 quality_r2/parallel_dev_cert_x0.json \
  python scripts/parallel_dev_cert.py --root ./quality_r2 \
    --out_name parallel_dev_cert_x0.json

# --- D2. progressive guided distillation 256->8 (leak fixed at the root)
run distill2 quality_r2/model_para/distilled_final.msgpack \
  python -m diffusion_model_tpu.cli.distill \
    --unet_ckpt quality_r2/model_para/trained_para_cont.msgpack \
    --vae_ckpt "$(ls -d quality_r2/vae/*/vae_best.msgpack | head -1)" \
    --items "quality_r2/data/line_224x224/line_224x224.csv,quality_r2/data/line_224x224,1" \
    --items "quality_r2/data/circle_224x224/circle_224x224.csv,quality_r2/data/circle_224x224,2" \
    --items "quality_r2/data/arc_224x224/arc_224x224.csv,quality_r2/data/arc_224x224,3" \
    --steps_per_stage 1500 --batch_size 128 --guidance 3.0 \
    --rss_limit_gb 100 --log_rss_every 250 \
    --out_dir quality_r2/model_para

# --- D3. 8-step distilled student quality cert (VERDICT r3 #3 gate)
run distill_cert quality_r2/distill8_cert.json \
  python scripts/ddim_cert.py --root ./quality_r2 \
    --ckpt ./model_para/distilled_final.msgpack --method ddim --steps 8 \
    --spacing trailing --prediction_type v --guidance 0 \
    --out_name distill8_cert.json

# --- D4. price the distilled serving mode (DDIM-8 trailing no-CFG)
run bench_distillmode "$LOG/bench_distillmode.done" \
  env BENCH_DISTILL=1 BENCH_EXACT_ONLY=1 BENCH_REPS=3 python bench.py
grep -q '"metric"' "$LOG/bench_distillmode.log" 2>/dev/null && touch "$LOG/bench_distillmode.done"

echo "[$(stamp)] queue D complete"
