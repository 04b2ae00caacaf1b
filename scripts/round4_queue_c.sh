#!/bin/bash
# Round-4 retry queue: stages that FAILED in round4_queue.sh, with their
# root causes fixed, plus validation of the new bench headline.
#   - distill: host-OOM at 130 GB RSS (30000-image run, oom-killer) →
#     cli/distill.py now pre-encodes VAE posterior moments once (drops the
#     4.5 GB uint8 array + the per-step encoder), bounds the dispatch
#     queue (sync_every), and checkpoints-then-raises at an RSS limit.
#     Stage checkpoints make the halving schedule resumable.
#   - attn_bf16_cert: the score probe used jax.debug.callback, which the
#     axon PJRT client doesn't support → probe now runs as a CPU-backend
#     subprocess (scripts/attn_score_probe.py).
#   - bench_bf16_scores: Mosaic rejected bf16 matmul accumulators →
#     fixed in ops/attention.py (f32 acc + cast); re-probe.
#   - bench_combo: XLA_FLAGS can't carry TPU-backend flags through the
#     local client → use DIFFUSION_TPU_COMPILER_OPTIONS (in-request).
# Blocks on the SAME lock as queue A/B; artifact-guarded; re-runnable.
#
# Usage: nohup bash scripts/round4_queue_c.sh > /tmp/r4queue/driver_c.log 2>&1 &
set -u
cd /root/repo
LOG=/tmp/r4queue
mkdir -p "$LOG"

exec 9>"$LOG/queue.lock"
flock 9 || exit 1   # blocking: wait for queues A and B to finish

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

# --- C1. validate the NEW bench headline (certified cached-k2 fast path +
#         exact DDPM alongside, unroll=2 default). Proves the driver's
#         end-of-round invocation works and captures BENCH_LOCAL evidence.
run bench_r4head "$LOG/bench_r4head.done" \
  env BENCH_REPS=5 python bench.py
grep -q '"metric"' "$LOG/bench_r4head.log" 2>/dev/null && touch "$LOG/bench_r4head.done"

# --- C2. bf16-scores re-probe (Mosaic acc fix landed after the first try)
run bench_bf16b "$LOG/bench_bf16b.done" \
  env DIFFUSION_TPU_ATTN_BF16_SCORES=1 BENCH_EXACT_ONLY=1 BENCH_REPS=3 python bench.py
grep -q '"metric"' "$LOG/bench_bf16b.log" 2>/dev/null && touch "$LOG/bench_bf16b.done"

# --- C3. scoped-VMEM probe via in-request compiler options (the XLA_FLAGS
#         route is rejected client-side; this travels with the compile RPC)
run bench_vmem64b "$LOG/bench_vmem64b.done" \
  env DIFFUSION_TPU_COMPILER_OPTIONS=xla_tpu_scoped_vmem_limit_kib=65536 \
      BENCH_EXACT_ONLY=1 BENCH_REPS=3 python bench.py
grep -q '"metric"' "$LOG/bench_vmem64b.log" 2>/dev/null && touch "$LOG/bench_vmem64b.done"

# --- C4. bf16-scores quality cert (CPU-subprocess score probe)
run attn_bf16_cert quality_r2/attn_bf16_cert.json \
  python scripts/attn_bf16_cert.py --root ./quality_r2

# --- C5. progressive guided distillation 256->8, retried with the
#         host-OOM fixes (pre-encoded latents, bounded dispatch queue,
#         RSS watchdog at 100 GB, per-stage resume).
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

# --- C6. 8-step distilled student quality cert (VERDICT r3 #3 gate:
#         gauss_recall within ~0.1 of DDIM-50 across all three classes)
run distill_cert quality_r2/distill8_cert.json \
  python scripts/ddim_cert.py --root ./quality_r2 \
    --ckpt ./model_para/distilled_final.msgpack --method ddim --steps 8 \
    --spacing trailing --prediction_type v --guidance 0 \
    --out_name distill8_cert.json

# --- C7. price the distilled serving mode (weight-independent throughput
#         of DDIM-8 trailing no-CFG; pairs with the C6 quality cert)
run bench_distillmode "$LOG/bench_distillmode.done" \
  env BENCH_DISTILL=1 BENCH_EXACT_ONLY=1 BENCH_REPS=3 python bench.py
grep -q '"metric"' "$LOG/bench_distillmode.log" 2>/dev/null && touch "$LOG/bench_distillmode.done"

echo "[$(stamp)] queue C complete"
