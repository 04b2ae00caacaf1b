#!/bin/bash
# Round-4 TPU work queue (VERDICT r3 "Next round" items, in evidence-value
# order). Every stage is guarded by its final artifact, so the queue is
# safely re-runnable after any interruption: re-invoke and it resumes at
# the first unfinished stage. Serialized on purpose — one chip; concurrency
# only adds dispatch contention.
#
# Round-4 reality check: the VM rebooted between rounds — /tmp state and
# the big untracked 96px artifacts (shared VAE ckpt, rendered data, the
# epoch-17 CPU-leg checkpoint, parity96c_torch raw outputs) were pruned to
# their summary JSONs. All 96px data is seed-deterministic (seeds 1/2/3,
# md5-pinned identical in round 3), so the fw@1e-4 leg re-renders and
# retrains its VAE from the same seedline instead of resuming.
#
# Usage: nohup bash scripts/round4_queue.sh > /tmp/r4queue/driver.log 2>&1 &
set -u
cd /root/repo
LOG=/tmp/r4queue
mkdir -p "$LOG"

exec 9>"$LOG/queue.lock"
flock -n 9 || { echo "queue already running; exiting"; exit 0; }

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

# --- 1. headline bench (VERDICT r3 weak #1: round-3's number was driver-
#        unverified). bench.py now also writes BENCH_LOCAL.json evidence.
run bench_headline "$LOG/bench_headline.done" \
  env BENCH_REPS=5 python bench.py
grep -q '"metric"' "$LOG/bench_headline.log" 2>/dev/null && touch "$LOG/bench_headline.done"

# --- 2. perf lever A/Bs toward >=10 img/s (VERDICT r3 #2). Short probes
#        FIRST (reordered): their results decide the default dispatch for
#        the round's headline, so they must land with hours to act on
#        them. A lever only becomes default with its quality cert.
run bench_vmem64 "$LOG/bench_vmem64.done" \
  env XLA_FLAGS=--xla_tpu_scoped_vmem_limit_kib=65536 BENCH_REPS=3 python bench.py
grep -q '"metric"' "$LOG/bench_vmem64.log" 2>/dev/null && touch "$LOG/bench_vmem64.done"

run bench_gn_hybrid "$LOG/bench_gn_hybrid.done" \
  env DIFFUSION_TPU_STAGE_GN_PALLAS=1 BENCH_REPS=3 python bench.py
grep -q '"metric"' "$LOG/bench_gn_hybrid.log" 2>/dev/null && touch "$LOG/bench_gn_hybrid.done"

run bench_bf16_scores "$LOG/bench_bf16_scores.done" \
  env DIFFUSION_TPU_ATTN_BF16_SCORES=1 BENCH_REPS=3 python bench.py
grep -q '"metric"' "$LOG/bench_bf16_scores.log" 2>/dev/null && touch "$LOG/bench_bf16_scores.done"

run bench_unroll2 "$LOG/bench_unroll2.done" \
  env DIFFUSION_TPU_SCAN_UNROLL=2 BENCH_REPS=3 python bench.py
grep -q '"metric"' "$LOG/bench_unroll2.log" 2>/dev/null && touch "$LOG/bench_unroll2.done"

run bench_cached "$LOG/bench_cached.done" \
  env BENCH_CACHED=1 BENCH_REPS=3 python bench.py
grep -q '"metric"' "$LOG/bench_cached.log" 2>/dev/null && touch "$LOG/bench_cached.done"

run bench_combo "$LOG/bench_combo.done" \
  env DIFFUSION_TPU_SCAN_UNROLL=2 DIFFUSION_TPU_STAGE_GN_PALLAS=1 \
      DIFFUSION_TPU_ATTN_BF16_SCORES=1 \
      XLA_FLAGS=--xla_tpu_scoped_vmem_limit_kib=65536 \
      BENCH_REPS=3 python bench.py
grep -q '"metric"' "$LOG/bench_combo.log" 2>/dev/null && touch "$LOG/bench_combo.done"

# --- 3. framework@1e-4 96px parity leg — completes the lr-matched 2x2
#        (torch@{1e-4,2e-4} are recorded in BASELINE.md round 3). Fresh
#        run: renders seed-identical data + retrains the 20-epoch VAE from
#        the same seedline the scout used (round-3 artifacts pruned).
run parity96lr1 parity96lr1_fw/quality_summary.json \
  python scripts/quality_run.py --root parity96lr1_fw --image_size 96 \
    --train_count 1000 --val_count 64 --test_count 64 --vae_epochs 20 \
    --latent_epochs 200 --latent_bs 32 --latent_lr 1e-4 --gen_count 64

# --- 4. progressive guided distillation 256->8 of the continuation
#        checkpoint + 8-step student cert (VERDICT r3 #3: the single
#        biggest capability jump sitting in the repo).
run distill quality_r2/model_para/distilled_final.msgpack \
  python -m diffusion_model_tpu.cli.distill \
    --unet_ckpt quality_r2/model_para/trained_para_cont.msgpack \
    --vae_ckpt "$(ls -d quality_r2/vae/*/vae_best.msgpack | head -1)" \
    --items "quality_r2/data/line_224x224/line_224x224.csv,quality_r2/data/line_224x224,1" \
    --items "quality_r2/data/circle_224x224/circle_224x224.csv,quality_r2/data/circle_224x224,2" \
    --items "quality_r2/data/arc_224x224/arc_224x224.csv,quality_r2/data/arc_224x224,3" \
    --steps_per_stage 1500 --batch_size 128 --guidance 3.0 \
    --out_dir quality_r2/model_para

run distill_cert quality_r2/distill8_cert.json \
  python scripts/ddim_cert.py --root ./quality_r2 \
    --ckpt ./model_para/distilled_final.msgpack --method ddim --steps 8 \
    --spacing trailing --prediction_type v --guidance 0 \
    --out_name distill8_cert.json

# --- 5. bf16-attention-scores quality cert (now includes the exact-f32
#        score-magnitude probe asserting max|score| << the ±80 clip)
run attn_bf16_cert quality_r2/attn_bf16_cert.json \
  python scripts/attn_bf16_cert.py --root ./quality_r2

# --- 6. DPM-Solver++(2M) quality cert
run dpmpp_cert quality_r2/dpmpp50_cert.json \
  python scripts/ddim_cert.py --root ./quality_r2 --method dpmpp --steps 50

# --- 7. encoder-cached DDPM k=2 quality cert (throughput is stage 3)
run cached_cert quality_r2/ddpm_cached2_cert.json \
  python scripts/ddim_cert.py --root ./quality_r2 --method ddpm_cached --steps 2

# --- 8. reference-scale generation cert: 500 images/class (the
#        reference's own workload, generate_cond.py:51) with plain DDPM
#        (ddpm_cached k=1 is bit-identical per test_sampling parity).
#        VERDICT r3 missing #3: all prior certs used 200/class.
run refscale500 quality_r2/refscale500_cert.json \
  python scripts/ddim_cert.py --root ./quality_r2 \
    --method ddpm_cached --steps 1 --gen_count 500 \
    --out_name refscale500_cert.json

# --- 9. finish the geometry-head λ sweep: λ∈{0.05, 0.1} run fresh
#        (the epoch-80 Orbax checkpoint did not survive the reboot);
#        λ∈{0, 0.01} summaries exist and are skipped by the script.
run lambda_sweep quality_r2/lambda_sweep/lambda_01/summary.json \
  python scripts/lambda_sweep.py --root ./quality_r2 --epochs 120

# --- 10. min-SNR-γ A/B at the 96px budget (same data seedline; reuses the
#         VAE stage 2 trained, if present — else trains its own)
VAE96="$(ls parity96lr1_fw/vae/*/vae_best.msgpack 2>/dev/null | head -1)"
run parity96minsnr parity96minsnr_fw/quality_summary.json \
  python scripts/quality_run.py --root parity96minsnr_fw --image_size 96 \
    --train_count 1000 --val_count 64 --test_count 64 --vae_epochs 20 \
    --latent_epochs 200 --latent_bs 32 --latent_lr 2e-4 --gen_count 64 \
    --loss_weighting min_snr \
    ${VAE96:+--vae_ckpt "$(cd "$(dirname "$VAE96")" && pwd)/$(basename "$VAE96")"} \
    --data_dir /root/repo/parity96lr1_fw/data

# --- 11. line-class continuation with cosine lr decay + EMA. Last on
#         purpose: ~2.5 h that nothing downstream gates on.
run continue_cos quality_r2/continue_summary_cos.json \
  python scripts/continue_latent.py --root ./quality_r2 --epochs 300 \
    --lr_schedule cosine --class_balanced --ema_decay 0.999 --tag _cos \
    --ckpt ./model_para/trained_para_cont.msgpack

echo "[$(stamp)] queue complete"
