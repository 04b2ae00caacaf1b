#!/bin/bash
# Round-3 TPU work queue. Launch once the axon tunnel is back; every stage
# is guarded by its final artifact, so the queue is safely re-runnable
# after any interruption (tunnel wedge, kill, reboot): re-invoke and it
# resumes at the first unfinished stage. Serialized on purpose — one CPU
# core (dispatch) and one chip; concurrency only adds contention.
#
# Usage: nohup bash scripts/round3_queue.sh > /tmp/r3queue/driver.log 2>&1 &
set -u
cd /root/repo
LOG=/tmp/r3queue
mkdir -p "$LOG"

# single-instance lock: a waiter may auto-start the queue while a manual
# launch is alive; second instance exits quietly
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

wait_for_torch() { # benches need the core quiet; the torch parity run owns it until done
  while pgrep -x python -a 2>/dev/null | grep -q torch_reference_run; do
    echo "[$(stamp)] torch parity run still active; waiting 300s before benches"
    sleep 300
  done
}

# --- 1. finish the geometry-head λ sweep (VERDICT r2 #3): resumes λ=0.05
#        from its epoch-80 Orbax checkpoint, then runs λ=0.1 fresh.
run lambda_sweep quality_r2/lambda_sweep/lambda_01/summary.json \
  python scripts/lambda_sweep.py --root ./quality_r2 --epochs 120

# --- 2. framework side of the 96px cross-stack parity at the torch
#        reference's exact lr (1e-4; the scout used the fw default 2e-4).
#        Same rendered data + same stage-1 VAE checkpoint as the scout.
#        If a CPU-fallback leg of this run is still alive (launched during
#        a tunnel outage), the chip does it ~30x faster: stop the CPU leg
#        by its exact recorded PIDs (verify the cmdline first — never
#        pattern-kill) and take over. Training resumes from the shared
#        Orbax checkpoint, so CPU epochs are not wasted.
if [ ! -e parity96lr1_fw/quality_summary.json ] && [ -f /tmp/parity96lr1_cpu.pid ]; then
  for p in $(cat /tmp/parity96lr1_cpu.pid); do
    if ps -o cmd= -p "$p" 2>/dev/null | grep -q "quality_run.py --root parity96lr1_fw\|timeout 36000 python scripts/quality_run.py"; then
      echo "[$(stamp)] stopping CPU-fallback leg pid $p (TPU takes over)"
      kill "$p" 2>/dev/null
    fi
  done
  sleep 5
fi
run parity96lr1 parity96lr1_fw/quality_summary.json \
  flock -n /tmp/parity96lr1.lock \
  python scripts/quality_run.py --root parity96lr1_fw --image_size 96 \
    --train_count 1000 --val_count 64 --test_count 64 --vae_epochs 20 \
    --latent_epochs 200 --latent_bs 32 --latent_lr 1e-4 --gen_count 64 \
    --vae_ckpt /root/repo/parity96_fw/vae/2026_08_17_14_02/vae_best.msgpack \
    --data_dir /root/repo/parity96s_fw/data

# --- 2b. min-SNR-γ A/B at the identical 96px budget/data/VAE: the uniform
#         side is parity96s_fw (lr 2e-4, gauss_recall 0.37/0.42/0.51); this
#         leg changes ONLY the loss weighting. ~25 min chip time.
#         Same CPU-fallback takeover protocol as stage 2.
if [ ! -e parity96minsnr_fw/quality_summary.json ] && [ -f /tmp/parity96minsnr_cpu.pid ]; then
  for p in $(cat /tmp/parity96minsnr_cpu.pid); do
    if ps -o cmd= -p "$p" 2>/dev/null | grep -q "quality_run.py --root parity96minsnr_fw\|timeout 36000 python scripts/quality_run.py"; then
      echo "[$(stamp)] stopping CPU-fallback minsnr leg pid $p (TPU takes over)"
      kill "$p" 2>/dev/null
    fi
  done
  sleep 5
fi
run parity96minsnr parity96minsnr_fw/quality_summary.json \
  flock -n /tmp/parity96minsnr.lock \
  python scripts/quality_run.py --root parity96minsnr_fw --image_size 96 \
    --train_count 1000 --val_count 64 --test_count 64 --vae_epochs 20 \
    --latent_epochs 200 --latent_bs 32 --latent_lr 2e-4 --gen_count 64 \
    --loss_weighting min_snr \
    --vae_ckpt /root/repo/parity96_fw/vae/2026_08_17_14_02/vae_best.msgpack \
    --data_dir /root/repo/parity96s_fw/data

# --- 2c. checkpoint-portability proof: convert the torch run's TRAINED
#         .pth weights (real reference classes) and score them through the
#         framework pipeline; metrics should match torch_ref_summary.json
#         within sampling noise.
run torch_ckpt_eval parity96b_torch_fwports/torch_ckpt_eval.json \
  python scripts/torch_ckpt_eval.py --torch_root ./parity96b_torch \
    --image_size 96 --gen_count 64

# --- 3. bf16-attention-scores quality certification (round-3 kernel lever)
run attn_bf16_cert quality_r2/attn_bf16_cert.json \
  python scripts/attn_bf16_cert.py --root ./quality_r2

# --- 4. DPM-Solver++(2M) quality certification on TPU
run dpmpp_cert quality_r2/dpmpp50_cert.json \
  python scripts/ddim_cert.py --root ./quality_r2 --method dpmpp --steps 50

# --- 11. progressive guided distillation of the continuation checkpoint
#         (256 -> 8 steps, guidance 3.0 folded in), then quality-cert the
#         8-step student on the standard 200/class eval. Uses the same
#         data the checkpoint was trained on (quality_r2/data).
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

# --- benches: need an otherwise-idle core ---
wait_for_torch

# a CPU-fallback parity leg may be running through a tunnel outage; pause
# it (SIGSTOP) for the timing-sensitive bench block, resume after. Exact
# PIDs only — never pattern-kill.
# pidfile written by the launcher; only verified-alive PIDs are paused
CPU_LEG_PIDS=""
if [ -f /tmp/parity96lr1_cpu.pid ]; then
  for p in $(cat /tmp/parity96lr1_cpu.pid); do
    kill -0 "$p" 2>/dev/null && CPU_LEG_PIDS="$CPU_LEG_PIDS $p"
  done
  CPU_LEG_PIDS=${CPU_LEG_PIDS# }
fi
if [ -n "$CPU_LEG_PIDS" ]; then
  echo "[$(stamp)] pausing CPU-fallback leg ($CPU_LEG_PIDS) for benches"
  kill -STOP $CPU_LEG_PIDS 2>/dev/null
fi
resume_cpu_leg() {
  if [ -n "${CPU_LEG_PIDS:-}" ]; then
    echo "[$(stamp)] resuming CPU-fallback leg ($CPU_LEG_PIDS)"
    kill -CONT $CPU_LEG_PIDS 2>/dev/null
  fi
}
trap resume_cpu_leg EXIT

# --- 4b. step decomposition: price the assembled production step vs its
#         parts (where do the remaining ms go at CFG batch 128?)
run step_decomp "$LOG/step_decomp.done" \
  python scripts/perf_step_decomp.py 64
grep -q 'DONE' "$LOG/step_decomp.log" 2>/dev/null && touch "$LOG/step_decomp.done"

# --- 4c. XLA-flag A/B: bigger scoped VMEM for fusion (cheap probe)
run bench_vmem64 "$LOG/bench_vmem64.done" \
  env XLA_FLAGS=--xla_tpu_scoped_vmem_limit_kib=65536 BENCH_REPS=3 python bench.py
grep -q '"metric"' "$LOG/bench_vmem64.log" 2>/dev/null && touch "$LOG/bench_vmem64.done"

# --- 5. hybrid XLA-conv + Pallas-GN A/B
run bench_gn_hybrid "$LOG/bench_gn_hybrid.done" \
  env DIFFUSION_TPU_STAGE_GN_PALLAS=1 BENCH_REPS=4 python bench.py
[ -s "$LOG/bench_gn_hybrid.log" ] && grep -q '"metric"' "$LOG/bench_gn_hybrid.log" && touch "$LOG/bench_gn_hybrid.done"

# --- 6. bf16 attention scores A/B (enable by default in code only if #3 passes)
run bench_bf16_scores "$LOG/bench_bf16_scores.done" \
  env DIFFUSION_TPU_ATTN_BF16_SCORES=1 BENCH_REPS=4 python bench.py
[ -s "$LOG/bench_bf16_scores.log" ] && grep -q '"metric"' "$LOG/bench_bf16_scores.log" && touch "$LOG/bench_bf16_scores.done"

# --- 6b. encoder-cached DDPM: throughput A/B (k=2,3) + quality cert at k=2
run bench_cached "$LOG/bench_cached.done" \
  env BENCH_CACHED=1 BENCH_REPS=3 python bench.py
grep -q '"metric"' "$LOG/bench_cached.log" 2>/dev/null && touch "$LOG/bench_cached.done"

run cached_cert quality_r2/ddpm_cached2_cert.json \
  python scripts/ddim_cert.py --root ./quality_r2 --method ddpm_cached --steps 2

# --- 7. B>=128 scaling with the tunnel fetch excluded (VERDICT r2 #6)
run no_fetch_sweep "$LOG/no_fetch_sweep.done" \
  python scripts/profile_batch_scaling.py --no_fetch --batches 64 128 256 --skip_ablations
grep -q '^FINAL' "$LOG/no_fetch_sweep.log" 2>/dev/null && touch "$LOG/no_fetch_sweep.done"

# --- 8b. DDPM scan-unroll A/B (pure scheduling knob, bit-identical output)
run bench_unroll2 "$LOG/bench_unroll2.done" \
  env DIFFUSION_TPU_SCAN_UNROLL=2 BENCH_REPS=3 python bench.py
grep -q '"metric"' "$LOG/bench_unroll2.log" 2>/dev/null && touch "$LOG/bench_unroll2.done"

run bench_unroll4 "$LOG/bench_unroll4.done" \
  env DIFFUSION_TPU_SCAN_UNROLL=4 BENCH_REPS=3 python bench.py
grep -q '"metric"' "$LOG/bench_unroll4.log" 2>/dev/null && touch "$LOG/bench_unroll4.done"

# --- 8c. combined-levers probe: all quality-preserving knobs at once
#         (upper bound for what the round-3 defaults could adopt; bf16
#         scores included — its quality cert is stage 3)
run bench_combo "$LOG/bench_combo.done" \
  env DIFFUSION_TPU_SCAN_UNROLL=2 DIFFUSION_TPU_STAGE_GN_PALLAS=1 \
      DIFFUSION_TPU_ATTN_BF16_SCORES=1 \
      XLA_FLAGS=--xla_tpu_scoped_vmem_limit_kib=65536 \
      BENCH_REPS=4 python bench.py
grep -q '"metric"' "$LOG/bench_combo.log" 2>/dev/null && touch "$LOG/bench_combo.done"

# --- 9. fresh headline bench (default config) for BASELINE.md round-3 table
run bench_headline "$LOG/bench_headline.done" \
  env BENCH_REPS=5 python bench.py
grep -q '"metric"' "$LOG/bench_headline.log" 2>/dev/null && touch "$LOG/bench_headline.done"

# --- 10. fast-sampler throughput: DDIM-50 + DPM++(2M)-20/50 extras
run bench_fast "$LOG/bench_fast.done" \
  env BENCH_DDIM=1 BENCH_DPMPP=1 BENCH_DISTILL=1 BENCH_REPS=3 python bench.py
grep -q '"metric"' "$LOG/bench_fast.log" 2>/dev/null && touch "$LOG/bench_fast.done"

resume_cpu_leg
trap - EXIT

# --- 8. line-class continuation with cosine lr decay + EMA (VERDICT r2 #5)
#        Last on purpose: ~2.5 h of chip time that nothing downstream gates
#        on, so the benches/certs above land first if the tunnel window is
#        short. Raw AND EMA weights are generated+evaluated (weight A/B).
run continue_cos quality_r2/continue_summary_cos.json \
  python scripts/continue_latent.py --root ./quality_r2 --epochs 300 \
    --lr_schedule cosine --class_balanced --ema_decay 0.999 --tag _cos \
    --ckpt ./model_para/trained_para_cont.msgpack

echo "[$(stamp)] queue complete"
