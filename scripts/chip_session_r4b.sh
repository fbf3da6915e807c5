#!/bin/bash
# Round-4 chip session B: refresh every stale BASELINE number under the
# round-3/4 kernel stack (VERDICT r3 #3, #6, #8).
#   A. 13B end-to-end decode (BASELINE config 3; round-2 stack said 35.13)
#   B. serving engine throughput on the REAL 7B ckpt (was 237 served tok/s)
#   C. batch decode b=4 / b=8
#   D. int8 KV @4096-slot cache (was 71.45)
#   E. flash prefill A/B at 1024/4096 ctx (latency + peak mem)
#   F. full-depth self-draft speculative: mean_accept must equal gamma
#      (chip confirmation of the width-invariance exactness fix, 78812f2)
# Appends to ckpt/chip_r4b.log.
set -uo pipefail
cd /root/repo
LOG=ckpt/chip_r4b.log
CKPT=/root/repo/ckpt/llama2_7b_w4g128r128_packed
echo "--- session r4b $(date -u +%FT%TZ) $(git rev-parse --short HEAD) ---" >> "$LOG"

run() {
  echo "=== $1 ===" | tee -a "$LOG"
  shift
  timeout 2400 env "$@" 2>>/tmp/chip_r4b_err.log | tee -a "$LOG"
}

run "A 13B decode"      python -m qeft_tpu.run_benchmark --method qeft --model llama2-13b --context 64 --gen 256
run "B engine real-ckpt" python -m qeft_tpu.run_benchmark --method engine --load "$CKPT" --batch 8 --burst 16 --context 64 --gen 128 --requests 16
run "C1 batch=4"        QEFT_BENCH_BATCH=4 python bench.py
run "C2 batch=8"        QEFT_BENCH_BATCH=8 python bench.py
run "D int8kv@4096"     QEFT_KV_DTYPE=int8 QEFT_BENCH_MAXLEN=4096 python bench.py
run "E prefill A/B"     python scripts/prefill_probe.py 1024 4096
run "F self-draft spec" python -m qeft_tpu.run_benchmark --method spec --load "$CKPT" --draft_layers 32 --gamma 4 --context 64 --gen 128
