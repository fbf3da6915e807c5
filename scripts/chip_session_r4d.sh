#!/bin/bash
# Round-4 chip session D: post-rebuild measurement sweep on the fresh REAL
# checkpoint (VERDICT r3 #3 serving/batch/int8@4096, #6 flash prefill,
# #8 self-draft acceptance), plus the headline sanity re-run.
# Run AFTER scripts/quant7b.sh completes (ckpt present).
# Appends to ckpt/chip_r4d.log.
set -uo pipefail
cd /root/repo
LOG=ckpt/chip_r4d.log
CKPT=/root/repo/ckpt/llama2_7b_w4g128r128_packed
echo "--- session r4d $(date -u +%FT%TZ) $(git rev-parse --short HEAD) ---" >> "$LOG"

run() {
  echo "=== $1 ===" | tee -a "$LOG"
  shift
  timeout 2000 env "$@" 2>>/tmp/chip_r4d_err.log | tee -a "$LOG"
}

run "A headline real-ckpt"  env QEFT_BENCH_13B=0 python bench.py
run "B engine real-ckpt"    python -m qeft_tpu.run_benchmark --method engine --load "$CKPT" --batch 8 --burst 16 --context 64 --gen 128 --requests 16
run "C1 batch=4"            env QEFT_BENCH_13B=0 QEFT_BENCH_BATCH=4 python bench.py
run "C2 batch=8"            env QEFT_BENCH_13B=0 QEFT_BENCH_BATCH=8 python bench.py
run "D int8kv@4096"         env QEFT_BENCH_13B=0 QEFT_KV_DTYPE=int8 QEFT_BENCH_MAXLEN=4096 python bench.py
run "E prefill A/B"         python scripts/prefill_probe.py 1024 4096
run "F self-draft spec"     python -m qeft_tpu.run_benchmark --method spec --load "$CKPT" --draft_layers 32 --gamma 4 --context 64 --gen 128
run "G int8kv+int4lm"       env QEFT_BENCH_13B=0 QEFT_KV_DTYPE=int8 QEFT_QUANT_LMHEAD=1 python bench.py
