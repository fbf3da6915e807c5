#!/bin/bash
# Round-5 chip session D: long-context validation under the round-5 stack
# (VERDICT r4 #5) + the 13B real-checkpoint benchmark (VERDICT r4 #2).
# Run AFTER scripts/quant13b.sh completes.  Appends to ckpt/chip_r5d.log.
set -uo pipefail
cd /root/repo
LOG=ckpt/chip_r5d.log
echo "--- session r5d $(date -u +%FT%TZ) $(git rev-parse --short HEAD) ---" >> "$LOG"

run() {
  local name=$1; shift
  echo "=== $name ===" | tee -a "$LOG"
  timeout 2400 env "$@" 2>&1 | tee -a "$LOG"
  echo "=== $name rc=${PIPESTATUS[0]} ===" | tee -a "$LOG"
}

# Pallas-attention >=1024 threshold re-validation on the current kernels
run "L1 @1024 pallas-attn(default on)" QEFT_BENCH_13B=0 QEFT_BENCH_MAXLEN=1024 python bench.py
run "L2 @1024 xla-attn"                QEFT_BENCH_13B=0 QEFT_BENCH_MAXLEN=1024 QEFT_PALLAS_ATTN=0 python bench.py
run "L3 @4096 xla-attn"                QEFT_BENCH_13B=0 QEFT_BENCH_MAXLEN=4096 QEFT_PALLAS_ATTN=0 python bench.py
# (@4096 pallas-default and int8@4096 already measured in r5a D/D2)

# 13B on the REAL pipeline checkpoint: headline secondary + long context
run "M1 13B real-ckpt"        python bench.py
run "M2 13B int8kv@4096"      QEFT_BENCH_ONLY=13b QEFT_KV_DTYPE=int8 QEFT_BENCH_MAXLEN=4096 python bench.py
run "M3 13B bf16kv@4096"      QEFT_BENCH_ONLY=13b QEFT_BENCH_MAXLEN=4096 python bench.py
# fp16-baseline comparison (the reference paper's headline is speedup vs fp;
# random init is throughput-identical)
run "M4 fp bf16 7B decode"    python -m qeft_tpu.run_benchmark --method fp --model llama2-7b --context 64 --gen 128
echo "--- session r5d done $(date -u +%FT%TZ) ---" >> "$LOG"
