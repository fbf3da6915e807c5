#!/bin/bash
# Round-5 chip session A: the measurement sweep VERDICT r4 #1 ordered —
# every number on the CURRENT kernel stack + the real checkpoint, run FIRST
# before any new optimization work.  Covers: headline, serving engine,
# batch b=4/8, int8@4096, flash-prefill A/B, and the genuine self-draft
# speculative sweep (draft_layers {8,16} x gamma {2,4}; ADVICE r4: 32 layers
# == the whole 32-layer model, trivially perfect — use real slices).
# Appends to ckpt/chip_r5a.log; stderr rides the same log (ADVICE r4).
set -uo pipefail
cd /root/repo
LOG=ckpt/chip_r5a.log
CKPT=/root/repo/ckpt/llama2_7b_w4g128r128_packed
echo "--- session r5a $(date -u +%FT%TZ) $(git rev-parse --short HEAD) ---" >> "$LOG"

run() {
  local name=$1; shift
  echo "=== $name ===" | tee -a "$LOG"
  timeout 2400 env "$@" 2>&1 | tee -a "$LOG"
  echo "=== $name rc=${PIPESTATUS[0]} ===" | tee -a "$LOG"
}

run "A headline real-ckpt"  QEFT_BENCH_13B=0 python bench.py
run "B engine real-ckpt"    python -m qeft_tpu.run_benchmark --method engine --load "$CKPT" --batch 8 --burst 16 --context 64 --gen 128 --requests 16
run "C1 batch=4"            QEFT_BENCH_13B=0 QEFT_BENCH_BATCH=4 python bench.py
run "C2 batch=8"            QEFT_BENCH_13B=0 QEFT_BENCH_BATCH=8 python bench.py
run "D int8kv@4096"         QEFT_BENCH_13B=0 QEFT_KV_DTYPE=int8 QEFT_BENCH_MAXLEN=4096 python bench.py
run "D2 bf16kv@4096"        QEFT_BENCH_13B=0 QEFT_BENCH_MAXLEN=4096 python bench.py
run "E prefill A/B"         python scripts/prefill_probe.py 1024 4096
run "F1 spec d8 g4"         python -m qeft_tpu.run_benchmark --method spec --load "$CKPT" --draft_layers 8 --gamma 4 --context 64 --gen 128
run "F2 spec d8 g2"         python -m qeft_tpu.run_benchmark --method spec --load "$CKPT" --draft_layers 8 --gamma 2 --context 64 --gen 128
run "F3 spec d16 g4"        python -m qeft_tpu.run_benchmark --method spec --load "$CKPT" --draft_layers 16 --gamma 4 --context 64 --gen 128
run "F4 spec d16 g2"        python -m qeft_tpu.run_benchmark --method spec --load "$CKPT" --draft_layers 16 --gamma 2 --context 64 --gen 128
run "G int8kv+int4lm"       QEFT_BENCH_13B=0 QEFT_KV_DTYPE=int8 QEFT_QUANT_LMHEAD=1 python bench.py
echo "--- session r5a done $(date -u +%FT%TZ) ---" >> "$LOG"
