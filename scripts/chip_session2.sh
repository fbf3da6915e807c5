#!/bin/bash
# Round-2 follow-up chip session: perf experiments that run AFTER
# scripts/chip_session.sh has produced the real 7B checkpoint.
#   A. qgemv N-tile width scan (QEFT_GEMV_BN 256/512/1024)
#   B. int8 KV cache decode bench @512 and @4096 slots
#   C. combined knobs: int8 KV + quantized lm_head
#   D. Pallas decode attention re-check at the 512-slot cache
# Appends to ckpt/chip_session2.log for BASELINE.md.
set -uo pipefail
cd /root/repo
LOG=ckpt/chip_session2.log
mkdir -p ckpt

echo "=== chip session 2 $(date -u) ===" >> "$LOG"

for i in $(seq 1 90); do
    if timeout 2 bash -c '</dev/tcp/127.0.0.1/8082' 2>/dev/null; then break; fi
    sleep 20
done
timeout 2 bash -c '</dev/tcp/127.0.0.1/8082' 2>/dev/null \
    || { echo "relay unreachable" >> "$LOG"; exit 1; }

echo "--- [A] qgemv N-tile scan ---" >> "$LOG"
for bn in 256 512 1024; do
    echo "QEFT_GEMV_BN=$bn" >> "$LOG"
    QEFT_GEMV_BN=$bn timeout 1800 python scripts/tpu_kernel_bench.py \
        >> "$LOG" 2>&1 || echo "bn=$bn FAILED" >> "$LOG"
done

echo "--- [B] int8 KV decode bench ---" >> "$LOG"
QEFT_KV_DTYPE=int8 timeout 3600 python bench.py >> "$LOG" 2>&1 \
    || echo "int8 kv @512 FAILED" >> "$LOG"
QEFT_KV_DTYPE=int8 QEFT_BENCH_MAXLEN=4096 timeout 3600 python bench.py \
    >> "$LOG" 2>&1 || echo "int8 kv @4096 FAILED" >> "$LOG"
QEFT_BENCH_MAXLEN=4096 timeout 3600 python bench.py >> "$LOG" 2>&1 \
    || echo "bf16 kv @4096 FAILED" >> "$LOG"

echo "--- [C] int8 KV + quant lm_head ---" >> "$LOG"
QEFT_KV_DTYPE=int8 QEFT_QUANT_LMHEAD=1 timeout 3600 python bench.py \
    >> "$LOG" 2>&1 || echo "combo FAILED" >> "$LOG"

echo "--- [D] pallas attention @512 ---" >> "$LOG"
QEFT_PALLAS_ATTN=1 timeout 3600 python bench.py >> "$LOG" 2>&1 \
    || echo "pallas attn @512 FAILED" >> "$LOG"

echo "=== chip session 2 done $(date -u) ===" >> "$LOG"
