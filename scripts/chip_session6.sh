#!/bin/bash
# Round-2 chip session 6: stacked-gemv A/B + the quality oracle session 4
# skipped ([H] was appended after bash passed that offset).
#   I. bench.py with QEFT_STACKED_GEMV=1 (StackedLinear decode) vs default,
#      plain and best-config, 512 and 4096 slots
#   H. int8-KV streaming-PPL quality oracle (main --benchmark decode path)
# Appends to ckpt/chip_session6.log.
set -uo pipefail
cd /root/repo
LOG=ckpt/chip_session6.log
mkdir -p ckpt
export PYTHONPATH="${PYTHONPATH:+$PYTHONPATH:}/root/repo"

echo "=== chip session 6 $(date -u) ===" >> "$LOG"

for i in $(seq 1 1080); do
    if timeout 2 bash -c '</dev/tcp/127.0.0.1/8082' 2>/dev/null; then break; fi
    sleep 20
done
timeout 2 bash -c '</dev/tcp/127.0.0.1/8082' 2>/dev/null \
    || { echo "relay unreachable" >> "$LOG"; exit 1; }
echo "relay up at $(date -u)" >> "$LOG"

echo "--- [I] stacked-gemv A/B ---" >> "$LOG"
QEFT_STACKED_GEMV=1 timeout 3600 python bench.py >> "$LOG" 2>&1 \
    || echo "stacked @512 FAILED" >> "$LOG"
QEFT_STACKED_GEMV=1 QEFT_KV_DTYPE=int8 QEFT_QUANT_LMHEAD=1 timeout 3600 \
    python bench.py >> "$LOG" 2>&1 || echo "stacked best-config FAILED" >> "$LOG"
QEFT_STACKED_GEMV=1 QEFT_KV_DTYPE=int8 QEFT_BENCH_MAXLEN=4096 timeout 3600 \
    python bench.py >> "$LOG" 2>&1 || echo "stacked int8 @4096 FAILED" >> "$LOG"

echo "--- [H] int8-KV quality oracle: streaming PPL through the decode path ---" >> "$LOG"
timeout 3600 python -m qeft_tpu.main llama2-7b synthetic \
    --load ckpt/llama2_7b_w4g128r128_packed --benchmark 128 --seqlen 512 \
    --logfile "$LOG" >> "$LOG" 2>&1 || echo "bf16-kv streaming ppl FAILED" >> "$LOG"
QEFT_KV_DTYPE=int8 timeout 3600 python -m qeft_tpu.main llama2-7b synthetic \
    --load ckpt/llama2_7b_w4g128r128_packed --benchmark 128 --seqlen 512 \
    --logfile "$LOG" >> "$LOG" 2>&1 || echo "int8-kv streaming ppl FAILED" >> "$LOG"
QEFT_QUANT_LMHEAD=1 timeout 3600 python -m qeft_tpu.main llama2-7b synthetic \
    --load ckpt/llama2_7b_w4g128r128_packed --benchmark 128 --seqlen 512 \
    --logfile "$LOG" >> "$LOG" 2>&1 || echo "quant-lmhead streaming ppl FAILED" >> "$LOG"

echo "=== chip session 6 done $(date -u) ===" >> "$LOG"
