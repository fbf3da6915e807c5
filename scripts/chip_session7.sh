#!/bin/bash
# Round-2 chip session 7: token-granular KV writes (c8b6f0a) + stacked-gemv
# default-on A/B.  The session-5 decomposition blamed ~2.1 GB/step of pure
# cache re-stacking at 4096 slots; this session measures the fix.
#   A. headline (now stacked+token-granular by default), 512 slots
#   B. best config: int8 KV + quant lm_head @512
#   C. long context: int8 KV @4096 (was 49.81 stacked / 40.25 scan-sliced)
#   D. bf16 KV @4096 (was 35.2 with pallas attention)
#   E. batch=8 decode (was 209.6 seq-tok/s)
#   F. 13B end-to-end (was 35.13 tok/s)
# Appends to ckpt/chip_session7.log.
set -uo pipefail
cd /root/repo
LOG=ckpt/chip_session7.log
mkdir -p ckpt
export PYTHONPATH="${PYTHONPATH:+$PYTHONPATH:}/root/repo"

echo "=== chip session 7 $(date -u) ===" >> "$LOG"

for i in $(seq 1 1080); do
    if timeout 2 bash -c '</dev/tcp/127.0.0.1/8082' 2>/dev/null; then break; fi
    sleep 20
done
timeout 2 bash -c '</dev/tcp/127.0.0.1/8082' 2>/dev/null \
    || { echo "relay unreachable" >> "$LOG"; exit 1; }
echo "relay up at $(date -u)" >> "$LOG"

echo "--- [A] headline @512 (stacked + token-granular defaults) ---" >> "$LOG"
timeout 3600 python bench.py >> "$LOG" 2>&1 || echo "A FAILED" >> "$LOG"

echo "--- [B] best config: int8 KV + quant lm_head @512 ---" >> "$LOG"
QEFT_KV_DTYPE=int8 QEFT_QUANT_LMHEAD=1 timeout 3600 python bench.py \
    >> "$LOG" 2>&1 || echo "B FAILED" >> "$LOG"

echo "--- [C] int8 KV @4096 ---" >> "$LOG"
QEFT_KV_DTYPE=int8 QEFT_BENCH_MAXLEN=4096 timeout 3600 python bench.py \
    >> "$LOG" 2>&1 || echo "C FAILED" >> "$LOG"

echo "--- [D] bf16 KV @4096 ---" >> "$LOG"
QEFT_BENCH_MAXLEN=4096 timeout 3600 python bench.py >> "$LOG" 2>&1 \
    || echo "D FAILED" >> "$LOG"

echo "--- [E] batch=8 decode, int8 KV ---" >> "$LOG"
QEFT_KV_DTYPE=int8 QEFT_BENCH_BATCH=8 timeout 3600 python bench.py \
    >> "$LOG" 2>&1 || echo "E FAILED" >> "$LOG"

echo "--- [F] 13B end-to-end ---" >> "$LOG"
timeout 3600 python -m qeft_tpu.run_benchmark --method qeft \
    --model llama2-13b --logfile "$LOG" >> "$LOG" 2>&1 \
    || echo "F FAILED" >> "$LOG"

echo "=== chip session 7 done $(date -u) ===" >> "$LOG"
