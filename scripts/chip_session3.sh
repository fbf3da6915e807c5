#!/bin/bash
# Round-2 chip session 3: follow-ups to sessions 1-2.
#   A. qgemv N-tile scan (session-2 run failed on PYTHONPATH, now fixed)
#   B. decode-step time decomposition (where do the non-weight-stream ms go)
#   C. int8-KV + Pallas attention @4096 (lowering fix a25e02d)
#   D. 13B bench retry (host-side model build fix dda7b7e)
#   E. self-speculative decoding on the REAL 7B checkpoint (layer-sliced
#      drafts share the target's weights -> real acceptance rates)
#   F. headline best-config confirmation (int8 KV + quant lm_head [+ pallas
#      attention @512])
# Appends to ckpt/chip_session3.log for BASELINE.md.
set -uo pipefail
cd /root/repo
LOG=ckpt/chip_session3.log
mkdir -p ckpt
# APPEND to PYTHONPATH: /root/.axon_site must stay first or the axon TPU
# plugin's sitecustomize never registers and every jax import dies
export PYTHONPATH="${PYTHONPATH:+$PYTHONPATH:}/root/repo"

echo "=== chip session 3 $(date -u) ===" >> "$LOG"

for i in $(seq 1 1080); do
    if timeout 2 bash -c '</dev/tcp/127.0.0.1/8082' 2>/dev/null; then break; fi
    sleep 20
done
timeout 2 bash -c '</dev/tcp/127.0.0.1/8082' 2>/dev/null \
    || { echo "relay unreachable" >> "$LOG"; exit 1; }
echo "relay up at $(date -u)" >> "$LOG"

echo "--- [A] qgemv N-tile scan ---" >> "$LOG"
for bn in 256 512 1024; do
    echo "QEFT_GEMV_BN=$bn" >> "$LOG"
    QEFT_GEMV_BN=$bn timeout 1800 python scripts/tpu_kernel_bench.py \
        >> "$LOG" 2>&1 || echo "bn=$bn FAILED" >> "$LOG"
done

echo "--- [B] decode decomposition ---" >> "$LOG"
timeout 3600 python scripts/decode_decompose.py >> "$LOG" 2>&1 \
    || echo "decompose @512 FAILED" >> "$LOG"
QEFT_KV_DTYPE=int8 timeout 3600 python scripts/decode_decompose.py \
    >> "$LOG" 2>&1 || echo "decompose int8 @512 FAILED" >> "$LOG"
QEFT_BENCH_MAXLEN=4096 timeout 3600 python scripts/decode_decompose.py \
    >> "$LOG" 2>&1 || echo "decompose @4096 FAILED" >> "$LOG"

echo "--- [C] int8 KV + pallas attention @4096 ---" >> "$LOG"
QEFT_KV_DTYPE=int8 QEFT_BENCH_MAXLEN=4096 timeout 3600 python bench.py \
    >> "$LOG" 2>&1 || echo "int8 kv @4096 FAILED" >> "$LOG"

echo "--- [D] 13B bench retry ---" >> "$LOG"
timeout 3600 python -m qeft_tpu.run_benchmark --method qeft \
    --model llama2-13b --logfile "$LOG" >> "$LOG" 2>&1 \
    || echo "13b bench FAILED" >> "$LOG"

echo "--- [E] self-speculative on the real 7B ---" >> "$LOG"
for dl in 4 8; do
    timeout 3600 python -m qeft_tpu.run_benchmark --method spec \
        --load ckpt/llama2_7b_w4g128r128_packed --draft_layers $dl --gamma 4 \
        --logfile "$LOG" >> "$LOG" 2>&1 \
        || echo "self-spec dl=$dl FAILED" >> "$LOG"
done

echo "--- [F] headline best-config ---" >> "$LOG"
QEFT_KV_DTYPE=int8 QEFT_QUANT_LMHEAD=1 timeout 3600 python bench.py \
    >> "$LOG" 2>&1 || echo "best-config FAILED" >> "$LOG"
QEFT_KV_DTYPE=int8 QEFT_QUANT_LMHEAD=1 QEFT_PALLAS_ATTN=1 timeout 3600 \
    python bench.py >> "$LOG" 2>&1 || echo "best-config+pallas-attn FAILED" >> "$LOG"

echo "=== chip session 3 done $(date -u) ===" >> "$LOG"
