#!/bin/bash
# Round-2 chip session 4: fetch-synced measurement re-runs (54e55e7 showed
# block_until_ready is not a completion barrier on the relayed chip, so
# session-3's [A]/[B] numbers are invalid).
#   V. barrier validation: block_until_ready vs data-fetch on the same loop
#   A. qgemv N-tile scan (fetch-synced)
#   B. decode decomposition (fetch-synced), bf16/int8 KV, 512/4096 slots
#   F. headline bench re-run (fetch-synced HBM bandwidth denominator)
#   G. serving engine throughput (burst decoding), 8 slots
# Appends to ckpt/chip_session4.log.
set -uo pipefail
cd /root/repo
LOG=ckpt/chip_session4.log
mkdir -p ckpt
export PYTHONPATH="${PYTHONPATH:+$PYTHONPATH:}/root/repo"

echo "=== chip session 4 $(date -u) ===" >> "$LOG"

for i in $(seq 1 1080); do
    if timeout 2 bash -c '</dev/tcp/127.0.0.1/8082' 2>/dev/null; then break; fi
    sleep 20
done
timeout 2 bash -c '</dev/tcp/127.0.0.1/8082' 2>/dev/null \
    || { echo "relay unreachable" >> "$LOG"; exit 1; }
echo "relay up at $(date -u)" >> "$LOG"

echo "--- [V] barrier validation ---" >> "$LOG"
timeout 1800 python scripts/barrier_check.py >> "$LOG" 2>&1 \
    || echo "barrier check FAILED" >> "$LOG"

echo "--- [A] qgemv N-tile scan (fetch-synced) ---" >> "$LOG"
for bn in 256 512; do
    echo "QEFT_GEMV_BN=$bn" >> "$LOG"
    QEFT_GEMV_BN=$bn timeout 1800 python scripts/tpu_kernel_bench.py \
        >> "$LOG" 2>&1 || echo "bn=$bn FAILED" >> "$LOG"
done

echo "--- [B] decode decomposition (fetch-synced) ---" >> "$LOG"
timeout 3600 python scripts/decode_decompose.py >> "$LOG" 2>&1 \
    || echo "decompose @512 FAILED" >> "$LOG"
QEFT_KV_DTYPE=int8 timeout 3600 python scripts/decode_decompose.py \
    >> "$LOG" 2>&1 || echo "decompose int8 @512 FAILED" >> "$LOG"
QEFT_BENCH_MAXLEN=4096 timeout 3600 python scripts/decode_decompose.py \
    >> "$LOG" 2>&1 || echo "decompose @4096 FAILED" >> "$LOG"

echo "--- [F] headline re-run (fetch-synced hbm bw) ---" >> "$LOG"
timeout 3600 python bench.py >> "$LOG" 2>&1 || echo "bench FAILED" >> "$LOG"
QEFT_KV_DTYPE=int8 QEFT_QUANT_LMHEAD=1 timeout 3600 python bench.py \
    >> "$LOG" 2>&1 || echo "best-config FAILED" >> "$LOG"
QEFT_KV_DTYPE=int8 QEFT_BENCH_MAXLEN=4096 timeout 3600 python bench.py \
    >> "$LOG" 2>&1 || echo "int8 kv @4096 FAILED" >> "$LOG"

echo "--- [E2] full-depth self-draft: on-chip acceptance sanity ---" >> "$LOG"
# draft == target (32-layer slice): greedy acceptance must be gamma (4.0);
# random-weight models cannot demo PARTIAL-depth acceptance (sliced drafts
# of a random net are uncorrelated), so this validates the machinery instead
timeout 3600 python -m qeft_tpu.run_benchmark --method spec \
    --load ckpt/llama2_7b_w4g128r128_packed --draft_layers 32 --gamma 4 \
    --gen 64 --logfile "$LOG" >> "$LOG" 2>&1 \
    || echo "full-depth self-spec FAILED" >> "$LOG"

echo "--- [G] serving engine throughput ---" >> "$LOG"
timeout 3600 python -m qeft_tpu.run_benchmark --method engine \
    --load ckpt/llama2_7b_w4g128r128_packed --batch 8 --requests 16 \
    --burst 16 --gen 128 --logfile "$LOG" >> "$LOG" 2>&1 \
    || echo "engine bench FAILED" >> "$LOG"

echo "--- [H] int8-KV quality oracle: streaming PPL through the decode path ---" >> "$LOG"
timeout 3600 python -m qeft_tpu.main llama2-7b synthetic \
    --load ckpt/llama2_7b_w4g128r128_packed --benchmark 128 --seqlen 512 \
    --logfile "$LOG" >> "$LOG" 2>&1 || echo "bf16-kv streaming ppl FAILED" >> "$LOG"
QEFT_KV_DTYPE=int8 timeout 3600 python -m qeft_tpu.main llama2-7b synthetic \
    --load ckpt/llama2_7b_w4g128r128_packed --benchmark 128 --seqlen 512 \
    --logfile "$LOG" >> "$LOG" 2>&1 || echo "int8-kv streaming ppl FAILED" >> "$LOG"

echo "=== chip session 4 done $(date -u) ===" >> "$LOG"
