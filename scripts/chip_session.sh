#!/bin/bash
# Round-2 chip session: everything that needs the real TPU, in order.
# Waits for the axon relay, then:
#   1. full 7B pipeline -> real packed checkpoint (scripts/quant7b.sh)
#   2. headline bench on the real checkpoint (bench.py)
#   3. 7B WCT fine-tune steps through the Pallas forward+backward on-chip
#   4. speculative + batched-speculative decode benchmarks
# Appends everything to ckpt/chip_session.log for BASELINE.md.
set -uo pipefail
cd /root/repo
LOG=ckpt/chip_session.log
mkdir -p ckpt

echo "=== chip session $(date -u) ===" >> "$LOG"

# [0] wait for the relay (up to 6h — it is restored out-of-band)
for i in $(seq 1 1080); do
    if timeout 2 bash -c '</dev/tcp/127.0.0.1/8082' 2>/dev/null; then break; fi
    sleep 20
done
timeout 2 bash -c '</dev/tcp/127.0.0.1/8082' 2>/dev/null \
    || { echo "relay never came back" >> "$LOG"; exit 1; }
echo "relay up at $(date -u)" >> "$LOG"

# refuse to double-run if a pipeline is already going
if pgrep -f "qeft_tpu.extract_outidx llama2-7b" > /dev/null; then
    echo "pipeline already running; aborting" >> "$LOG"; exit 1
fi

# [1] 7B pipeline (skip if the checkpoint already exists)
if [ ! -f ckpt/llama2_7b_w4g128r128_packed.npz ]; then
    bash scripts/quant7b.sh >> "$LOG" 2>&1 || echo "quant7b FAILED" >> "$LOG"
fi

# [2] headline bench on the real checkpoint
python bench.py >> "$LOG" 2>&1 || echo "bench FAILED" >> "$LOG"

# [3] 7B WCT on-chip: a few steps through the packed Pallas fwd+bwd
if [ -f ckpt/llama2_7b_w4g128r128_packed.npz ]; then
    rm -rf ckpt/wct7b
    timeout 3600 python -m qeft_tpu.run_finetune \
        --load ckpt/llama2_7b_w4g128r128_packed --dataset synthetic \
        --output_dir ckpt/wct7b --max_steps 4 --batch_size 1 \
        --source_max_len 256 --log_steps 1 --save_steps 1000 \
        >> "$LOG" 2>&1 || echo "wct7b FAILED" >> "$LOG"
fi

# [3b] 13B end-to-end generation benchmark (BASELINE config 3; prefill +
# decode through the packed Pallas paths, random weights at real shapes)
timeout 3600 python -m qeft_tpu.run_benchmark --method qeft \
    --model llama2-13b --logfile "$LOG" >> "$LOG" 2>&1 \
    || echo "13b bench FAILED" >> "$LOG"

# [4] speculative decode benchmarks (7B target, tiny-v2 draft, random weights)
timeout 3600 python -m qeft_tpu.run_benchmark --method spec \
    --model llama2-7b --draft_model tiny-v2 --gamma 4 \
    --logfile "$LOG" >> "$LOG" 2>&1 || echo "spec bench FAILED" >> "$LOG"
timeout 3600 python -m qeft_tpu.run_benchmark --method spec-batch \
    --model llama2-7b --draft_model tiny-v2 --gamma 4 --batch 4 \
    --logfile "$LOG" >> "$LOG" 2>&1 || echo "spec-batch bench FAILED" >> "$LOG"

echo "=== chip session done $(date -u) ===" >> "$LOG"
