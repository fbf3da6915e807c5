#!/bin/bash
# Round-2 chip session 5: the decode-loop gap investigation.
# Session 4 established: qgemv sustains 440-470 GB/s standalone and the chip
# streams 700+ GB/s, yet the decode step runs at ~256 GB/s effective.
#   S. scan-copy probe: lax.scan over stacked leaves vs unrolled vs separate
#   B. decode decomposition, hoist-proof (fori iterations data-dependent)
# Appends to ckpt/chip_session5.log.
set -uo pipefail
cd /root/repo
LOG=ckpt/chip_session5.log
mkdir -p ckpt
export PYTHONPATH="${PYTHONPATH:+$PYTHONPATH:}/root/repo"

echo "=== chip session 5 $(date -u) ===" >> "$LOG"

for i in $(seq 1 1080); do
    if timeout 2 bash -c '</dev/tcp/127.0.0.1/8082' 2>/dev/null; then break; fi
    sleep 20
done
timeout 2 bash -c '</dev/tcp/127.0.0.1/8082' 2>/dev/null \
    || { echo "relay unreachable" >> "$LOG"; exit 1; }
echo "relay up at $(date -u)" >> "$LOG"

echo "--- [S] scan-copy probe ---" >> "$LOG"
timeout 3600 python scripts/scan_copy_probe.py >> "$LOG" 2>&1 \
    || echo "scan probe FAILED" >> "$LOG"

echo "--- [B] decode decomposition (hoist-proof) ---" >> "$LOG"
timeout 3600 python scripts/decode_decompose.py >> "$LOG" 2>&1 \
    || echo "decompose @512 FAILED" >> "$LOG"
QEFT_KV_DTYPE=int8 timeout 3600 python scripts/decode_decompose.py \
    >> "$LOG" 2>&1 || echo "decompose int8 @512 FAILED" >> "$LOG"
QEFT_BENCH_MAXLEN=4096 timeout 3600 python scripts/decode_decompose.py \
    >> "$LOG" 2>&1 || echo "decompose @4096 FAILED" >> "$LOG"

echo "=== chip session 5 done $(date -u) ===" >> "$LOG"
