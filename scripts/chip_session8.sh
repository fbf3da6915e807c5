#!/bin/bash
# Round-3 chip session 8: squeeze the headline past 100 tok/s.
#   A. default headline (sanity; expect ~99.7)
#   B. QEFT_FUSED_DECODE=1 — the fused stage kernel with the NEW scratch-
#      cached prologue (the per-tile recompute that lost 90.7 vs 95.2 is gone)
#   C. int8 KV + int4 lm_head at the new operating point
#   D. QEFT_GEMV_BN=1024 — tile-width sweep under the group-interleaved layout
#   E. best-combo run
# Appends to ckpt/chip_session8.log.
set -uo pipefail
cd /root/repo
LOG=ckpt/chip_session8.log
run() {
  echo "=== $1 ===" | tee -a "$LOG"
  shift
  timeout 1500 env "$@" python bench.py 2>>/tmp/chip8_err.log | tee -a "$LOG"
}
echo "--- session 8 $(date -u +%FT%TZ) $(git rev-parse --short HEAD) ---" >> "$LOG"
run "A default" QEFT_NOOP=1
run "B fused+scratch" QEFT_FUSED_DECODE=1
run "C int8kv+int4lm" QEFT_KV_DTYPE=int8 QEFT_QUANT_LMHEAD=1
run "D bn1024" QEFT_GEMV_BN=1024
run "E fused+int8kv+int4lm" QEFT_FUSED_DECODE=1 QEFT_KV_DTYPE=int8 QEFT_QUANT_LMHEAD=1
