#!/bin/bash
# Round-4 chip session A: close the decode gap toward vs_baseline >= 0.8
# (VERDICT r3 #1) on the REAL pipeline checkpoint.
#   A. default headline (sanity + provenance: expect ~106.7, real_pipeline_ckpt)
#   B. QEFT_PALLAS_ATTN=1 — Pallas decode attention at the 512-slot cache,
#      A/B'd through the WHOLE generate loop (real position distribution,
#      avg ~190 valid slots) instead of the old steady-state pos=510 probe
#   C. QEFT_PAD_UPGATE=1 — upgate halves padded to 11264 so bn=1024 applies
#   D. B+C combined
#   E. D + int8 KV + int4 lm_head (best-absolute config check)
# Appends to ckpt/chip_r4a.log.
set -uo pipefail
cd /root/repo
LOG=ckpt/chip_r4a.log
run() {
  export QEFT_BENCH_13B=0
  echo "=== $1 ===" | tee -a "$LOG"
  shift
  timeout 1500 env "$@" python bench.py 2>>/tmp/chip_r4a_err.log | tee -a "$LOG"
}
echo "--- session r4a $(date -u +%FT%TZ) $(git rev-parse --short HEAD) ---" >> "$LOG"
run "A default" QEFT_NOOP=1
run "B pallas-attn@512" QEFT_PALLAS_ATTN=1
run "C pad-upgate" QEFT_PAD_UPGATE=1
run "D pallas-attn+pad-upgate" QEFT_PALLAS_ATTN=1 QEFT_PAD_UPGATE=1
run "E D+int8kv+int4lm" QEFT_PALLAS_ATTN=1 QEFT_PAD_UPGATE=1 QEFT_KV_DTYPE=int8 QEFT_QUANT_LMHEAD=1
