#!/bin/bash
# Round-5 chip session B: the dequant-overhang attack (VERDICT r4 #3).
# 1) kernel-level A/B of the telescoped byte-field extraction (probe round 3)
# 2) headline A/B with QEFT_GEMV_TELE=1 on the real checkpoint
# Appends to ckpt/chip_r5b.log.
set -uo pipefail
cd /root/repo
LOG=ckpt/chip_r5b.log
echo "--- session r5b $(date -u +%FT%TZ) $(git rev-parse --short HEAD) ---" >> "$LOG"

run() {
  local name=$1; shift
  echo "=== $name ===" | tee -a "$LOG"
  timeout 2400 env "$@" 2>&1 | tee -a "$LOG"
  echo "=== $name rc=${PIPESTATUS[0]} ===" | tee -a "$LOG"
}

run "K ablation round3 (tele)"  QEFT_ABL_ROUND3=1 python scripts/gemv_ablation_probe.py
run "H1 headline tele=1"        QEFT_BENCH_13B=0 QEFT_GEMV_TELE=1 python bench.py
run "H2 headline tele=0 ctrl"   QEFT_BENCH_13B=0 python bench.py
echo "--- session r5b done $(date -u +%FT%TZ) ---" >> "$LOG"
