#!/bin/bash
# Round-5 chip session E: 13B oracle + reference-protocol benchmark — the
# two legs the host-OOM cut out of quant13b step 2/3 (the packed save
# itself succeeded).  Runs the recovered fake-vs-packed oracle
# (scripts/oracle_from_packed.py) and the reference per-token protocol on
# the reloaded 13B checkpoint.  Appends to ckpt/chip_r5e.log.
set -uo pipefail
cd /root/repo
LOG=ckpt/chip_r5e.log
CKPT=/root/repo/ckpt/llama2_13b_w4g128r256_packed
echo "--- session r5e $(date -u +%FT%TZ) $(git rev-parse --short HEAD) ---" >> "$LOG"

run() {
  local name=$1; shift
  echo "=== $name ===" | tee -a "$LOG"
  timeout 3600 env "$@" 2>&1 | tee -a "$LOG"
  echo "=== $name rc=${PIPESTATUS[0]} ===" | tee -a "$LOG"
}

run "O1 13B recovered oracle"  python scripts/oracle_from_packed.py "$CKPT" 512 4
run "O2 13B reload benchmark"  python -m qeft_tpu.main llama2-13b synthetic --load "$CKPT" --eval --eval_windows 4 --seqlen 512 --benchmark 256 --logfile ckpt/quant13b.log
# 13B bench legs rerun with the host-staged load (r5d M1/M2/M3 OOMed the
# chip loading+fusing on-device)
run "O3 13B real-ckpt bench"   QEFT_BENCH_ONLY=13b python bench.py
run "O4 13B int8kv@4096"       QEFT_BENCH_ONLY=13b QEFT_KV_DTYPE=int8 QEFT_BENCH_MAXLEN=4096 python bench.py
run "O5 full default bench"    python bench.py
echo "--- session r5e done $(date -u +%FT%TZ) ---" >> "$LOG"
run "O6 fp bf16 7B decode"     python -m qeft_tpu.run_benchmark --method fp --model llama2-7b --context 64 --gen 128
echo "--- session r5e really done $(date -u +%FT%TZ) ---" >> "$LOG"
