#!/bin/bash
# Round-5 chain CONTINUATION: r5a+r5b already ran; quant13b is in flight
# under PID $1 (or already finished).  Waits for it, then runs r5c (WCT)
# and r5d (long-context + 13B benchmarks).
set -uo pipefail
cd /root/repo
LOG=ckpt/chip_r5_chain.log
Q13_PID=${1:-0}
echo "--- chain2 start $(date -u +%FT%TZ), waiting on quant13b pid=$Q13_PID ---" >> "$LOG"

for i in $(seq 1 540); do
  if [ "$Q13_PID" -gt 0 ] && kill -0 "$Q13_PID" 2>/dev/null; then
    sleep 20; continue
  fi
  break
done
echo "quant13b done $(date -u +%FT%TZ): $(tail -1 ckpt/quant13b_run.log 2>/dev/null)" >> "$LOG"

bash scripts/chip_session_r5c.sh >> "$LOG" 2>&1 || echo "r5c FAILED" >> "$LOG"
echo "r5c done $(date -u +%FT%TZ)" >> "$LOG"

bash scripts/chip_session_r5d.sh >> "$LOG" 2>&1 || echo "r5d FAILED" >> "$LOG"
echo "--- chain2 done $(date -u +%FT%TZ) ---" >> "$LOG"
