#!/bin/bash
# Round-5 chip-session chain: waits for r5a (the measurement sweep) to
# finish, then runs, in order: r5b (telescoped-kernel A/B), quant13b (the
# real 13B pipeline checkpoint), r5c (sustained WCT), r5d (long-context +
# 13B benchmarks).  Serializes all chip work on the single pooled chip.
set -uo pipefail
cd /root/repo
LOG=ckpt/chip_r5_chain.log
echo "--- chain start $(date -u +%FT%TZ) ---" >> "$LOG"

# wait for r5a to finish: count 'done' markers at chain start so a stale
# line from a previous run can never satisfy the wait (the log is
# append-only), and require either a NEW marker or the r5a process gone
DONE0=$(grep -c "session r5a done" ckpt/chip_r5a.log 2>/dev/null || echo 0)
for i in $(seq 1 360); do
  DONE=$(grep -c "session r5a done" ckpt/chip_r5a.log 2>/dev/null || echo 0)
  [ "$DONE" -gt "$DONE0" ] && break
  pgrep -f chip_session_r5a.sh >/dev/null 2>&1 || break
  sleep 20
done
echo "r5a finished at $(date -u +%FT%TZ)" >> "$LOG"

bash scripts/chip_session_r5b.sh  >> "$LOG" 2>&1 || echo "r5b FAILED" >> "$LOG"
echo "r5b done $(date -u +%FT%TZ)" >> "$LOG"

timeout 10800 bash scripts/quant13b.sh > ckpt/quant13b_run.log 2>&1 \
  || echo "quant13b FAILED rc=$?" >> "$LOG"
echo "quant13b done $(date -u +%FT%TZ)" >> "$LOG"

bash scripts/chip_session_r5c.sh >> "$LOG" 2>&1 || echo "r5c FAILED" >> "$LOG"
echo "r5c done $(date -u +%FT%TZ)" >> "$LOG"

bash scripts/chip_session_r5d.sh >> "$LOG" 2>&1 || echo "r5d FAILED" >> "$LOG"
echo "--- chain done $(date -u +%FT%TZ) ---" >> "$LOG"
