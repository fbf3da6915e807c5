#!/bin/bash
# Round-5 chain, attempt 4: waits for chain3 (currently finishing r5d) to
# write its done marker, then reruns r5c (the WCT session — its first run
# crashed on the flash-JVP bug, fixed in 111e31f) and runs r5e (13B
# recovered oracle + reference-protocol benchmark).
set -uo pipefail
cd /root/repo
LOG=ckpt/chip_r5_chain.log
N0=$(grep -c "chain3 done" "$LOG" 2>/dev/null || echo 0)
echo "--- chain4 start $(date -u +%FT%TZ) ---" >> "$LOG"
for i in $(seq 1 360); do
  N=$(grep -c "chain3 done" "$LOG" 2>/dev/null || echo 0)
  [ "$N" -gt "$N0" ] && break
  pgrep -f chip_session_r5_chain3.sh >/dev/null 2>&1 || break
  sleep 20
done
echo "chain3 finished; chain4 continues $(date -u +%FT%TZ)" >> "$LOG"

bash scripts/chip_session_r5c.sh >> "$LOG" 2>&1 || echo "r5c rerun FAILED" >> "$LOG"
echo "r5c rerun done $(date -u +%FT%TZ)" >> "$LOG"

bash scripts/chip_session_r5e.sh >> "$LOG" 2>&1 || echo "r5e FAILED" >> "$LOG"
echo "--- chain4 done $(date -u +%FT%TZ) ---" >> "$LOG"
