#!/bin/bash
# Round-5 chain, attempt 3: the TPU worker died mid-13B-extract (fresh
# clients hang on first op; the relay port stays open — the known axon
# failure mode, BASELINE.md round 2).  This orchestrator waits for a REAL
# device op to complete, then reruns quant13b from scratch, then r5c, r5d.
set -uo pipefail
cd /root/repo
LOG=ckpt/chip_r5_chain.log
echo "--- chain3 start $(date -u +%FT%TZ): waiting for TPU worker ---" >> "$LOG"

probe() {
  timeout 180 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((1024, 1024), jnp.bfloat16)
print(float(np.asarray((x @ x).ravel()[0])))
" >/dev/null 2>&1
}

ok=0
for i in $(seq 1 90); do   # up to ~4.5 h of 3-min probes
  if probe; then ok=1; break; fi
  sleep 120
done
if [ "$ok" != 1 ]; then
  echo "TPU worker never returned; aborting chain3 $(date -u +%FT%TZ)" >> "$LOG"
  exit 1
fi
echo "TPU worker back $(date -u +%FT%TZ); restarting quant13b" >> "$LOG"

timeout 10800 bash scripts/quant13b.sh > ckpt/quant13b_run.log 2>&1 \
  || echo "quant13b FAILED rc=$?" >> "$LOG"
echo "quant13b done $(date -u +%FT%TZ): $(tail -1 ckpt/quant13b_run.log)" >> "$LOG"

bash scripts/chip_session_r5c.sh >> "$LOG" 2>&1 || echo "r5c FAILED" >> "$LOG"
echo "r5c done $(date -u +%FT%TZ)" >> "$LOG"

bash scripts/chip_session_r5d.sh >> "$LOG" 2>&1 || echo "r5d FAILED" >> "$LOG"
echo "--- chain3 done $(date -u +%FT%TZ) ---" >> "$LOG"
