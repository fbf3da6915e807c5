#!/bin/bash
# Round-5 chip session C: sustained on-chip WCT run (VERDICT r4 #6) — the
# reference's whole finetune workflow (/root/reference/qeft/finetune.py:
# 761-1124) at a realistic step count on the REAL 7B packed checkpoint:
#   1) train ~250 steps with periodic validation + synthetic MC eval +
#      periodic WCT checkpoints, KILLED mid-run by timeout,
#   2) resumed from the optimizer-state sidecar to completion,
#   3) the final WCT overlay reloaded and PPL-evaluated through the packed
#      path (load_wct -> eval), closing the save->reload->eval loop.
# Appends to ckpt/chip_r5c.log.
set -uo pipefail
cd /root/repo
LOG=ckpt/chip_r5c.log
CKPT=/root/repo/ckpt/llama2_7b_w4g128r128_packed
OUT=/root/repo/ckpt/wct_r5
echo "--- session r5c $(date -u +%FT%TZ) $(git rev-parse --short HEAD) ---" >> "$LOG"
rm -rf "$OUT"

FT_ARGS=(--load "$CKPT" --dataset synthetic --output_dir "$OUT"
         --max_steps 250 --batch_size 2 --grad_accum 1 --source_max_len 256
         --save_steps 25 --log_steps 10 --eval_steps 50 --eval_nsamples 8
         --do_mmlu_eval --mmlu_source synthetic --mmlu_eval_steps 100
         --learning_rate 1e-4)

echo "=== W1 train (killed mid-run) ===" | tee -a "$LOG"
# adaptive kill: wait for the FIRST periodic checkpoint + one more save
# interval, then kill the exact PID (never a pattern) — this guarantees the
# kill lands mid-run with an optimizer sidecar on disk, whatever the step
# time turns out to be
python -m qeft_tpu.run_finetune "${FT_ARGS[@]}" >> "$LOG" 2>&1 &
FT_PID=$!
for i in $(seq 1 240); do
  ls "$OUT"/opt_step*.npz >/dev/null 2>&1 && break
  kill -0 "$FT_PID" 2>/dev/null || break
  sleep 10
done
if kill -0 "$FT_PID" 2>/dev/null; then
  sleep 45   # let it get past the checkpoint, die between saves
  kill "$FT_PID" 2>/dev/null || true
  echo "W1 killed mid-run (as intended)" | tee -a "$LOG"
fi
wait "$FT_PID" || true
echo "=== W1 done; checkpoints: $(ls "$OUT" 2>/dev/null | tr '\n' ' ') ===" | tee -a "$LOG"

echo "=== W2 resume to completion ===" | tee -a "$LOG"
timeout 2400 python -m qeft_tpu.run_finetune "${FT_ARGS[@]}" 2>&1 | tee -a "$LOG"
echo "=== W2 rc=${PIPESTATUS[0]} ===" | tee -a "$LOG"

echo "=== W3 overlay reload -> packed-path eval ===" | tee -a "$LOG"
timeout 1800 python - <<'EOF' 2>&1 | tee -a "$LOG"
import sys, numpy as np
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from qeft_tpu.checkpoint import load_packed, load_wct
from qeft_tpu.models.registry import get_model_meta
from qeft_tpu.pipeline import fuse_packed_stages
from qeft_tpu.eval import eval_ppl
from qeft_tpu.data.loaders import get_loaders

base, cfg, family = load_packed("/root/repo/ckpt/llama2_7b_w4g128r128_packed")
wct, cfg2, fam2 = load_wct("/root/repo/ckpt/wct_r5/wct_final")
# the overlay must have actually trained the oweights
name = next(n for n, v in wct["layers"].items()
            if hasattr(v, "oweight") and v.oweight is not None)
d = float(jnp.max(jnp.abs(
    wct["layers"][name].oweight.astype(jnp.float32)
    - base["layers"][name].oweight.astype(jnp.float32))))
print(f"max |d oweight({name})| base->trained: {d:.6f}")
assert d > 0, "overlay identical to base: training had no effect?"
meta = get_model_meta(family)
data = get_loaders("synthetic", nsamples=2, seed=0, seqlen=512,
                   model=None, train=False)
p1 = eval_ppl(wct, data, cfg, seqlen=512, max_windows=2)
p2 = eval_ppl(fuse_packed_stages(wct, meta), data, cfg, seqlen=512,
              max_windows=2)
print(f"wct overlay ppl plain={p1:.4f} fused={p2:.4f} "
      f"delta={(abs(p1-p2)/p1*100):.3f}%")
assert abs(p1 - p2) / p1 < 0.01
print("W3 OK")
EOF
echo "=== W3 rc=$? ===" | tee -a "$LOG"
echo "--- session r5c done $(date -u +%FT%TZ) ---" >> "$LOG"
