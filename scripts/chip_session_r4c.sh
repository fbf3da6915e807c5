#!/bin/bash
# Round-4 chip session C: the copy-free stacked-cache decode attention
# (QEFT_ATTN_STACKED; ops/pallas_attention.py::decode_attention_stacked).
# The layer scan stops slicing + dynamic-update-slicing each layer's KV slab
# (~0.5 GB/token of copy traffic at the 512-slot 7B cache); the kernel DMAs
# the slab in place, length-clamped, with the new token as an extra flash
# term.  Block-size sweep included: at a 512-slot cache the default one-block
# read cannot clamp; blk=128/256 read only ceil(pos/blk) blocks.
set -uo pipefail
cd /root/repo
LOG=ckpt/chip_r4c.log
run() {
  export QEFT_BENCH_13B=0
  echo "=== $1 ===" | tee -a "$LOG"
  shift
  timeout 2100 env "$@" python bench.py 2>>/tmp/chip_r4c_err.log | tee -a "$LOG"
}
echo "--- session r4c $(date -u +%FT%TZ) $(git rev-parse --short HEAD) ---" >> "$LOG"
run "F stacked-attn" QEFT_ATTN_STACKED=1
run "F128 stacked-attn blk=128" QEFT_ATTN_STACKED=1 QEFT_ATTN_BLK=128
run "F256 stacked-attn blk=256" QEFT_ATTN_STACKED=1 QEFT_ATTN_BLK=256
run "G stacked+pad-upgate" QEFT_ATTN_STACKED=1 QEFT_ATTN_BLK=256 QEFT_PAD_UPGATE=1
run "H G+int8kv+int4lm" QEFT_ATTN_STACKED=1 QEFT_ATTN_BLK=256 QEFT_PAD_UPGATE=1 QEFT_KV_DTYPE=int8 QEFT_QUANT_LMHEAD=1
