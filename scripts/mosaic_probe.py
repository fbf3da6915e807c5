"""Mosaic-lint: AOT lower+compile every production Pallas kernel at flagship
shapes WITHOUT running anything on the device.

Catches lowering/layout rejections (block-mapping rules, lane-dim slicing,
scoped-VMEM overflow) that interpret-mode tests cannot see and that otherwise
surface an hour into a chip session (sessions 2-3 lost their int8-KV runs to
exactly this class of failure).  Needs the remote compile service (the axon
relay) but no device time, so it can run while benches occupy the chip.
"""

import sys
import time

sys.path.append("/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from qeft_tpu.ops.packing import QLinearParams, pack_codes
from qeft_tpu.ops.pallas_attention import decode_attention
from qeft_tpu.ops.pallas_qmm import qgemv, qgemm, qgemm_t

FAILED = []


def probe(name, fn, *args):
    t0 = time.time()
    try:
        jax.jit(fn).lower(*args).compile()
        print(f"ok   {name}  ({time.time()-t0:.1f}s)", flush=True)
    except Exception as e:
        FAILED.append(name)
        msg = str(e).splitlines()
        head = next((l for l in msg if "Mosaic" in l or "error" in l.lower()), msg[0] if msg else "")
        print(f"FAIL {name}: {head[:200]}", flush=True)


def packed(k, n, g=128, r=128):
    codes = jnp.zeros((k, n), jnp.int32)
    return QLinearParams(
        qweight=pack_codes(codes, g),
        scales=jnp.ones((k // g, n), jnp.bfloat16),
        scaled_zeros=jnp.zeros((k // g, n), jnp.bfloat16),
        oweight=jnp.zeros((r, n), jnp.bfloat16) if r else None,
        bias=None, group_size=g,
    )


# --- qgemv / qgemm at the 7B fused-stage shapes ----------------------------
SHAPES_7B = {  # (K, N): qkv, o, upgate, down (hidden 4096, ffn 11008)
    "qkv": (4096, 12288), "o": (4096, 4096),
    "upgate": (4096, 22016), "down": (11008, 4096),
}
for name, (k, n) in SHAPES_7B.items():
    p = packed(k, n)
    x1 = jnp.zeros((1, k), jnp.bfloat16)
    xp = jnp.zeros((512, k), jnp.bfloat16)
    probe(f"qgemv 7B {name} [{k}x{n}]", lambda x, p=p: qgemv(x, p), x1)
    probe(f"qgemm 7B {name} [{k}x{n}]", lambda x, p=p: qgemm(x, p), xp)
    g = jnp.zeros((8, n), jnp.bfloat16)
    probe(f"qgemm_t 7B {name} [{k}x{n}]", lambda g, p=p: qgemm_t(g, p), g)

# 13B down-proj (hidden 5120, ffn 13824)
p13 = packed(13824, 5120)
probe("qgemv 13B down [13824x5120]", lambda x: qgemv(x, p13),
      jnp.zeros((1, 13824), jnp.bfloat16))

# --- decode attention: MHA + GQA, bf16 + int8, several cache sizes ---------
for tag, (h, hkv, d) in {"7B-mha": (32, 32, 128), "llama3-gqa": (32, 8, 128)}.items():
    for s in (512, 1088, 4096):
        q = jnp.zeros((1, h, d), jnp.bfloat16)
        kc = jnp.zeros((1, hkv, s, d), jnp.bfloat16)
        probe(f"attn {tag} bf16 s={s}",
              lambda q, kc, vc: decode_attention(q, kc, vc, jnp.int32(7)), q, kc, kc)
        # int8 caches are 128-aligned by construction (init_kv_cache rounds up)
        sq = (s + 127) // 128 * 128
        kq = jnp.zeros((1, hkv, sq, d), jnp.int8)
        ks = jnp.zeros((1, hkv, sq), jnp.float32)
        probe(f"attn {tag} int8 s={sq}",
              lambda q, kc, vc, ks, vs: decode_attention(
                  q, kc, vc, jnp.int32(7), k_scale=ks, v_scale=vs),
              q, kq, kq, ks, ks)

print(f"\n{len(FAILED)} failures" + (": " + ", ".join(FAILED) if FAILED else ""))
sys.exit(1 if FAILED else 0)
