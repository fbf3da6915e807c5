"""r5c W3 standalone: WCT overlay save -> load_wct reload -> packed-path
eval equality on the real 7B checkpoint (reference load_wctmodel semantics,
modelutils.py:185-217).  Host-stages every load (one device transfer per
model) — the inline r5c version loaded base+overlay straight to the device
through the relay twice and timed out.

    python scripts/w3_overlay_check.py [wct_ckpt] [base_ckpt]
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

WCT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/ckpt/wct_r5/wct_final"
BASE = (sys.argv[2] if len(sys.argv) > 2
        else "/root/repo/ckpt/llama2_7b_w4g128r128_packed")
SEQLEN = int(sys.argv[3]) if len(sys.argv) > 3 else 512


def main():
    from qeft_tpu.checkpoint import load_packed, load_wct
    from qeft_tpu.data.loaders import get_loaders
    from qeft_tpu.eval import eval_ppl
    from qeft_tpu.models.registry import get_model_meta
    from qeft_tpu.pipeline import fuse_packed_stages

    cpu = jax.devices("cpu")[0]
    dev = jax.devices()[0]
    with jax.default_device(cpu):
        base, cfg, family = load_packed(BASE)
        wct, _, _ = load_wct(WCT)
        name = next(n for n, v in wct["layers"].items()
                    if hasattr(v, "oweight") and v.oweight is not None)
        d = float(jnp.max(jnp.abs(
            wct["layers"][name].oweight.astype(jnp.float32)
            - base["layers"][name].oweight.astype(jnp.float32))))
        del base
        fused = fuse_packed_stages(
            jax.tree.map(lambda a: a, wct), get_model_meta(family)
        )
    print(f"max |d oweight({name})| base->trained: {d:.6f}")
    assert d > 0, "overlay identical to base: training had no effect?"

    data = get_loaders("synthetic", nsamples=2, seed=0, seqlen=SEQLEN,
                       model=None, train=False,
                       vocab_size=cfg.vocab_size)
    wct = jax.device_put(wct, dev)
    p1 = eval_ppl(wct, data, cfg, seqlen=SEQLEN, max_windows=2)
    del wct
    fused = jax.device_put(fused, dev)
    p2 = eval_ppl(fused, data, cfg, seqlen=SEQLEN, max_windows=2)
    print(f"wct overlay ppl plain={p1:.4f} fused={p2:.4f} "
          f"delta={abs(p1 - p2) / p1 * 100:.3f}%")
    assert abs(p1 - p2) / p1 < 0.01
    print("W3 OK")


if __name__ == "__main__":
    main()
