"""CLI: convert a FAKE checkpoint into a PACKED checkpoint without
re-running quantization.

The reference forces this choice at save time (`--fake` and/or `--packing`,
main.py:373-501 + modelutils.py:219-268) and offers no later conversion; here
a fake checkpoint carries its quantizer states, so the packed layout can be
produced any time:

    python -m qeft_tpu.convert ckpt/model_fake ckpt/model_packed [--fuse_stages]
"""

from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("src", type=str, help="fake checkpoint path")
    parser.add_argument("dst", type=str, help="packed checkpoint to write")
    parser.add_argument("--fuse_stages", action="store_true",
                        help="pack q/k/v->qkv, up/gate->upgate fused")
    args = parser.parse_args(argv)

    from qeft_tpu.checkpoint import load_fake, save_packed
    from qeft_tpu.models.registry import get_model_meta
    from qeft_tpu.pipeline import pack_model

    params, qstates, cfg, family = load_fake(args.src)
    meta = get_model_meta(family)
    packed = pack_model(
        params, qstates, cfg, meta, fuse_stages=args.fuse_stages
    )
    save_packed(args.dst, packed, cfg, family=family)
    print(f"packed ckpt -> {args.dst}.npz")


if __name__ == "__main__":
    main()
