"""Migrate a packed checkpoint from the round-2 group-major word layout
(packed row gi*h + jj) to the group-interleaved layout (row jj*G + gi —
packing.py's current contract).  The migration is a pure row permutation of
each qweight's int32 words: codes, scales, zeros, outlier slabs, biases and
reorder ids are untouched.

Usage: python scripts/migrate_word_layout.py ckpt/llama2_7b_w4g128r128_packed
(writes in place; idempotence is NOT detectable — run exactly once on
checkpoints produced before the layout change).
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def interleave_perm(k8: int, group_size: int) -> np.ndarray:
    """perm st qweight_new[r] = qweight_old[perm[r]]."""
    k = k8 * 8
    g = group_size if group_size > 0 else k
    h = g // 8
    n_groups = k // g
    new = np.arange(k8)
    gi = new % n_groups
    jj = new // n_groups
    return gi * h + jj


def main(path: str) -> None:
    npz = np.load(path + ".npz", allow_pickle=False)
    out = {}
    n_migrated = 0
    for name, arr in npz.items():
        out[name] = arr
    for name in list(out):
        if not name.endswith("qweight"):
            continue
        base = name[: -len("qweight")]
        gs = int(out[base + "__group_size"])
        qw = out[name]
        k8 = qw.shape[-2]
        perm = interleave_perm(k8, gs)
        out[name] = np.ascontiguousarray(np.take(qw, perm, axis=-2))
        n_migrated += 1
    np.savez(path + ".npz", **out)
    print(f"migrated {n_migrated} packed linears in {path}.npz")


if __name__ == "__main__":
    main(sys.argv[1])
