"""Calibration / evaluation / fine-tuning data loaders.

Capability parity with reference `get_loaders`
(/root/reference/qeft/utils/datautils.py:13-192): wikitext2 / ptb / c4 /
platypus / hellaswag / custom-file sources, seeded random seqlen-token crops
for calibration (train=True) or a single test encoding (train=False).

TPU-native differences: tokens come back as numpy arrays [nsamples, seqlen]
(the functional pipeline takes token arrays, not torch tensors), and a
``synthetic`` source provides deterministic data so every pipeline runs
hermetically on machines without network/dataset access.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def _crop_samples(ids: np.ndarray, nsamples: int, seqlen: int, seed: int) -> np.ndarray:
    """Seeded random seqlen-token crops (reference datautils.py:24-31)."""
    rng = np.random.default_rng(seed)
    n = ids.shape[0]
    out = np.empty((nsamples, seqlen), dtype=np.int64)
    for i in range(nsamples):
        start = int(rng.integers(0, n - seqlen - 1))
        out[i] = ids[start : start + seqlen]
    return out


def _sample_doc_crops(
    doc_tokens,  # Callable[[int], np.ndarray]: tokenized document i
    n_docs: int,
    nsamples: int,
    seqlen: int,
    seed: int,
) -> np.ndarray:
    """Per-sample RANDOM-DOCUMENT crops — the reference's c4 calibration
    protocol (datautils.py:58-91): each calibration sample re-draws a random
    document until one longer than ``seqlen`` tokens is found, then crops a
    random seqlen window FROM THAT DOCUMENT.  (Joining documents into one
    corpus and cropping from it — what wikitext-style sources do — yields a
    different calibration distribution: crops that span document boundaries
    and a length-weighted document mix.)"""
    rng = np.random.default_rng(seed)
    out = np.empty((nsamples, seqlen), dtype=np.int64)
    for i in range(nsamples):
        while True:
            ids = doc_tokens(int(rng.integers(0, n_docs)))
            if ids.shape[0] > seqlen:
                break
        start = int(rng.integers(0, ids.shape[0] - seqlen))
        out[i] = ids[start : start + seqlen]
    return out


def _tokenize_corpus(text: str, model: str):
    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(model, use_fast=False)
    return np.asarray(tok(text, return_tensors="np").input_ids[0])


def _load_hf(name: str, model: str, train: bool) -> np.ndarray:
    import datasets as hfd

    if name == "wikitext2":
        split = "train" if train else "test"
        d = hfd.load_dataset("wikitext", "wikitext-2-raw-v1", split=split)
        return _tokenize_corpus("\n\n".join(d["text"]), model)
    if name == "ptb":
        split = "train" if train else "validation"
        d = hfd.load_dataset("ptb_text_only", "penn_treebank", split=split)
        return _tokenize_corpus(" ".join(d["sentence"]), model)
    if name == "c4":
        if train:
            d = hfd.load_dataset(
                "allenai/c4",
                data_files={"train": "en/c4-train.00000-of-01024.json.gz"},
                split="train",
            )
        else:
            d = hfd.load_dataset(
                "allenai/c4",
                data_files={"validation": "en/c4-validation.00000-of-00008.json.gz"},
                split="validation",
            )
        return _tokenize_corpus(" ".join(d["text"][:2000]), model)
    if name == "platypus":
        d = hfd.load_dataset("garage-bAInd/Open-Platypus", split="train")
        text = "\n\n".join(ex["instruction"] + "\n" + ex["output"] for ex in d)
        return _tokenize_corpus(text, model)
    if name == "hellaswag":
        d = hfd.load_dataset("hellaswag", split="train")
        text = "\n\n".join(ex["ctx"] + " " + ex["endings"][int(ex["label"])] for ex in d)
        return _tokenize_corpus(text, model)
    raise ValueError(f"unknown dataset {name}")


def _synthetic_corpus(vocab_size: int, length: int, seed: int) -> np.ndarray:
    """Deterministic pseudo-natural token stream: a mixture of Zipfian unigram
    draws and short repeated n-grams (so PPL harnesses see non-trivial
    structure)."""
    rng = np.random.default_rng(seed)
    ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
    probs = 1.0 / ranks**1.1
    probs /= probs.sum()
    ids = rng.choice(vocab_size, size=length, p=probs)
    # inject repeated trigrams for local predictability
    for _ in range(length // 64):
        pos = int(rng.integers(0, length - 8))
        ids[pos + 3 : pos + 6] = ids[pos : pos + 3]
    return ids.astype(np.int64)


def get_calibration_tokens(
    name: str,
    nsamples: int,
    seed: int,
    seqlen: int,
    model: Optional[str] = None,
    vocab_size: int = 32000,
) -> np.ndarray:
    """[nsamples, seqlen] calibration token crops."""
    if name == "synthetic":
        corpus = _synthetic_corpus(vocab_size, max(seqlen * (nsamples + 2), 1 << 16), seed)
    elif name.endswith(".npy"):
        corpus = np.load(name)
    elif name == "c4":
        # reference protocol: per-sample random-document crops, tokenizing
        # only the chosen documents (datautils.py:58-91)
        import datasets as hfd
        from transformers import AutoTokenizer

        d = hfd.load_dataset(
            "allenai/c4",
            data_files={"train": "en/c4-train.00000-of-01024.json.gz"},
            split="train",
        )
        tok = AutoTokenizer.from_pretrained(model, use_fast=False)

        def doc_tokens(i):
            return np.asarray(tok(d[i]["text"], return_tensors="np").input_ids[0])

        return _sample_doc_crops(doc_tokens, len(d), nsamples, seqlen, seed)
    else:
        corpus = _load_hf(name, model, train=True)
    return _crop_samples(corpus, nsamples, seqlen, seed)


def get_loaders(
    name: str,
    nsamples: int = 128,
    seed: int = 0,
    seqlen: int = 2048,
    model: Optional[str] = None,
    train: bool = True,
    vocab_size: int = 32000,
):
    """Reference-compatible entry: train=True -> [nsamples, seqlen] crops;
    train=False -> the full test token stream [n_tokens]."""
    if train:
        return get_calibration_tokens(name, nsamples, seed, seqlen, model, vocab_size)
    if name == "synthetic":
        return _synthetic_corpus(vocab_size, 1 << 18, seed + 1)
    if name.endswith(".npy"):
        return np.load(name)
    return _load_hf(name, model, train=False)
