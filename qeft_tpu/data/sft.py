"""Supervised fine-tuning data: Alpaca-style prompting + batch construction.

Capability parity with the reference finetune data path
(/root/reference/qeft/finetune.py): the Alpaca `Prompter` (finetune.py:50-96),
prompt-masked labels (finetune.py:899-965), and block-packed LM batches for
wikitext-style corpora (finetune.py:792-898).  A synthetic instruction set
makes the pipeline hermetic on machines without dataset access.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, List, Optional

import numpy as np

from qeft_tpu.finetune import IGNORE_INDEX

ALPACA_TEMPLATE_INPUT = (
    "Below is an instruction that describes a task, paired with an input that "
    "provides further context. Write a response that appropriately completes "
    "the request.\n\n### Instruction:\n{instruction}\n\n### Input:\n{input}"
    "\n\n### Response:\n"
)
ALPACA_TEMPLATE_NO_INPUT = (
    "Below is an instruction that describes a task. Write a response that "
    "appropriately completes the request.\n\n### Instruction:\n{instruction}"
    "\n\n### Response:\n"
)


def alpaca_prompt(instruction: str, inp: str = "") -> str:
    """Reference Prompter.generate_prompt (finetune.py:50-96)."""
    if inp:
        return ALPACA_TEMPLATE_INPUT.format(instruction=instruction, input=inp)
    return ALPACA_TEMPLATE_NO_INPUT.format(instruction=instruction)


@dataclasses.dataclass
class SFTExample:
    prompt_ids: np.ndarray
    response_ids: np.ndarray


def mask_and_pad(
    examples: List[SFTExample], max_len: int, pad_id: int = 0, train_on_prompt: bool = False
):
    """Build (input_ids, labels) [B, max_len]; prompt positions get
    IGNORE_INDEX unless train_on_prompt (reference finetune.py:552-565)."""
    b = len(examples)
    input_ids = np.full((b, max_len), pad_id, np.int64)
    labels = np.full((b, max_len), IGNORE_INDEX, np.int64)
    for i, ex in enumerate(examples):
        seq = np.concatenate([ex.prompt_ids, ex.response_ids])[:max_len]
        input_ids[i, : len(seq)] = seq
        start = 0 if train_on_prompt else min(len(ex.prompt_ids), max_len)
        labels[i, start : len(seq)] = seq[start : len(seq)]
    return input_ids, labels


def synthetic_sft_examples(
    n: int, vocab_size: int, seed: int = 0, prompt_len=(4, 24), resp_len=(8, 48)
) -> List[SFTExample]:
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        pl = int(rng.integers(*prompt_len))
        rl = int(rng.integers(*resp_len))
        out.append(
            SFTExample(
                prompt_ids=rng.integers(0, vocab_size, pl),
                response_ids=rng.integers(0, vocab_size, rl),
            )
        )
    return out


def load_sft_examples(
    dataset: str, tokenizer_path: Optional[str], n: Optional[int],
    vocab_size: int, seed: int = 0,
) -> List[SFTExample]:
    if dataset == "synthetic":
        return synthetic_sft_examples(n or 256, vocab_size, seed)

    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(tokenizer_path, use_fast=False)

    def enc(s, bos=False):
        ids = tok(s, add_special_tokens=bos).input_ids
        return np.asarray(ids, np.int64)

    import datasets as hfd

    out = []
    if dataset == "platypus":
        d = hfd.load_dataset("garage-bAInd/Open-Platypus", split="train")
        for ex in d if n is None else d.select(range(n)):
            prompt = alpaca_prompt(ex["instruction"], ex.get("input", ""))
            out.append(SFTExample(enc(prompt, bos=True), enc(ex["output"])))
    elif dataset == "alpaca":
        d = hfd.load_dataset("tatsu-lab/alpaca", split="train")
        for ex in d if n is None else d.select(range(n)):
            prompt = alpaca_prompt(ex["instruction"], ex.get("input", ""))
            out.append(SFTExample(enc(prompt, bos=True), enc(ex["output"])))
    elif dataset == "oasst1":
        d = hfd.load_dataset("timdettmers/openassistant-guanaco", split="train")
        for ex in d if n is None else d.select(range(n)):
            out.append(SFTExample(enc("", bos=True), enc(ex["text"])))
    elif dataset in ("wikitext", "wikitext2"):
        # block-packed LM fine-tuning (reference finetune.py:792-898): fixed
        # seqlen blocks of the train stream, every token supervised (empty
        # prompt -> no masking)
        from qeft_tpu.data.loaders import get_loaders

        crops = get_loaders(
            "wikitext2", nsamples=n or 256, seed=seed, seqlen=512,
            model=tokenizer_path, vocab_size=vocab_size, train=True,
        )
        for row in np.asarray(crops):
            out.append(SFTExample(np.empty((0,), np.int64), row.astype(np.int64)))
    else:
        raise ValueError(f"unknown SFT dataset {dataset}")
    return out


def batches(
    examples: List[SFTExample], batch_size: int, max_len: int, seed: int,
    epochs: int = 1, pad_id: int = 0, train_on_prompt: bool = False,
) -> Iterator[Dict[str, np.ndarray]]:
    rng = np.random.default_rng(seed)
    for _ in range(epochs):
        order = rng.permutation(len(examples))
        for i in range(0, len(order) - batch_size + 1, batch_size):
            chunk = [examples[j] for j in order[i : i + batch_size]]
            input_ids, labels = mask_and_pad(chunk, max_len, pad_id, train_on_prompt)
            yield {"input_ids": input_ids, "labels": labels}
