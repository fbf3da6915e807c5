"""Multiple-choice evaluation (MMLU-style) by choice log-likelihood scoring.

Capability parity with the reference's MMLU eval callback
(/root/reference/qeft/finetune.py:970-1034), which scores the logits of the
A/B/C/D answer tokens.  Generalized: each question is scored by the summed
log-likelihood of each choice continuation; works for MMLU, hellaswag, and a
synthetic suite for hermetic runs.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from qeft_tpu.models.llama import LlamaConfig


@dataclasses.dataclass
class MCExample:
    context_ids: np.ndarray  # prompt tokens
    choice_ids: List[np.ndarray]  # one token array per choice
    label: int


@partial(jax.jit, static_argnames=("cfg", "family"))
def _seq_logprobs(params, tokens, cfg: LlamaConfig, family: str = "llama"):
    """Per-position next-token log-probs for one [1, S] sequence."""
    from qeft_tpu.models.api import get_model_api

    logits = get_model_api(family).forward(params, tokens, cfg).astype(jnp.float32)
    logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
    tgt = tokens[:, 1:]
    return jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]  # [1, S-1]


def score_example(params, ex: MCExample, cfg: LlamaConfig,
                  family: str = "llama") -> int:
    """Argmax over summed choice-continuation log-likelihoods."""
    scores = []
    for choice in ex.choice_ids:
        seq = np.concatenate([ex.context_ids, choice])[None, :]
        lp = np.asarray(_seq_logprobs(params, jnp.asarray(seq), cfg, family))
        n_choice = len(choice)
        scores.append(float(lp[0, -n_choice:].sum()))
    return int(np.argmax(scores))


def evaluate_mc(params, examples: List[MCExample], cfg: LlamaConfig,
                family: str = "llama") -> Dict:
    correct = 0
    for ex in examples:
        correct += int(score_example(params, ex, cfg, family) == ex.label)
    return {"accuracy": correct / max(len(examples), 1), "n": len(examples)}


def synthetic_mc_examples(n: int, vocab_size: int, seed: int = 0) -> List[MCExample]:
    """Hermetic suite: the correct choice repeats a context trigram, which any
    induction-capable model scores higher than random continuations."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        ctx = rng.integers(0, vocab_size, 12)
        correct = ctx[3:6].copy()
        choices = [rng.integers(0, vocab_size, 3) for _ in range(3)]
        label = int(rng.integers(0, 4))
        choices.insert(label, correct)
        out.append(MCExample(ctx, choices, label))
    return out


def load_mmlu_examples(
    tokenizer_path: str, subjects: Optional[List[str]] = None,
    split: str = "validation", n: Optional[int] = None, n_shot: int = 0,
) -> List[MCExample]:
    """HF `cais/mmlu` loader (needs network/dataset cache)."""
    import datasets as hfd
    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(tokenizer_path, use_fast=False)
    d = hfd.load_dataset("cais/mmlu", "all", split=split)
    if subjects:
        d = d.filter(lambda ex: ex["subject"] in subjects)
    if n:
        d = d.select(range(min(n, len(d))))

    letters = ["A", "B", "C", "D"]
    out = []
    for ex in d:
        prompt = ex["question"] + "\n"
        for i, c in enumerate(ex["choices"]):
            prompt += f"{letters[i]}. {c}\n"
        prompt += "Answer:"
        ctx = np.asarray(tok(prompt).input_ids, np.int64)
        choices = [
            np.asarray(tok(" " + letter, add_special_tokens=False).input_ids, np.int64)
            for letter in letters
        ]
        out.append(MCExample(ctx, choices, int(ex["answer"])))
    return out
