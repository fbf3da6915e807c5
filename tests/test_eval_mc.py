import jax
import jax.numpy as jnp

from qeft_tpu.models import LLAMA_PRESETS, init_params
from qeft_tpu.eval_mc import evaluate_mc, synthetic_mc_examples

CFG = LLAMA_PRESETS["tiny"]


def test_mc_eval_runs_and_bounds():
    params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    examples = synthetic_mc_examples(12, CFG.vocab_size)
    res = evaluate_mc(params, examples, CFG)
    assert res["n"] == 12
    assert 0.0 <= res["accuracy"] <= 1.0


def test_mc_eval_composes_with_packed_model():
    from tests.test_finetune import packed_tiny

    packed = packed_tiny()
    examples = synthetic_mc_examples(6, CFG.vocab_size, seed=1)
    res = evaluate_mc(packed, examples, CFG)
    assert res["n"] == 6 and 0.0 <= res["accuracy"] <= 1.0
