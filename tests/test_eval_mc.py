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
