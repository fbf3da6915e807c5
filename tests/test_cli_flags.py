"""CLI-surface tests: --layers OWQ restriction, plain --nearest RTN, and the
MMLU eval callback inside run_finetune (VERDICT round-1 missing #5/#9)."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qeft_tpu.models import LLAMA_PRESETS, init_params, llama_forward
from qeft_tpu.models.registry import get_model_meta
from qeft_tpu.pipeline import QuantizeArgs, _n_out_dict, quantize_model
from qeft_tpu.quant.quantizer import QuantSpec

CFG = LLAMA_PRESETS["tiny"]
META = get_model_meta("llama")


def test_owq_layers_restricts_outliers():
    params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    args = QuantizeArgs(target_rank=8, owq_layers=("q", "v"))
    n_out = _n_out_dict(params, META, args, CFG)
    assert n_out["q"] == 8 and n_out["v"] == 8
    assert all(n_out[l] == 0 for l in META.all_linears if l not in ("q", "v"))


def test_owq_layers_unknown_name_raises():
    params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    args = QuantizeArgs(target_rank=8, owq_layers=("bogus",))
    with pytest.raises(ValueError, match="bogus"):
        _n_out_dict(params, META, args, CFG)


def test_nearest_cli_maps_to_plain_rtn():
    """--nearest -> RTN with zero outlier columns everywhere."""
    import argparse

    from qeft_tpu.extract_outidx import add_common_quant_args, build_quantize_args

    parser = argparse.ArgumentParser()
    add_common_quant_args(parser)
    args = parser.parse_args(
        ["tiny", "synthetic", "--nearest", "--target_rank", "8"]
    )
    qargs = build_quantize_args(args)
    assert qargs.rtn and qargs.target_rank is None and qargs.target_bit is None

    params = init_params(CFG, jax.random.PRNGKey(1), dtype=jnp.float32)
    rng = np.random.default_rng(0)
    calib = rng.integers(0, CFG.vocab_size, size=(2, 16))
    qargs.spec = QuantSpec(bits=4, sym=False, mse=False, group_size=64)
    qargs.reorder = False
    qargs.nsamples = 2
    qparams, quantizers = quantize_model(params, calib, CFG, META, qargs)
    # no outliers anywhere, and the quantized model still tracks the fp one
    assert all(int(st.out_ids.shape[0]) == 0 for st in quantizers.values())
    toks = jnp.asarray(calib[:1])
    lf = np.asarray(llama_forward(params, toks, CFG))
    lq = np.asarray(llama_forward(qparams, toks, CFG))
    assert np.corrcoef(lf.ravel(), lq.ravel())[0, 1] > 0.95


def test_run_finetune_mmlu_callback(tmp_path):
    """run_finetune --do_mmlu_eval: periodic + final MC accuracy lands in
    metrics.json (reference finetune.py:970-1034)."""
    from qeft_tpu.checkpoint import save_packed
    from qeft_tpu.run_finetune import main as ft_main
    from tests.test_finetune import packed_tiny

    packed = packed_tiny()
    base = str(tmp_path / "base_packed")
    save_packed(base, packed, CFG)
    out = str(tmp_path / "run")
    ft_main([
        "--load", base, "--output_dir", out, "--dataset", "synthetic",
        "--max_steps", "4", "--batch_size", "2", "--save_steps", "2",
        "--log_steps", "2", "--nsamples", "8", "--epochs", "100",
        "--do_mmlu_eval", "--mmlu_eval_steps", "2", "--mmlu_n", "6",
    ])
    with open(os.path.join(out, "metrics.json")) as f:
        metrics = json.load(f)
    mmlu = [m for m in metrics if "mmlu_accuracy" in m]
    assert len(mmlu) >= 2  # periodic + final
    assert all(0.0 <= m["mmlu_accuracy"] <= 1.0 and m["mmlu_n"] == 6 for m in mmlu)
    assert os.path.exists(os.path.join(out, "wct_final.npz"))


def test_run_benchmark_load_dispatches_family(tmp_path, capsys):
    """run_benchmark --load on a non-llama packed checkpoint drives that
    family's decode path (previously hard-asserted llama/gemma only)."""
    from qeft_tpu.checkpoint import save_packed
    from qeft_tpu.run_benchmark import main as rb_main
    from tests.test_opt import CFG as OPT_CFG, _quantize_packed_opt

    _, _, packed, _ = _quantize_packed_opt()
    path = str(tmp_path / "opt_packed")
    save_packed(path, packed, OPT_CFG, family="opt")
    rb_main([
        "--method", "qeft", "--load", path,
        "--context", "4", "--gen", "4", "--reps", "1",
    ])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    result = json.loads(out)
    assert result["tokens_per_s"] > 0
