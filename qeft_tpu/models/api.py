"""Family-dispatched model API: one hashable bundle of the forward surfaces
every driver (eval, generation, benchmark, serving) programs against.

The reference dispatches by monkeypatching whichever HF class it loaded
(/root/reference/qeft/utils/modelutils.py:66-105, misc.py:69-95); here each
family is a set of pure functions over a params pytree, and this registry maps
``family`` -> those functions.  `ModelApi` is a frozen dataclass of functions,
so it is hashable and can ride jit's static args.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict


@dataclasses.dataclass(frozen=True)
class ModelApi:
    family: str
    forward: Callable  # (params, tokens [B,S], cfg) -> logits [B,S,V]
    prefill: Callable  # (params, tokens, cache, cfg) -> (logits, cache)
    decode_step: Callable  # (params, token [B,1], cache, pos, cfg) -> (logits [B,V], cache)
    forward_window: Callable  # (params, tokens, cache, pos, cfg) -> (logits, cache)
    init_cache: Callable  # (cfg, batch, max_len, dtype) -> cache dict
    config_cls: type


def _llama_api() -> ModelApi:
    from qeft_tpu.models import llama as m

    return ModelApi(
        family="llama",
        forward=m.llama_forward,
        prefill=m.llama_prefill,
        decode_step=m.llama_decode_step,
        forward_window=m.llama_forward_window,
        init_cache=m.init_kv_cache,
        config_cls=m.LlamaConfig,
    )


def _opt_api() -> ModelApi:
    from qeft_tpu.models import opt as m

    return ModelApi(
        family="opt",
        forward=m.opt_forward,
        prefill=m.opt_prefill,
        decode_step=m.opt_decode_step,
        forward_window=m.opt_forward_window,
        init_cache=m.init_kv_cache,
        config_cls=m.OPTConfig,
    )


def _phi_api() -> ModelApi:
    from qeft_tpu.models import phi as m

    return ModelApi(
        family="phi",
        forward=m.phi_forward,
        prefill=m.phi_prefill,
        decode_step=m.phi_decode_step,
        forward_window=m.phi_forward_window,
        init_cache=m.init_kv_cache,
        config_cls=m.PhiConfig,
    )


def _bloom_api() -> ModelApi:
    from qeft_tpu.models import bloom as m

    return ModelApi(
        family="bloom",
        forward=m.bloom_forward,
        prefill=m.bloom_prefill,
        decode_step=m.bloom_decode_step,
        forward_window=m.bloom_forward_window,
        init_cache=m.init_kv_cache,
        config_cls=m.BloomConfig,
    )


def _falcon_api() -> ModelApi:
    from qeft_tpu.models import falcon as m

    return ModelApi(
        family="falcon",
        forward=m.falcon_forward,
        prefill=m.falcon_prefill,
        decode_step=m.falcon_decode_step,
        forward_window=m.falcon_forward_window,
        init_cache=m.init_kv_cache,
        config_cls=m.FalconConfig,
    )


_BUILDERS = {
    "llama": _llama_api,
    "gemma": _llama_api,  # gemma runs on the llama topology (LlamaConfig switches)
    "opt": _opt_api,
    "phi": _phi_api,
    "bloom": _bloom_api,
    "falcon": _falcon_api,
}

_CACHE: Dict[str, ModelApi] = {}


def get_model_api(family: str) -> ModelApi:
    fam = family.lower()
    if fam not in _BUILDERS:
        raise NotImplementedError(f"no model API for family {family!r}")
    if fam not in _CACHE:
        _CACHE[fam] = _BUILDERS[fam]()
    return _CACHE[fam]
