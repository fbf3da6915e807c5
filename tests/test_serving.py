import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qeft_tpu.models import LLAMA_PRESETS, init_params, init_kv_cache
from qeft_tpu.models.llama import llama_decode_step, llama_decode_step_ragged
from qeft_tpu.generate import generate, SampleConfig
from qeft_tpu.serving import Engine, Request

CFG = LLAMA_PRESETS["tiny"]


def test_ragged_decode_matches_scalar_decode():
    params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    cache = init_kv_cache(CFG, 2, 16, dtype=jnp.float32)
    tok = jnp.asarray([[3], [7]])
    # both sequences at the same position: ragged == scalar
    l_scalar, _ = llama_decode_step(params, tok, cache, jnp.int32(2), CFG)
    l_ragged, _ = llama_decode_step_ragged(
        params, tok, cache, jnp.asarray([2, 2], jnp.int32), CFG
    )
    np.testing.assert_allclose(
        np.asarray(l_ragged), np.asarray(l_scalar), rtol=2e-4, atol=2e-4
    )


def test_engine_matches_single_sequence_generation():
    """Every request served by the continuous-batching engine must reproduce
    its own single-sequence greedy decode."""
    params = init_params(CFG, jax.random.PRNGKey(1), dtype=jnp.float32)
    rng = np.random.default_rng(0)
    prompts = [rng.integers(0, CFG.vocab_size, size=n) for n in (4, 6, 3, 5, 4)]
    n_new = [5, 3, 6, 4, 5]

    engine = Engine(params, CFG, max_batch=2, max_len=32, cache_dtype=jnp.float32)
    for i, (p, n) in enumerate(zip(prompts, n_new)):
        engine.submit(Request(request_id=i, prompt=p, max_new_tokens=n))
    finished = engine.run()
    assert len(finished) == len(prompts)

    by_id = {r.request_id: r for r in finished}
    for i, (p, n) in enumerate(zip(prompts, n_new)):
        cache = init_kv_cache(CFG, 1, 32, dtype=jnp.float32)
        ref, _ = generate(params, jnp.asarray(p[None, :]), cache, CFG, n, SampleConfig())
        assert by_id[i].output == np.asarray(ref)[0].tolist(), i


def test_engine_eos_retires_early():
    params = init_params(CFG, jax.random.PRNGKey(2), dtype=jnp.float32)
    rng = np.random.default_rng(1)
    prompt = rng.integers(0, CFG.vocab_size, size=4)
    # find what greedy emits first, then use it as "EOS"
    cache = init_kv_cache(CFG, 1, 32, dtype=jnp.float32)
    ref, _ = generate(params, jnp.asarray(prompt[None, :]), cache, CFG, 1, SampleConfig())
    eos = int(np.asarray(ref)[0, 0])

    engine = Engine(params, CFG, max_batch=2, max_len=32, eos_id=eos, cache_dtype=jnp.float32)
    engine.submit(Request(request_id=0, prompt=prompt, max_new_tokens=10))
    finished = engine.run()
    assert len(finished) == 1
    assert finished[0].output[-1] == eos
    assert len(finished[0].output) < 10


def test_engine_with_sharded_params():
    """Continuous batching over mesh-sharded (TP) params: the serving layer
    composes with the parallel layer (multi-chip serving path)."""
    from qeft_tpu.models.registry import get_model_meta
    from qeft_tpu.parallel import make_mesh, shard_params

    params = init_params(CFG, jax.random.PRNGKey(3), dtype=jnp.float32)
    rng = np.random.default_rng(2)
    prompts = [rng.integers(0, CFG.vocab_size, size=4) for _ in range(3)]

    engine_ref = Engine(params, CFG, max_batch=2, max_len=32, cache_dtype=jnp.float32)
    for i, p in enumerate(prompts):
        engine_ref.submit(Request(request_id=i, prompt=p, max_new_tokens=4))
    ref = {r.request_id: r.output for r in engine_ref.run()}

    # tp=2: the tiny model's 2 kv heads bound the tensor-parallel width
    mesh = make_mesh((1, 2), devices=jax.devices()[:2])
    sharded = shard_params(params, mesh, get_model_meta("llama"))
    with jax.set_mesh(mesh):
        engine = Engine(sharded, CFG, max_batch=2, max_len=32, cache_dtype=jnp.float32)
        for i, p in enumerate(prompts):
            engine.submit(Request(request_id=i, prompt=p, max_new_tokens=4))
        out = {r.request_id: r.output for r in engine.run()}
    assert out == ref


def test_engine_caps_at_cache_capacity():
    params = init_params(CFG, jax.random.PRNGKey(4), dtype=jnp.float32)
    prompt = np.arange(4)
    engine = Engine(params, CFG, max_batch=1, max_len=8, cache_dtype=jnp.float32)
    engine.submit(Request(request_id=0, prompt=prompt, max_new_tokens=100))
    finished = engine.run(max_ticks=50)
    assert len(finished) == 1
    # prompt fills 4 slots; decode can extend only to the cache edge
    assert len(finished[0].output) <= 8 - 4 + 1


def test_engine_with_int8_kv_cache(monkeypatch):
    """QEFT_KV_DTYPE=int8 flows through admission (slot ops are generic over
    the cache leaves incl. scale planes) and ragged decode; engine output ==
    single-sequence decode under the same cache quantization."""
    monkeypatch.setenv("QEFT_KV_DTYPE", "int8")
    params = init_params(CFG, jax.random.PRNGKey(3), dtype=jnp.float32)
    rng = np.random.default_rng(2)
    prompts = [rng.integers(0, CFG.vocab_size, size=n) for n in (4, 6, 3)]

    engine = Engine(params, CFG, max_batch=2, max_len=32, cache_dtype=jnp.float32)
    for i, p in enumerate(prompts):
        engine.submit(Request(request_id=i, prompt=p, max_new_tokens=4))
    finished = engine.run()
    by_id = {r.request_id: r for r in finished}
    for i, p in enumerate(prompts):
        cache = init_kv_cache(CFG, 1, 32, quantized=True)
        assert "k_scale" in cache
        ref, _ = generate(params, jnp.asarray(p[None, :]), cache, CFG, 4, SampleConfig())
        assert by_id[i].output == np.asarray(ref)[0].tolist(), i


def test_engine_sampling_mode():
    """Sampling engine (temperature/top-p) serves to completion with tokens in
    range; greedy remains the default (covered by the equality tests above)."""
    from qeft_tpu.generate import SampleConfig

    params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    eng = Engine(
        params, CFG, max_batch=2, max_len=32, cache_dtype=jnp.float32,
        sample_config=SampleConfig(greedy=False, temperature=0.9, top_p=0.9),
        rng_seed=7,
    )
    rng = np.random.default_rng(0)
    for i in range(3):
        eng.submit(Request(i, rng.integers(0, CFG.vocab_size, size=(4,)), 6))
    done = eng.run()
    assert len(done) == 3
    for r in done:
        assert len(r.output) == 6
        assert all(0 <= t < CFG.vocab_size for t in r.output)


def test_spec_engine_matches_plain_engine_greedy():
    """Continuous batching + speculative decoding: the SpecEngine's greedy
    outputs equal the plain engine's greedy outputs request-for-request
    (per-slot accept lengths, positional rollback in-slot)."""
    from qeft_tpu.serving import SpecEngine

    params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    draft = init_params(CFG, jax.random.PRNGKey(1), dtype=jnp.float32)
    rng = np.random.default_rng(5)
    prompts = [rng.integers(0, CFG.vocab_size, size=(rng.integers(3, 7),))
               for _ in range(5)]

    plain = Engine(params, CFG, max_batch=2, max_len=40, cache_dtype=jnp.float32)
    for i, p in enumerate(prompts):
        plain.submit(Request(i, p, 8))
    ref = {r.request_id: r.output for r in plain.run()}

    spec = SpecEngine(
        params, CFG, draft, CFG, gamma=3,
        max_batch=2, max_len=40, cache_dtype=jnp.float32,
    )
    for i, p in enumerate(prompts):
        spec.submit(Request(i, p, 8))
    got = {r.request_id: r.output for r in spec.run()}

    assert set(got) == set(ref)
    for rid in ref:
        assert got[rid] == ref[rid], (rid, got[rid], ref[rid])
    assert spec.rounds_total > 0


def test_chunked_prefill_equals_whole_prefill():
    """prefill_chunk bounds admission memory; outputs must be identical."""
    params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    rng = np.random.default_rng(9)
    prompts = [rng.integers(0, CFG.vocab_size, size=(11,)),
               rng.integers(0, CFG.vocab_size, size=(4,))]

    def run(chunk):
        eng = Engine(params, CFG, max_batch=2, max_len=32,
                     cache_dtype=jnp.float32, prefill_chunk=chunk)
        for i, p in enumerate(prompts):
            eng.submit(Request(i, p, 6))
        return {r.request_id: r.output for r in eng.run()}

    assert run(0) == run(4)


def test_engine_burst_matches_per_tick_engine():
    """burst>1 (n decode ticks per host sync) must serve byte-identical
    outputs to the per-tick engine, including EOS retirement mid-burst and
    slot reuse under a small batch."""
    params = init_params(CFG, jax.random.PRNGKey(1), dtype=jnp.float32)
    rng = np.random.default_rng(4)
    prompts = [rng.integers(0, CFG.vocab_size, size=n) for n in (4, 6, 3, 5)]
    n_new = [7, 3, 6, 5]

    def serve(burst, eos=None):
        eng = Engine(params, CFG, max_batch=2, max_len=32,
                     cache_dtype=jnp.float32, eos_id=eos, burst=burst)
        for i, (p, n) in enumerate(zip(prompts, n_new)):
            eng.submit(Request(request_id=i, prompt=p, max_new_tokens=n))
        return {r.request_id: r.output for r in eng.run()}

    assert serve(4) == serve(1)

    # EOS: pick the first greedy token of request 0 so it retires mid-burst
    cache = init_kv_cache(CFG, 1, 32, dtype=jnp.float32)
    ref, _ = generate(params, jnp.asarray(prompts[0][None, :]), cache, CFG, 1,
                      SampleConfig())
    eos = int(np.asarray(ref)[0, 0])
    assert serve(4, eos=eos) == serve(1, eos=eos)


def test_multihost_engine_single_process_degenerates_to_engine():
    """MultiHostEngine on one process: routing accepts every request, serving
    matches the plain Engine request-for-request, stats totals are local
    (the 2-process half of this contract runs in
    scripts/multihost_dryrun.py via tests/test_multihost.py)."""
    from qeft_tpu.serving import MultiHostEngine

    params = init_params(CFG, jax.random.PRNGKey(5), dtype=jnp.float32)
    rng = np.random.default_rng(4)
    stream = [
        Request(request_id=i,
                prompt=rng.integers(0, CFG.vocab_size, size=4 + (i % 2)),
                max_new_tokens=3)
        for i in range(4)
    ]

    mh = MultiHostEngine(params, CFG, max_batch=2, max_len=32,
                         cache_dtype=jnp.float32)
    assert all(mh.submit(r) for r in stream)  # 1 process owns everything
    got = {r.request_id: list(r.output) for r in mh.run()}

    ref_eng = Engine(params, CFG, max_batch=2, max_len=32,
                     cache_dtype=jnp.float32)
    for r in stream:
        ref_eng.submit(Request(request_id=r.request_id, prompt=r.prompt,
                               max_new_tokens=r.max_new_tokens))
    ref = {r.request_id: list(r.output) for r in ref_eng.run()}
    assert got == ref

    stats = mh.stats()
    assert stats == {
        "requests_local": 4, "tokens_local": 12,
        "requests_total": 4, "tokens_total": 12,
        "requests_seen": 4,
    }


def test_measure_engine_throughput_serves_everything():
    """The shared serving-benchmark definition (bench.py rider ==
    run_benchmark --method engine) must serve requests*gen tokens and
    return a finite positive rate."""
    from qeft_tpu.serving import measure_engine_throughput

    params = init_params(CFG, jax.random.PRNGKey(6), dtype=jnp.float32)
    tps = measure_engine_throughput(
        params, CFG, slots=2, burst=2, requests=3, ctx=6, gen=4, reps=1,
        sample_config=SampleConfig(greedy=True),
    )
    assert tps > 0 and np.isfinite(tps)
