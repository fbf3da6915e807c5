import numpy as np
import jax
import jax.numpy as jnp

from qeft_tpu.models import LLAMA_PRESETS, init_params, init_kv_cache
from qeft_tpu.generate import generate, SampleConfig
from qeft_tpu.speculative import (
    speculative_accept,
    speculative_generate,
    speculative_generate_sampled,
)

CFG = LLAMA_PRESETS["tiny"]


def setup(seed_t=0, seed_d=1):
    target = init_params(CFG, jax.random.PRNGKey(seed_t), dtype=jnp.float32)
    draft = init_params(CFG, jax.random.PRNGKey(seed_d), dtype=jnp.float32)
    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(1, 6)))
    return target, draft, prompt


def run_spec(target, draft, prompt, n, gamma):
    t_cache = init_kv_cache(CFG, 1, 64, dtype=jnp.float32)
    d_cache = init_kv_cache(CFG, 1, 64, dtype=jnp.float32)
    return speculative_generate(
        target, draft, prompt, t_cache, d_cache, CFG, CFG, n, gamma
    )


def test_speculative_equals_target_greedy():
    """The defining property: spec decoding reproduces the target model's own
    greedy output exactly, for any draft."""
    target, draft, prompt = setup()
    cache = init_kv_cache(CFG, 1, 64, dtype=jnp.float32)
    ref, _ = generate(target, prompt, cache, CFG, 10, SampleConfig())
    for gamma in (1, 3, 4):
        out, telem = run_spec(target, draft, prompt, 10, gamma)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref)), gamma


def test_draft_equals_target_accepts_most():
    target, _, prompt = setup()
    out, telem = run_spec(target, target, prompt, 12, 4)
    # identical models accept most candidates; random tiny-model logits are
    # near-flat, so decode-step vs window-forward reduction order flips the
    # occasional argmax tie — require a clearly-positive acceptance rate
    assert float(telem["mean_accept_length"]) >= 1.0, telem
    cache = init_kv_cache(CFG, 1, 64, dtype=jnp.float32)
    ref, _ = generate(target, prompt, cache, CFG, 12, SampleConfig())
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_telemetry_counts():
    target, draft, prompt = setup()
    out, telem = run_spec(target, draft, prompt, 8, 2)
    assert int(telem["rounds"]) >= 1
    assert 0 <= float(telem["mean_accept_length"]) <= 2.0


def test_accept_rule_emits_target_distribution():
    """The speculative-sampling theorem (reference `_speculative_sampling`,
    ftllama_generate.py:410-530): with cand ~ p_d and the accept/resample
    rule, the emitted token at position 0 is distributed exactly as p_t[0] —
    regardless of how different p_d is.  Checked empirically by total
    variation distance over many keys."""
    vocab, gamma, n_trials = 16, 3, 20000
    rng = np.random.default_rng(7)
    probs_d = rng.dirichlet(np.ones(vocab) * 0.7, size=gamma).astype(np.float32)
    probs_t = rng.dirichlet(np.ones(vocab) * 0.7, size=gamma + 1).astype(np.float32)
    pd = jnp.asarray(probs_d)
    pt = jnp.asarray(probs_t)

    def trial(key):
        k_cand, k_acc = jax.random.split(key)
        cand = jax.random.categorical(
            k_cand, jnp.log(pd), axis=-1
        ).astype(jnp.int32)  # [gamma], position i sampled from p_d[i]
        n_accept, corrected = speculative_accept(cand, pd, pt, k_acc)
        return jnp.where(n_accept >= 1, cand[0], corrected)

    keys = jax.random.split(jax.random.PRNGKey(0), n_trials)
    emitted = np.asarray(jax.jit(jax.vmap(trial))(keys))
    emp = np.bincount(emitted, minlength=vocab) / n_trials
    tv = 0.5 * np.abs(emp - probs_t[0]).sum()
    # TV of a 16-bin multinomial at n=20000 concentrates well below 0.03
    assert tv < 0.03, (tv, emp, probs_t[0])

    # and the naive alternative (always keep the draft token) must FAIL this
    # check, proving the test has power
    def naive(key):
        k_cand, _ = jax.random.split(key)
        return jax.random.categorical(k_cand, jnp.log(pd), axis=-1)[0]

    emitted_n = np.asarray(jax.jit(jax.vmap(naive))(keys))
    emp_n = np.bincount(emitted_n, minlength=vocab) / n_trials
    tv_n = 0.5 * np.abs(emp_n - probs_t[0]).sum()
    assert tv_n > 0.1, tv_n


import pytest


@pytest.mark.parametrize(
    "warp", [dict(), dict(top_p=0.7), dict(top_k=8, temperature=0.8)]
)
def test_sampled_spec_matches_target_only_sampling(warp):
    """End-to-end: generated-token marginals under speculative sampling match
    target-only sampling (small-vocab model pair so empirical TV noise
    ~sqrt(vocab/n) is well below the tolerance).  Position 0 checks the rng
    plumbing; positions 1+ are produced by the draft/accept/resample path.
    Parametrized over the logits-warper stack (plain / nucleus / top-k+temp):
    identical warping of draft and target must preserve the guarantee."""
    import dataclasses

    cfg = dataclasses.replace(
        CFG, vocab_size=32, hidden_size=64, intermediate_size=128,
        num_heads=2, num_kv_heads=2, head_dim=32,
    )
    target = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    draft = init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    prompt = jnp.asarray(np.random.default_rng(0).integers(0, 32, size=(1, 6)))
    sc = SampleConfig(**{"greedy": False, "temperature": 1.0, **warp})
    n_trials = 1500

    def spec_first(key):
        t_cache = init_kv_cache(cfg, 1, 32, dtype=jnp.float32)
        d_cache = init_kv_cache(cfg, 1, 32, dtype=jnp.float32)
        out, _ = speculative_generate_sampled(
            target, draft, prompt, t_cache, d_cache, cfg, cfg, 4, key,
            gamma=2, sc=sc,
        )
        return out[0, :4]

    def target_first(key):
        cache = init_kv_cache(cfg, 1, 32, dtype=jnp.float32)
        out, _ = generate(target, prompt, cache, cfg, 4, sc, rng=key)
        return out[0, :4]

    keys = jax.random.split(jax.random.PRNGKey(3), n_trials)
    spec_toks = np.asarray(jax.lax.map(spec_first, keys))
    tgt_toks = np.asarray(jax.lax.map(target_first, keys))
    v = cfg.vocab_size
    for pos in range(4):
        emp_s = np.bincount(spec_toks[:, pos], minlength=v) / n_trials
        emp_t = np.bincount(tgt_toks[:, pos], minlength=v) / n_trials
        tv = 0.5 * np.abs(emp_s - emp_t).sum()
        # two empirical 32-bin multinomials at n=1500: TV noise ~0.07; a
        # sampler emitting the DRAFT distribution instead fails by a wide
        # margin (checked below)
        assert tv < 0.15, (pos, tv)

    # power check: the draft model's own sampling must NOT pass at pos>=1
    def draft_only(key):
        cache = init_kv_cache(cfg, 1, 32, dtype=jnp.float32)
        out, _ = generate(draft, prompt, cache, cfg, 4, sc, rng=key)
        return out[0, :4]

    drf_toks = np.asarray(jax.lax.map(draft_only, keys))
    tvs = []
    for pos in range(4):
        emp_d = np.bincount(drf_toks[:, pos], minlength=v) / n_trials
        emp_t = np.bincount(tgt_toks[:, pos], minlength=v) / n_trials
        tvs.append(0.5 * np.abs(emp_d - emp_t).sum())
    assert max(tvs) > 0.2, tvs


def test_sampled_spec_greedy_limit():
    """At near-zero temperature the sampled path collapses to the greedy
    spec path (and hence the target's own greedy output)."""
    target, draft, prompt = setup()
    t_cache = init_kv_cache(CFG, 1, 64, dtype=jnp.float32)
    d_cache = init_kv_cache(CFG, 1, 64, dtype=jnp.float32)
    sc = SampleConfig(greedy=False, temperature=1e-4)
    out, telem = speculative_generate_sampled(
        target, draft, prompt, t_cache, d_cache, CFG, CFG, 10,
        jax.random.PRNGKey(0), gamma=3, sc=sc,
    )
    cache = init_kv_cache(CFG, 1, 64, dtype=jnp.float32)
    ref, _ = generate(target, prompt, cache, CFG, 10, SampleConfig())
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_speculative_cache_requirement_documented():
    """Cache must cover prompt + max_new + gamma + 1 (verify-window overhang)."""
    target, draft, prompt = setup()
    n, gamma = 10, 4
    need = prompt.shape[1] + n + gamma + 1
    t_cache = init_kv_cache(CFG, 1, need, dtype=jnp.float32)
    d_cache = init_kv_cache(CFG, 1, need, dtype=jnp.float32)
    out, _ = speculative_generate(target, draft, prompt, t_cache, d_cache, CFG, CFG, n, gamma)
    cache = init_kv_cache(CFG, 1, 64, dtype=jnp.float32)
    from qeft_tpu.generate import generate, SampleConfig
    ref, _ = generate(target, prompt, cache, CFG, n, SampleConfig())
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_batched_spec_greedy_equals_per_sequence_greedy():
    """Batched speculative decoding (per-sequence accept/rollback): each row
    of the batch reproduces that sequence's own greedy decode exactly."""
    from qeft_tpu.speculative import speculative_generate_batched

    target = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    draft = init_params(CFG, jax.random.PRNGKey(1), dtype=jnp.float32)
    b, s, n = 3, 5, 10
    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(b, s)))

    slack = s + n + 4 + 1
    t_cache = init_kv_cache(CFG, b, slack, dtype=jnp.float32)
    d_cache = init_kv_cache(CFG, b, slack, dtype=jnp.float32)
    out, tel = speculative_generate_batched(
        target, draft, prompt, t_cache, d_cache, CFG, CFG, n,
        jax.random.PRNGKey(2), gamma=4, greedy=True,
    )
    out = np.asarray(out)

    for i in range(b):
        cache = init_kv_cache(CFG, 1, slack, dtype=jnp.float32)
        ref, _ = generate(
            target, prompt[i : i + 1], cache, CFG, n, SampleConfig(greedy=True)
        )
        np.testing.assert_array_equal(out[i], np.asarray(ref)[0])
    assert int(np.asarray(tel["rounds"])) <= n  # drafting actually helped


def test_batched_spec_sampled_matches_target_marginals():
    """Sampled batched spec: per-position marginals of every batch row match
    target-only sampling (exact-distribution rule applied per sequence)."""
    import dataclasses

    from qeft_tpu.speculative import speculative_generate_batched

    cfg = dataclasses.replace(
        CFG, vocab_size=32, hidden_size=64, intermediate_size=128,
        num_heads=2, num_kv_heads=2, head_dim=32,
    )
    target = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    draft = init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    b = 2
    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(0, 32, size=(b, 6)))
    sc = SampleConfig(greedy=False, temperature=1.0)
    n_trials = 800

    def spec(key):
        t_cache = init_kv_cache(cfg, b, 32, dtype=jnp.float32)
        d_cache = init_kv_cache(cfg, b, 32, dtype=jnp.float32)
        out, _ = speculative_generate_batched(
            target, draft, prompt, t_cache, d_cache, cfg, cfg, 4, key,
            gamma=2, sc=sc,
        )
        return out  # [B, 4]

    def tgt(key):
        cache = init_kv_cache(cfg, b, 32, dtype=jnp.float32)
        out, _ = generate(target, prompt, cache, cfg, 4, sc, rng=key)
        return out

    keys = jax.random.split(jax.random.PRNGKey(3), n_trials)
    spec_toks = np.asarray(jax.lax.map(spec, keys))  # [T, B, 4]
    tgt_toks = np.asarray(jax.lax.map(tgt, keys))
    for bi in range(b):
        for pos in range(4):
            emp_s = np.bincount(spec_toks[:, bi, pos], minlength=32) / n_trials
            emp_t = np.bincount(tgt_toks[:, bi, pos], minlength=32) / n_trials
            tv = 0.5 * np.abs(emp_s - emp_t).sum()
            assert tv < 0.12, (bi, pos, tv)


def test_spec_round_writes_draft_kv_for_every_drafted_position():
    """Regression: on a full-accept round the next round starts at
    base_pos+gamma+1, so the draft KV at base_pos+gamma (the last candidate's
    position) must be written DURING the round — a zero hole there silently
    degrades every later round's acceptance rate."""
    from qeft_tpu.models.llama import llama_prefill
    from qeft_tpu.speculative import spec_round

    target, draft, prompt = setup()
    t_cache = init_kv_cache(CFG, 1, 64, dtype=jnp.float32)
    d_cache = init_kv_cache(CFG, 1, 64, dtype=jnp.float32)
    t_logits, t_cache = llama_prefill(target, prompt, t_cache, CFG)
    _, d_cache = llama_prefill(draft, prompt, d_cache, CFG)
    last = jnp.argmax(t_logits[:, -1, :], axis=-1).astype(jnp.int32)[:, None]
    s, gamma = prompt.shape[1], 4
    base_pos = jnp.full((1,), s, jnp.int32)  # `last` sits at position s

    _, _, _, d_cache = spec_round(
        target, draft, last, t_cache, d_cache, base_pos, CFG, CFG, gamma,
        SampleConfig(), True, jax.random.PRNGKey(0),
    )
    k = np.asarray(d_cache["k"])  # [L, B, H_kv, S, Dh]
    for p in range(s, s + gamma + 1):
        assert np.any(k[:, 0, :, p, :] != 0.0), f"draft KV hole at position {p}"


def test_layer_sliced_self_draft():
    """Self-speculative drafts (layer_sliced_draft): a FULL-depth slice is the
    target itself, so greedy acceptance must be perfect (gamma per round); a
    partial slice must produce a runnable draft with the right depth and the
    generator must still emit the target's exact greedy sequence."""
    from qeft_tpu.speculative import layer_sliced_draft

    cfg = LLAMA_PRESETS["tiny-v2"]
    target = init_params(cfg, jax.random.PRNGKey(3), dtype=jnp.float32)
    rng = np.random.default_rng(3)
    prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(1, 6)))

    full, full_cfg = layer_sliced_draft(target, cfg, cfg.num_layers)
    t_cache = init_kv_cache(cfg, 1, 64, dtype=jnp.float32)
    d_cache = init_kv_cache(full_cfg, 1, 64, dtype=jnp.float32)
    out, tel = speculative_generate(
        target, full, prompt, t_cache, d_cache, cfg, full_cfg, 16, gamma=4
    )
    assert float(tel["mean_accept_length"]) == 4.0

    sliced, dcfg = layer_sliced_draft(target, cfg, 2)
    assert dcfg.num_layers == 2
    assert jax.tree.leaves(sliced["layers"])[0].shape[0] == 2
    t_cache = init_kv_cache(cfg, 1, 64, dtype=jnp.float32)
    d_cache = init_kv_cache(dcfg, 1, 64, dtype=jnp.float32)
    out2, _ = speculative_generate(
        target, sliced, prompt, t_cache, d_cache, cfg, dcfg, 16, gamma=4
    )
    # regardless of draft quality the emitted tokens ARE the target's greedy
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(out))


def test_selfdraft_greedy_accepts_gamma_under_kernels(monkeypatch):
    """With the flash window attention on (the width-invariant path), a
    full-depth SELF-draft (draft == target) must accept gamma/gamma even in
    bf16 with the Pallas (interpret) kernels — the on-chip condition where
    the eager verify path tie-broke differently (round-2 chip session 4:
    3.4/4.0)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from qeft_tpu.models.llama import LLAMA_PRESETS, init_kv_cache
    from qeft_tpu.speculative import speculative_generate
    from qeft_tpu.testing import build_packed_model

    monkeypatch.setenv("QEFT_FLASH_ATTN", "1")
    monkeypatch.setenv("QEFT_PALLAS", "1")
    cfg = LLAMA_PRESETS["tiny-v2"]
    params = build_packed_model(cfg, jax.random.PRNGKey(9), fuse_stages=True)
    gamma, gen = 4, 12
    prompt = jnp.asarray(
        np.random.default_rng(9).integers(0, cfg.vocab_size, size=(1, 8))
    )
    t_cache = init_kv_cache(cfg, 1, 64, dtype=jnp.bfloat16)
    d_cache = init_kv_cache(cfg, 1, 64, dtype=jnp.bfloat16)
    out, tel = speculative_generate(
        params, params, prompt, t_cache, d_cache, cfg, cfg, gen, gamma=gamma
    )
    assert float(tel["mean_accept_length"]) == float(gamma), tel
