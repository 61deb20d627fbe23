"""CLI-facing parallel serving engines (engine/serving.py): greedy tokens
through SPEngine/EPEngine must match the flat single-device stream."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gptq_tpu.models.common import (ArchSpec, KVCache, init_params,
                                    model_forward)

SPEC = ArchSpec(arch="llama", n_layers=2, hidden=48, n_heads=4, n_kv_heads=2,
                ffn=96, vocab=89, max_pos=512, norm_eps=1e-5, act="silu",
                pos="rope", norm_type="rmsnorm", linear_bias=False,
                tie_embeddings=False)

MOE_SPEC = ArchSpec(arch="llama", n_layers=2, hidden=48, n_heads=4,
                    n_kv_heads=2, ffn=96, vocab=89, max_pos=64,
                    act="silu", pos="rope", norm_type="rmsnorm",
                    linear_bias=False, tie_embeddings=False,
                    n_experts=4, expert_top_k=2, expert_capacity=2.0)


def _flat_greedy(spec, params, prompt, n, max_len=64):
    cache = KVCache.init(spec, prompt.shape[0], max_len, jnp.float32)
    logits, cache = model_forward(spec, params, jnp.asarray(prompt), cache)
    tok = jnp.argmax(logits[:, -1], axis=-1)[:, None]
    out = [np.asarray(tok)]
    for _ in range(n - 1):
        logits, cache = model_forward(spec, params, tok, cache)
        tok = jnp.argmax(logits[:, -1], axis=-1)[:, None]
        out.append(np.asarray(tok))
    return np.concatenate(out, axis=1)


@pytest.mark.parametrize("sp,tp,ragged", [(2, 1, 0), (2, 2, 1), (4, 1, 3)])
def test_sp_engine_generate_matches_flat(sp, tp, ragged):
    """SPEngine (the gptq_tpu.cli --sp path): sp-divisible prefix prefills
    through the ring, the ragged remainder and new tokens run through the
    SPCache decode step — greedy tokens must match the flat stream.
    bf16 slabs here so the comparison is exact (int8 is covered by
    test_sp.py tolerance tests and the CLI e2e)."""
    from gptq_tpu.engine.serving import SPEngine

    params = init_params(SPEC, jax.random.PRNGKey(0))
    prompt = np.random.default_rng(1).integers(0, SPEC.vocab,
                                               size=(1, 8 + ragged))
    want = _flat_greedy(SPEC, params, prompt, 6)
    eng = SPEngine(SPEC, params, sp=sp, tp=tp, max_len=64,
                   cache_dtype=jnp.float32)
    got = eng.generate(prompt, max_new_tokens=6)
    np.testing.assert_array_equal(got, want)


def test_sp_engine_int8_default_at_long_maxlen():
    from gptq_tpu.engine.serving import SPEngine

    params = init_params(SPEC, jax.random.PRNGKey(0))
    eng = SPEngine(SPEC, params, sp=2, max_len=2048)
    assert eng.int8 and eng.cache_dtype == jnp.int8
    eng2 = SPEngine(SPEC, params, sp=2, max_len=256)
    assert not eng2.int8


def test_sp_engine_benchmark_chained_runs_and_checks():
    from gptq_tpu.engine.serving import SPEngine

    params = init_params(SPEC, jax.random.PRNGKey(2))
    eng = SPEngine(SPEC, params, sp=2, max_len=64, cache_dtype=jnp.bfloat16)
    ids = np.random.default_rng(3).integers(0, SPEC.vocab, size=(1, 20))
    r = eng.benchmark_chained(ids, check=True, warmup=1, reps=1,
                              log=lambda s: None)
    assert r["tokens_per_s"] > 0 and np.isfinite(r["ppl"])
    # PPL must equal the flat model's forced-decode NLL on the same chain
    cache = KVCache.init(SPEC, 1, 64, jnp.float32)
    idsj = jnp.asarray(ids)
    _, cache = model_forward(SPEC, params, idsj[:, :2], cache)
    nll = []
    for i in range(2, 19):
        logits, cache = model_forward(SPEC, params, idsj[:, i:i + 1], cache)
        lp = jax.nn.log_softmax(logits[0, -1].astype(jnp.float32))
        nll.append(-float(lp[ids[0, i + 1]]))
    want_ppl = float(np.exp(np.mean(nll)))
    assert abs(r["ppl"] - want_ppl) / want_ppl < 2e-3


@pytest.mark.parametrize("ep,tp", [(2, 1), (2, 2)])
def test_ep_engine_generate_matches_flat(ep, tp):
    from gptq_tpu.engine.serving import EPEngine

    params = init_params(MOE_SPEC, jax.random.PRNGKey(4))
    prompt = np.random.default_rng(5).integers(0, MOE_SPEC.vocab,
                                               size=(1, 8))
    want = _flat_greedy(MOE_SPEC, params, prompt, 5, max_len=16)
    eng = EPEngine(MOE_SPEC, params, ep=ep, tp=tp, max_len=16,
                   cache_dtype=jnp.float32)
    got = eng.generate(prompt, max_new_tokens=5)
    np.testing.assert_array_equal(got, want)


def test_ep_engine_rejects_dense_model():
    from gptq_tpu.engine.serving import EPEngine

    params = init_params(SPEC, jax.random.PRNGKey(6))
    with pytest.raises(ValueError, match="n_experts"):
        EPEngine(SPEC, params, ep=2)
