"""Decode engine tests: generation correctness + benchmark protocol."""

import numpy as np
import jax
import jax.numpy as jnp

from gptq_tpu.engine.decode import (DecodeEngine, benchmark_decode,
                                    benchmark_decode_chained)
from gptq_tpu.models.common import ArchSpec, init_params, model_forward

SPEC = ArchSpec(arch="llama", n_layers=2, hidden=32, n_heads=4, n_kv_heads=2,
                ffn=64, vocab=61, max_pos=64, act="silu", pos="rope",
                norm_type="rmsnorm", linear_bias=False, tie_embeddings=False)


def test_greedy_generate_matches_argmax_rollout():
    params = init_params(SPEC, jax.random.PRNGKey(0))
    engine = DecodeEngine(SPEC, params, max_len=32, cache_dtype=jnp.float32)
    prompt = np.asarray([[1, 2, 3, 4]])
    got = engine.generate(prompt, max_new_tokens=6)

    # oracle: full re-forward per step
    ids = prompt.copy()
    want = []
    for _ in range(6):
        logits, _ = model_forward(SPEC, params, jnp.asarray(ids))
        nxt = int(jnp.argmax(logits[0, -1]))
        want.append(nxt)
        ids = np.concatenate([ids, [[nxt]]], axis=1)
    assert got[0].tolist() == want


def test_benchmark_protocol_runs():
    params = init_params(SPEC, jax.random.PRNGKey(1))
    ids = np.random.default_rng(0).integers(0, 61, size=(1, 8))
    res = benchmark_decode(SPEC, params, ids, check=True, warmup=2,
                           log=lambda s: None)
    assert res["median_s"] > 0
    assert np.isfinite(res["ppl"])


def test_chained_generate_matches_per_token():
    params = init_params(SPEC, jax.random.PRNGKey(2))
    engine = DecodeEngine(SPEC, params, max_len=32, cache_dtype=jnp.float32)
    prompt = np.asarray([[5, 6, 7]])
    want = engine.generate(prompt, max_new_tokens=9)
    got = engine.generate_chained(prompt, max_new_tokens=9, chunk=4)
    assert got.tolist() == want.tolist()


def test_bucketed_generation_matches_full():
    """Length-bucketed chained decode (smaller cache views early) must
    produce identical tokens to the full-cache loop."""
    params = init_params(SPEC, jax.random.PRNGKey(4))
    engine = DecodeEngine(SPEC, params, max_len=512,
                          cache_dtype=jnp.float32)
    prompt = np.asarray([[1, 5, 9]])
    full = engine.generate_chained(prompt, max_new_tokens=12, chunk=5,
                                   bucketed=False)
    bucketed = engine.generate_chained(prompt, max_new_tokens=12, chunk=5,
                                       bucketed=True)
    assert bucketed.tolist() == full.tolist()
    # int8 cache variant also runs bucketed
    e8 = DecodeEngine(SPEC, params, max_len=512, cache_dtype=jnp.int8)
    out = e8.generate_chained(prompt, max_new_tokens=6, chunk=4)
    assert out.shape == (1, 6)


def test_sampled_generation():
    """temperature>0 sampling: deterministic per key, valid token range,
    top-k truncation only emits high-probability tokens."""
    params = init_params(SPEC, jax.random.PRNGKey(3))
    engine = DecodeEngine(SPEC, params, max_len=32, cache_dtype=jnp.float32)
    prompt = np.asarray([[2, 4, 6]])
    a = engine.generate_chained(prompt, max_new_tokens=8, chunk=3,
                                temperature=0.8, top_k=5,
                                key=jax.random.PRNGKey(42))
    b = engine.generate_chained(prompt, max_new_tokens=8, chunk=3,
                                temperature=0.8, top_k=5,
                                key=jax.random.PRNGKey(42))
    assert a.tolist() == b.tolist()
    assert (a >= 0).all() and (a < 61).all()
    # greedy unchanged
    g = engine.generate_chained(prompt, max_new_tokens=8, chunk=3)
    want = engine.generate(prompt, max_new_tokens=8)
    assert g.tolist() == want.tolist()


def test_int8_kv_cache_decode_close():
    """int8 KV cache (dynamic per-token-head scales) must stay close to
    the full-precision cache on multi-step decode."""
    params = init_params(SPEC, jax.random.PRNGKey(9))
    prompt = np.asarray([[4, 9, 2, 7]])

    ref_engine = DecodeEngine(SPEC, params, max_len=32,
                              cache_dtype=jnp.float32)
    logits_ref, cache_ref = ref_engine.prefill(jnp.asarray(prompt))
    q_engine = DecodeEngine(SPEC, params, max_len=32, cache_dtype=jnp.int8)
    logits_q, cache_q = q_engine.prefill(jnp.asarray(prompt))
    assert cache_q.k.dtype == jnp.int8 and cache_q.k_scale is not None
    np.testing.assert_allclose(np.asarray(logits_q), np.asarray(logits_ref),
                               rtol=0.05, atol=0.05)

    # several decode steps through the quantized cache
    tok = jnp.argmax(logits_q, axis=-1)[:, None]
    tok_ref = jnp.argmax(logits_ref, axis=-1)[:, None]
    for _ in range(4):
        logits_q, cache_q = q_engine._step(q_engine.params, cache_q, tok)
        logits_ref, cache_ref = ref_engine._step(ref_engine.params,
                                                 cache_ref, tok_ref)
        tok = jnp.argmax(logits_q, axis=-1)[:, None]
        tok_ref = jnp.argmax(logits_ref, axis=-1)[:, None]
    denom = float(jnp.abs(logits_ref).max())
    rel = float(jnp.abs(logits_q - logits_ref).max()) / denom
    assert rel < 0.1, rel


def test_a8_engine_generates():
    """--faster-kernel engine path: packed weights + int8 activations must
    jit and decode (tokens may legitimately differ from the a16 path)."""
    from gptq_tpu.config import QuantConfig
    from gptq_tpu.models.common import init_params as _ip
    from gptq_tpu.pipeline import pack_model, quantize_model

    params = init_params(SPEC, jax.random.PRNGKey(7))
    calib = jnp.asarray(
        np.random.default_rng(7).integers(0, 61, size=(2, 8)))
    cfg = QuantConfig(wbits=4, nsamples=2)
    res = quantize_model(SPEC, params, calib, cfg, log=lambda s: None)
    pack_model(SPEC, params, res.quantizers, cfg)

    engine = DecodeEngine(SPEC, params, max_len=32, a8=True)
    out = engine.generate_chained(np.asarray([[1, 2, 3]]), max_new_tokens=5,
                                  chunk=2)
    assert out.shape == (1, 5)
    assert (out >= 0).all() and (out < 61).all()


def test_chained_benchmark_ppl_matches_per_token():
    params = init_params(SPEC, jax.random.PRNGKey(1))
    ids = np.random.default_rng(0).integers(0, 61, size=(1, 8))
    ref = benchmark_decode(SPEC, params, ids, check=True, warmup=1,
                           log=lambda s: None)
    res = benchmark_decode_chained(SPEC, params, ids, check=True, warmup=1,
                                   reps=1, log=lambda s: None)
    assert res["n_tokens"] == 8
    assert np.isclose(res["ppl"], ref["ppl"], rtol=2e-3)
