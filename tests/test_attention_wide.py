"""Wide (all-heads-per-MXU-dot) decode-attention kernel coverage.

This kernel is the DEFAULT decode path whenever head_dim % 128 == 0 —
i.e. for every real llama/gemma/mixtral-class model (ops/attention.py
dispatch) — so it gets the same interpret-mode oracle treatment as the
narrow kernel (VERDICT r4 #4): B=1 and B>1, GQA, int8 scales, the
fresh-pair (deferred-write) epilogue, ragged per-slot lens, the
layer-stacked cache feed, and a GPTQ_TPU_ATTN_WIDE=0 equivalence A/B.
Reference kernel-correctness intent: lutgemm makeRandom* fixtures
(reference: lut_gemm/lutgemm_cuda.cpp:52-107).
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gptq_tpu.ops.attention import decode_attention, decode_attention_wide

HD = 128  # lane-aligned head_dim: the wide kernel's whole reason to exist


def _oracle(q, k, v, ks, vs, length, sm_scale, fresh_k=None, fresh_v=None):
    """Dense softmax oracle: cache positions < length (per batch row),
    plus the fresh (un-written) pair as one extra always-valid slot."""
    B, H, hd = q.shape
    S, Hkv = k.shape[1], k.shape[2]
    rep = H // Hkv
    kf = np.asarray(k, np.float32)
    vf = np.asarray(v, np.float32)
    if ks is not None:
        kf = kf * np.asarray(ks, np.float32)[..., None]
        vf = vf * np.asarray(vs, np.float32)[..., None]
    lens = np.broadcast_to(np.asarray(length), (B,))
    if fresh_k is not None:
        kf = np.concatenate([kf, np.asarray(fresh_k, np.float32)[:, None]],
                            axis=1)
        vf = np.concatenate([vf, np.asarray(fresh_v, np.float32)[:, None]],
                            axis=1)
    kf = np.repeat(kf, rep, axis=2)
    vf = np.repeat(vf, rep, axis=2)
    scores = np.einsum("bhd,bshd->bhs", np.asarray(q, np.float32), kf)
    scores = scores * sm_scale
    pos = np.arange(kf.shape[1])[None, :]
    valid = pos < lens[:, None]
    if fresh_k is not None:
        valid = valid.copy()
        valid[:, -1] = True  # the fresh slot is always attended
    scores = np.where(valid[:, None], scores, -1e9)
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p = np.where(valid[:, None], p, 0.0)
    return np.einsum("bhs,bshd->bhd", p / p.sum(-1, keepdims=True), vf)


def _rand(rng, B, S, Hkv, int8):
    if int8:
        k = rng.integers(-127, 128, size=(B, S, Hkv, HD)).astype(np.int8)
        v = rng.integers(-127, 128, size=(B, S, Hkv, HD)).astype(np.int8)
        ks = (rng.random((B, S, Hkv)) * 0.01 + 0.001).astype(np.float32)
        vs = (rng.random((B, S, Hkv)) * 0.01 + 0.001).astype(np.float32)
        return k, v, ks, vs
    k = rng.normal(size=(B, S, Hkv, HD)).astype(np.float32)
    v = rng.normal(size=(B, S, Hkv, HD)).astype(np.float32)
    return k, v, None, None


def _call_wide(q, k, v, length, sm_scale, ks=None, vs=None, fk=None,
               fv=None, layer=None):
    return np.asarray(decode_attention_wide(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(length),
        float(sm_scale),
        k_scale=None if ks is None else jnp.asarray(ks),
        v_scale=None if vs is None else jnp.asarray(vs),
        fresh_k=None if fk is None else jnp.asarray(fk),
        fresh_v=None if fv is None else jnp.asarray(fv),
        layer=layer, interpret=True))


@pytest.mark.parametrize("B,gqa,int8", [
    (1, 1, True), (1, 1, False),          # MHA, both cache dtypes
    (3, 1, True),                          # B > 1
    (1, 2, True), (3, 4, True),            # GQA (mixtral/llama-70B class)
    (2, 2, False),                         # GQA, bf16 cache
])
def test_wide_matches_oracle(B, gqa, int8):
    rng = np.random.default_rng(0)
    H, S = 4, 512  # S=512 -> 2 S-blocks: the online-softmax carry runs
    Hkv = H // gqa
    q = rng.normal(size=(B, H, HD)).astype(np.float32)
    k, v, ks, vs = _rand(rng, B, S, Hkv, int8)
    length = 307  # straddles the block boundary
    sm = 1.0 / np.sqrt(HD)
    got = _call_wide(q, k, v, length, sm, ks, vs)
    want = _oracle(q, k, v, ks, vs, length, sm)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-3)


@pytest.mark.parametrize("B,gqa,int8", [(1, 1, True), (3, 2, True),
                                        (2, 4, False)])
def test_wide_fresh_pair_epilogue(B, gqa, int8):
    """Deferred-write decode: the token's own (exact f32) k/v pair merges
    into the online softmax in the last block's epilogue."""
    rng = np.random.default_rng(1)
    H, S = 4, 256
    Hkv = H // gqa
    q = rng.normal(size=(B, H, HD)).astype(np.float32)
    k, v, ks, vs = _rand(rng, B, S, Hkv, int8)
    fk = rng.normal(size=(B, Hkv, HD)).astype(np.float32)
    fv = rng.normal(size=(B, Hkv, HD)).astype(np.float32)
    sm = 1.0 / np.sqrt(HD)
    got = _call_wide(q, k, v, 100, sm, ks, vs, fk, fv)
    want = _oracle(q, k, v, ks, vs, 100, sm, fresh_k=fk, fresh_v=fv)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-3)


def test_wide_fresh_pair_only_fresh():
    """length=0 (first decode step): output is attention over the fresh
    pair alone — softmax of a single column must be exactly its value."""
    rng = np.random.default_rng(2)
    B, H, S = 2, 4, 256
    q = rng.normal(size=(B, H, HD)).astype(np.float32)
    k, v, ks, vs = _rand(rng, B, S, H, True)
    fk = rng.normal(size=(B, H, HD)).astype(np.float32)
    fv = rng.normal(size=(B, H, HD)).astype(np.float32)
    got = _call_wide(q, k, v, 0, 0.1, ks, vs, fk, fv)
    np.testing.assert_allclose(got, fv, rtol=2e-2, atol=2e-3)


@pytest.mark.parametrize("gqa", [1, 2])
def test_wide_ragged_per_slot_lens(gqa):
    """Continuous batching: each slot attends its OWN filled length."""
    rng = np.random.default_rng(3)
    B, H, S = 4, 4, 256
    Hkv = H // gqa
    q = rng.normal(size=(B, H, HD)).astype(np.float32)
    k, v, ks, vs = _rand(rng, B, S, Hkv, True)
    fk = rng.normal(size=(B, Hkv, HD)).astype(np.float32)
    fv = rng.normal(size=(B, Hkv, HD)).astype(np.float32)
    lens = np.asarray([0, 7, 130, 256], np.int32)
    got = _call_wide(q, k, v, lens, 0.09, ks, vs, fk, fv)
    for b in range(B):
        want = _oracle(q[b:b + 1], k[b:b + 1], v[b:b + 1], ks[b:b + 1],
                       vs[b:b + 1], int(lens[b]), 0.09,
                       fresh_k=fk[b:b + 1], fresh_v=fv[b:b + 1])
        np.testing.assert_allclose(got[b:b + 1], want, rtol=2e-2, atol=2e-3)


@pytest.mark.parametrize("gqa", [1, 2])
def test_wide_layer_stacked_cache(gqa):
    """The serving path feeds the WHOLE (L, B, S, Hkv, hd) stack with a
    static layer index (avoids XLA's sliced-operand copy before a custom
    call); every layer's slice must match the unstacked call."""
    rng = np.random.default_rng(4)
    L, B, H, S = 3, 2, 4, 256
    Hkv = H // gqa
    q = rng.normal(size=(B, H, HD)).astype(np.float32)
    kL = rng.integers(-127, 128, size=(L, B, S, Hkv, HD)).astype(np.int8)
    vL = rng.integers(-127, 128, size=(L, B, S, Hkv, HD)).astype(np.int8)
    ksL = (rng.random((L, B, S, Hkv)) * 0.01 + 0.001).astype(np.float32)
    vsL = (rng.random((L, B, S, Hkv)) * 0.01 + 0.001).astype(np.float32)
    fk = rng.normal(size=(B, Hkv, HD)).astype(np.float32)
    fv = rng.normal(size=(B, Hkv, HD)).astype(np.float32)
    for li in range(L):
        got = _call_wide(q, kL, vL, 99, 0.09, ksL, vsL, fk, fv, layer=li)
        want = _call_wide(q, kL[li], vL[li], 99, 0.09, ksL[li], vsL[li],
                          fk, fv)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_dispatch_wide_default_and_env_off(monkeypatch):
    """decode_attention at hd % 128 == 0 routes to the wide kernel by
    default; GPTQ_TPU_ATTN_WIDE=0 reverts to the narrow kernel and the
    two agree numerically (the A/B the env knob promises)."""
    import gptq_tpu.ops.attention as A

    rng = np.random.default_rng(5)
    B, H, S = 2, 4, 256
    q = rng.normal(size=(B, H, HD)).astype(np.float32)
    k, v, ks, vs = _rand(rng, B, S, H, True)
    args = (jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(170), 0.09)
    kw = dict(k_scale=jnp.asarray(ks), v_scale=jnp.asarray(vs),
              interpret=True)

    calls = []
    real_wide = A.decode_attention_wide

    def spy(*a, **k):
        calls.append(1)
        return real_wide(*a, **k)

    monkeypatch.setattr(A, "decode_attention_wide", spy)
    jax.clear_caches()  # the env/dispatch check runs at trace time
    monkeypatch.setenv("GPTQ_TPU_ATTN_WIDE", "1")
    wide_out = np.asarray(decode_attention(*args, **kw))
    assert calls, "hd=128 must route to the wide kernel by default"

    jax.clear_caches()
    monkeypatch.setenv("GPTQ_TPU_ATTN_WIDE", "0")
    calls.clear()
    narrow_out = np.asarray(decode_attention(*args, **kw))
    assert not calls, "GPTQ_TPU_ATTN_WIDE=0 must take the narrow kernel"
    np.testing.assert_allclose(wide_out, narrow_out, rtol=2e-2, atol=2e-3)
    jax.clear_caches()


@pytest.mark.parametrize("kv_heads", [4, 2])
def test_batcher_wide_vs_xla_token_parity(monkeypatch, kv_heads):
    """Deferred-write continuous batching at hd=128 (the default serving
    shape of every real model): the wide-kernel route must reproduce the
    XLA einsum route token-for-token, MHA and GQA."""
    from gptq_tpu.engine.batching import ContinuousBatcher
    from gptq_tpu.models.common import ArchSpec, init_params

    spec = ArchSpec(arch="llama", n_layers=2, hidden=4 * HD, n_heads=4,
                    n_kv_heads=kv_heads, ffn=256, vocab=67, max_pos=64,
                    act="silu", pos="rope", norm_type="rmsnorm",
                    linear_bias=False, tie_embeddings=False)
    params = init_params(spec, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    prompts = [rng.integers(1, spec.vocab, size=(n,)) for n in (5, 9, 13)]

    def serve(impl, wide):
        monkeypatch.setenv("GPTQ_TPU_ATTN_IMPL", impl)
        monkeypatch.setenv("GPTQ_TPU_ATTN_WIDE", wide)
        cb = ContinuousBatcher(spec, params, batch_slots=2, max_len=32,
                               cache_dtype=jnp.int8,
                               prefill_buckets=(16,))
        for p in prompts:
            cb.submit(p, max_new_tokens=6)
        return [r.output for r in cb.run(window=3)]

    want = serve("xla", "1")
    got_wide = serve("interpret", "1")
    got_narrow = serve("interpret", "0")
    assert got_wide == want
    assert got_narrow == want


def test_model_forward_wide_matches_xla(monkeypatch):
    """Single-stream model_forward decode at hd=128, int8 KV: wide kernel
    route vs XLA route, token-for-token."""
    from gptq_tpu.models.common import (ArchSpec, KVCache, init_params,
                                        model_forward)

    spec = ArchSpec(arch="llama", n_layers=2, hidden=2 * HD, n_heads=2,
                    n_kv_heads=2, ffn=128, vocab=61, max_pos=64,
                    act="silu", pos="rope", norm_type="rmsnorm",
                    linear_bias=False, tie_embeddings=False)
    params = init_params(spec, jax.random.PRNGKey(1))

    def decode(impl):
        monkeypatch.setenv("GPTQ_TPU_ATTN_IMPL", impl)
        cache = KVCache.init(spec, 1, 16, jnp.int8)
        toks, logits_all = [], []
        tok = jnp.asarray([[7]])
        for _ in range(5):
            logits, cache = model_forward(spec, params, tok, cache)
            tok = jnp.argmax(logits[:, -1], axis=-1)[:, None]
            toks.append(int(tok[0, 0]))
            logits_all.append(np.asarray(logits[:, -1]))
        return toks, np.stack(logits_all)

    toks_x, logits_x = decode("xla")
    toks_k, logits_k = decode("interpret")
    assert toks_k == toks_x
    np.testing.assert_allclose(logits_k, logits_x, rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("gqa,int8", [(1, True), (2, True), (4, False)])
def test_partial_wide_matches_narrow(gqa, int8):
    """The wide partial kernel (context-parallel decode at hd=128) must
    emit combine-equivalent (m, l, acc) state: acc/l equals the narrow
    partial kernel's, over content-masked round-robin slots."""
    from gptq_tpu.ops.attention import (decode_attention_partial,
                                        decode_attention_partial_wide)

    rng = np.random.default_rng(6)
    B, H, S = 2, 4, 256
    Hkv = H // gqa
    q = rng.normal(size=(B, H, HD)).astype(np.float32)
    k, v, ks, vs = _rand(rng, B, S, Hkv, int8)
    pos = np.asarray([3 * i if i % 3 != 2 else -1 for i in range(S)],
                     np.int32)
    kw = dict(k_scale=None if ks is None else jnp.asarray(ks),
              v_scale=None if vs is None else jnp.asarray(vs),
              interpret=True)
    m_w, l_w, acc_w = decode_attention_partial_wide(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(pos),
        0.09, **kw)
    m_n, l_n, acc_n = decode_attention_partial(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(pos),
        0.09, **kw)
    got = np.asarray(acc_w) / np.asarray(l_w)[..., None]
    want = np.asarray(acc_n) / np.asarray(l_n)[..., None]
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-3)
    # the m/l state itself must combine identically across devices:
    # normalize both to the same shift and compare denominators
    np.testing.assert_allclose(
        np.asarray(l_w) * np.exp(np.asarray(m_w)),
        np.asarray(l_n) * np.exp(np.asarray(m_n)), rtol=3e-2)


def test_partial_wide_alibi_gqa_and_empty():
    """Alibi bias composes with GQA in the wide partial kernel (the
    narrow one requires G=1); a fully-empty device reports m=NEG_INF,
    l=0 so the cross-device combine weights it to zero."""
    from gptq_tpu.ops.attention import NEG_INF, decode_attention_partial_wide

    rng = np.random.default_rng(7)
    B, H, Hkv, S = 1, 4, 2, 256
    q = rng.normal(size=(B, H, HD)).astype(np.float32)
    k, v, ks, vs = _rand(rng, B, S, Hkv, False)
    slopes = (0.5 ** np.arange(1, H + 1)).astype(np.float32)
    pos = np.asarray([2 * i if i < 100 else -1 for i in range(S)], np.int32)
    m, l, acc = decode_attention_partial_wide(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(pos),
        0.2, slopes=jnp.asarray(slopes), interpret=True)
    got = np.asarray(acc) / np.asarray(l)[..., None]
    # oracle: dense softmax with alibi slope * key_pos, empty slots masked
    kf = np.repeat(np.asarray(k, np.float32), H // Hkv, axis=2)
    vf = np.repeat(np.asarray(v, np.float32), H // Hkv, axis=2)
    scores = np.einsum("bhd,bshd->bhs", q, kf) * 0.2
    scores = scores + slopes[None, :, None] * np.maximum(pos, 0)[None, None]
    scores[:, :, pos < 0] = -np.inf
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p[:, :, pos < 0] = 0.0
    want = np.einsum("bhs,bshd->bhd", p / p.sum(-1, keepdims=True), vf)
    # bf16 slab dots + exp of ~0.4%-rounded scores (the alibi bias lifts
    # score magnitudes to ~100, so the bf16 q.k rounding shows up as a
    # slightly larger absolute error than in the unbiased tests)
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=2e-2)

    m, l, acc = decode_attention_partial_wide(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.full((S,), -1, jnp.int32), 0.2, interpret=True)
    assert np.all(np.asarray(m) == NEG_INF)
    assert np.all(np.asarray(l) == 0.0)
    assert np.all(np.asarray(acc) == 0.0)


def test_partial_wide_layer_stacked():
    """Static-layer stacked-cache feed of the wide partial kernel."""
    from gptq_tpu.ops.attention import decode_attention_partial_wide

    rng = np.random.default_rng(8)
    L, B, H, S = 3, 1, 4, 256
    q = rng.normal(size=(B, H, HD)).astype(np.float32)
    kL = rng.integers(-127, 128, size=(L, B, S, H, HD)).astype(np.int8)
    vL = rng.integers(-127, 128, size=(L, B, S, H, HD)).astype(np.int8)
    ksL = (rng.random((L, B, S, H)) * 0.01 + 0.001).astype(np.float32)
    vsL = (rng.random((L, B, S, H)) * 0.01 + 0.001).astype(np.float32)
    pos = np.asarray([i if i < 200 else -1 for i in range(S)], np.int32)
    for li in range(L):
        m0, l0, a0 = decode_attention_partial_wide(
            jnp.asarray(q), jnp.asarray(kL), jnp.asarray(vL),
            jnp.asarray(pos), 0.09, k_scale=jnp.asarray(ksL),
            v_scale=jnp.asarray(vsL), layer=li, interpret=True)
        m1, l1, a1 = decode_attention_partial_wide(
            jnp.asarray(q), jnp.asarray(kL[li]), jnp.asarray(vL[li]),
            jnp.asarray(pos), 0.09, k_scale=jnp.asarray(ksL[li]),
            v_scale=jnp.asarray(vsL[li]), interpret=True)
        np.testing.assert_allclose(np.asarray(m0), np.asarray(m1))
        np.testing.assert_allclose(np.asarray(l0), np.asarray(l1),
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(a0), np.asarray(a1),
                                   rtol=1e-5, atol=1e-6)
