"""Fused int8-KV decode attention kernel: interpret-mode equivalence with
the materialized-dequant path (the chip compile is checked by bench/verify
runs; CPU interpret validates the math)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gptq_tpu.models.common import ArchSpec, KVCache, init_params, model_forward
from gptq_tpu.ops.attention import decode_attention_int8


def _ref_attention(q, k, v, ks, vs, length, sm_scale):
    B, H, hd = q.shape
    S, Hkv = k.shape[1], k.shape[2]
    rep = H // Hkv
    kf = np.asarray(k, np.float32) * np.asarray(ks)[..., None]
    vf = np.asarray(v, np.float32) * np.asarray(vs)[..., None]
    kf = np.repeat(kf, rep, axis=2)
    vf = np.repeat(vf, rep, axis=2)
    qf = np.asarray(q, np.float32)
    scores = np.einsum("bhd,bshd->bhs", qf, kf) * sm_scale
    scores[:, :, length:] = -1e9
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    return np.einsum("bhs,bshd->bhd", p, vf)


@pytest.mark.parametrize("gqa", [1, 2])
def test_kernel_matches_reference(gqa):
    rng = np.random.default_rng(0)
    B, H, hd, S = 2, 4, 16, 32
    Hkv = H // gqa
    q = rng.normal(size=(B, H, hd)).astype(np.float32)
    k = rng.integers(-127, 128, size=(B, S, Hkv, hd)).astype(np.int8)
    v = rng.integers(-127, 128, size=(B, S, Hkv, hd)).astype(np.int8)
    ks = (rng.random((B, S, Hkv)) * 0.01 + 0.001).astype(np.float32)
    vs = (rng.random((B, S, Hkv)) * 0.01 + 0.001).astype(np.float32)
    length = 21
    sm_scale = 1.0 / np.sqrt(hd)

    got = np.asarray(decode_attention_int8(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(ks),
        jnp.asarray(vs), jnp.asarray(length), float(sm_scale),
        interpret=True))
    want = _ref_attention(q, k, v, ks, vs, length, sm_scale)
    # bf16 MXU products: ~3 decimal digits
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-3)


def test_per_batch_lengths():
    rng = np.random.default_rng(1)
    B, H, hd, S = 3, 2, 8, 16
    q = rng.normal(size=(B, H, hd)).astype(np.float32)
    k = rng.integers(-127, 128, size=(B, S, H, hd)).astype(np.int8)
    v = rng.integers(-127, 128, size=(B, S, H, hd)).astype(np.int8)
    ks = (rng.random((B, S, H)) * 0.01 + 0.001).astype(np.float32)
    vs = (rng.random((B, S, H)) * 0.01 + 0.001).astype(np.float32)
    lens = np.asarray([5, 11, 16], np.int32)
    got = np.asarray(decode_attention_int8(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(ks),
        jnp.asarray(vs), jnp.asarray(lens), 0.3, interpret=True))
    for b in range(B):
        want = _ref_attention(q[b:b+1], k[b:b+1], v[b:b+1], ks[b:b+1],
                              vs[b:b+1], int(lens[b]), 0.3)
        np.testing.assert_allclose(got[b:b+1], want, rtol=2e-2, atol=2e-3)


def test_model_decode_int8_kernel_matches_materialized(monkeypatch):
    """Full decode path: the kernel route must reproduce the materialized
    int8-dequant route token-for-token."""
    spec = ArchSpec(arch="llama", n_layers=2, hidden=32, n_heads=4,
                    n_kv_heads=2, ffn=64, vocab=61, max_pos=64, act="silu",
                    pos="rope", norm_type="rmsnorm", linear_bias=False,
                    tie_embeddings=False)
    params = init_params(spec, jax.random.PRNGKey(0))

    def decode(mode):
        monkeypatch.setenv("GPTQ_TPU_ATTN_IMPL", mode)
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


@pytest.mark.parametrize("gqa", [1, 2])
def test_bf16_cache_kernel_matches_reference(gqa):
    """The scale-free variant (bf16/f32 cache slabs consumed as-is)."""
    from gptq_tpu.ops.attention import decode_attention

    rng = np.random.default_rng(2)
    B, H, hd, S = 2, 4, 16, 32
    Hkv = H // gqa
    q = rng.normal(size=(B, H, hd)).astype(np.float32)
    k = rng.normal(size=(B, S, Hkv, hd)).astype(np.float32)
    v = rng.normal(size=(B, S, Hkv, hd)).astype(np.float32)
    ones = np.ones((B, S, Hkv), np.float32)
    length = 19
    sm_scale = 1.0 / np.sqrt(hd)
    got = np.asarray(decode_attention(
        jnp.asarray(q), jnp.asarray(k, np.float32).astype(jnp.bfloat16),
        jnp.asarray(v, np.float32).astype(jnp.bfloat16),
        jnp.asarray(length), float(sm_scale), interpret=True))
    want = _ref_attention(
        q, np.asarray(jnp.asarray(k).astype(jnp.bfloat16), np.float32),
        np.asarray(jnp.asarray(v).astype(jnp.bfloat16), np.float32),
        ones, ones, length, sm_scale)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-3)


def _ref_partial(q, k, v, ks, vs, pos, sm_scale, slopes=None):
    """Normalized attention over content-masked slots (numpy oracle);
    combine-equivalent check: out = acc / l from the partials."""
    B, H, hd = q.shape
    S, Hkv = k.shape[1], k.shape[2]
    rep = H // Hkv
    kf = np.asarray(k, np.float32)
    vf = np.asarray(v, np.float32)
    if ks is not None:
        kf = kf * np.asarray(ks)[..., None]
        vf = vf * np.asarray(vs)[..., None]
    kf = np.repeat(kf, rep, axis=2)
    vf = np.repeat(vf, rep, axis=2)
    scores = np.einsum("bhd,bshd->bhs", np.asarray(q, np.float32), kf) * sm_scale
    if slopes is not None:
        scores = scores + slopes[None, :, None] * np.maximum(pos, 0)[None, None]
    scores[:, :, pos < 0] = -np.inf
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p[:, :, pos < 0] = 0.0
    return np.einsum("bhs,bshd->bhd", p / p.sum(-1, keepdims=True), vf)


@pytest.mark.parametrize("gqa,int8", [(1, True), (2, True), (2, False)])
def test_partial_kernel_matches_reference(gqa, int8):
    """decode_attention_partial: normalized acc/l over content-masked
    slots == dense softmax with -inf at empty slots (int8 + scale planes
    and raw bf16 slabs; GQA handled inside the kernel)."""
    from gptq_tpu.ops.attention import decode_attention_partial

    rng = np.random.default_rng(4)
    B, H, hd, S = 2, 4, 16, 32
    Hkv = H // gqa
    q = rng.normal(size=(B, H, hd)).astype(np.float32)
    # round-robin filled slots with gaps (-1 = empty), like SPCache
    pos = np.asarray([3 * i if i % 3 != 2 else -1 for i in range(S)],
                     np.int32)
    if int8:
        k = rng.integers(-127, 128, size=(B, S, Hkv, hd)).astype(np.int8)
        v = rng.integers(-127, 128, size=(B, S, Hkv, hd)).astype(np.int8)
        ks = (rng.random((B, S, Hkv)) * 0.01 + 0.001).astype(np.float32)
        vs = (rng.random((B, S, Hkv)) * 0.01 + 0.001).astype(np.float32)
    else:
        k = rng.normal(size=(B, S, Hkv, hd)).astype(np.float32)
        v = rng.normal(size=(B, S, Hkv, hd)).astype(np.float32)
        ks = vs = None
    sm_scale = 1.0 / np.sqrt(hd)
    m, l, acc = decode_attention_partial(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(pos),
        float(sm_scale),
        k_scale=None if ks is None else jnp.asarray(ks),
        v_scale=None if vs is None else jnp.asarray(vs),
        interpret=True)
    got = np.asarray(acc) / np.asarray(l)[..., None]
    want = _ref_partial(q, k, v, ks, vs, pos, sm_scale)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-3)


def test_partial_kernel_alibi_and_empty_device():
    """Alibi slopes fold into the scores (slope * key position); a device
    whose slots are ALL empty reports m = NEG_INF and l = 0 so the
    cross-device combine weights it to zero."""
    from gptq_tpu.ops.attention import NEG_INF, decode_attention_partial

    rng = np.random.default_rng(5)
    B, H, hd, S = 1, 4, 8, 16
    q = rng.normal(size=(B, H, hd)).astype(np.float32)
    k = rng.normal(size=(B, S, H, hd)).astype(np.float32)
    v = rng.normal(size=(B, S, H, hd)).astype(np.float32)
    slopes = (0.5 ** np.arange(1, H + 1)).astype(np.float32)
    pos = np.asarray([2 * i if i < 10 else -1 for i in range(S)], np.int32)
    m, l, acc = decode_attention_partial(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(pos),
        0.35, slopes=jnp.asarray(slopes), interpret=True)
    got = np.asarray(acc) / np.asarray(l)[..., None]
    want = _ref_partial(q, k, v, None, None, pos, 0.35, slopes=slopes)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-3)

    m, l, acc = decode_attention_partial(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.full((S,), -1, jnp.int32), 0.35, interpret=True)
    assert np.all(np.asarray(m) == NEG_INF)
    assert np.all(np.asarray(l) == 0.0)
    assert np.all(np.asarray(acc) == 0.0)


def test_model_decode_bf16_cache_kernel_matches_xla(monkeypatch):
    """Decode with the plain bf16 cache: kernel route vs einsum route
    must agree token-for-token (greedy) and closely on logits."""
    spec = ArchSpec(arch="llama", n_layers=2, hidden=32, n_heads=4,
                    n_kv_heads=2, ffn=64, vocab=61, max_pos=64, act="silu",
                    pos="rope", norm_type="rmsnorm", linear_bias=False,
                    tie_embeddings=False)
    params = init_params(spec, jax.random.PRNGKey(3))

    def decode(mode):
        monkeypatch.setenv("GPTQ_TPU_ATTN_IMPL", mode)
        cache = KVCache.init(spec, 1, 16, jnp.float32)
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
