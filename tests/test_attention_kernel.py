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
