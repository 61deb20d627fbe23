"""Single-launch whole-decoder-layer kernel (ops/layer_fused.py),
interpret mode: must reproduce the unfused decode math (ln1 -> qkv ->
rope -> cache update -> attention -> o -> +res -> ln2 -> glu mlp -> +res)
and leave the cache updated in place."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gptq_tpu.models.common import apply_rope
from gptq_tpu.ops.kernel_bench import make_random_packed
from gptq_tpu.ops.layer_fused import decode_layer_fused, layer_fusable
from gptq_tpu.ops.pack import fuse_packed
from gptq_tpu.ops.qmatmul import dequant_matmul


def make_layer(key, hidden=256, n_heads=4, n_kv_heads=2, ffn=512, bits=4):
    hd = hidden // n_heads
    kvw = n_kv_heads * hd
    ks = jax.random.split(key, 7)
    q = make_random_packed(ks[0], hidden, hidden, bits, -1)
    k = make_random_packed(ks[1], hidden, kvw, bits, -1)
    v = make_random_packed(ks[2], hidden, kvw, bits, -1)
    o = make_random_packed(ks[3], hidden, hidden, bits, -1)
    gate = make_random_packed(ks[4], hidden, ffn, bits, -1)
    up = make_random_packed(ks[5], hidden, ffn, bits, -1)
    dn = make_random_packed(ks[6], ffn, hidden, bits, -1)
    qkv = fuse_packed([q, k, v])
    gu = fuse_packed([gate, up])
    return dict(q=q, k=k, v=v, o=o, gate=gate, up=up, dn=dn,
                qkv=qkv, gu=gu)


class _Splits:
    def __init__(self, parts):
        self.parts = parts


def _rmsnorm(x, w, eps=1e-5):
    x = x.astype(jnp.float32)
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    y = x * jax.lax.rsqrt(var + eps) * w[None, None]
    return y.astype(jnp.bfloat16).astype(jnp.float32)


def _oracle(x, L, ck, cv, length, cos, sin, w1, w2, H, Hkv, hd, a8):
    """Unfused decode-layer math through the xla dequant matmuls."""
    kvw = Hkv * hd
    h1 = _rmsnorm(x, w1).astype(jnp.bfloat16)
    q = dequant_matmul(h1, L["q"], impl="xla", a8=a8)
    k = dequant_matmul(h1, L["k"], impl="xla", a8=a8)
    v = dequant_matmul(h1, L["v"], impl="xla", a8=a8)
    q = q.reshape(1, 1, H, hd).astype(jnp.float32)
    k = k.reshape(1, 1, Hkv, hd).astype(jnp.float32)
    v = v.reshape(1, 1, Hkv, hd).astype(jnp.float32)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    ck = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype), (0, length, 0, 0))
    cv = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype), (0, length, 0, 0))
    S = ck.shape[1]
    rep = H // Hkv
    kf = jnp.repeat(ck.astype(jnp.float32), rep, axis=2)
    vf = jnp.repeat(cv.astype(jnp.float32), rep, axis=2)
    sc = jnp.einsum("bthd,bshd->bhts", q * (hd ** -0.5), kf)
    mask = jnp.where(jnp.arange(S) <= length, 0.0, -1e9)[None, None, None]
    p = jax.nn.softmax(sc + mask, axis=-1)
    attn = jnp.einsum("bhts,bshd->bthd", p, vf).reshape(1, 1, H * hd)
    ao = dequant_matmul(attn.astype(jnp.bfloat16), L["o"], impl="xla", a8=a8)
    r2 = (x.astype(jnp.float32) + ao.astype(jnp.float32)
          ).astype(jnp.bfloat16).astype(jnp.float32)
    m = _rmsnorm(r2, w2).astype(jnp.bfloat16)
    g = dequant_matmul(m, L["gate"], impl="xla", a8=a8)
    u = dequant_matmul(m, L["up"], impl="xla", a8=a8)
    inner = (jax.nn.silu(g.astype(jnp.float32)) * u.astype(jnp.float32)
             ).astype(jnp.bfloat16)
    d = dequant_matmul(inner, L["dn"], impl="xla", a8=a8)
    y = r2 + d.astype(jnp.float32)
    return y, ck, cv


def _check_oracle(a8, gqa, S, length):
    hidden, H, ffn = 256, 4, 512
    Hkv = H // gqa
    hd = hidden // H
    kvw = Hkv * hd
    key = jax.random.PRNGKey(42 + gqa)
    L = make_layer(key, hidden, H, Hkv, ffn)
    splits = _Splits(((hidden, hidden), (kvw, kvw), (kvw, kvw)))
    assert layer_fusable(L["qkv"], splits, L["o"], L["gu"], L["dn"],
                         hidden, H, Hkv)

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(1, 1, hidden)) * 0.5, jnp.bfloat16)
    ck = jnp.asarray(rng.normal(size=(1, S, Hkv, hd)), jnp.bfloat16)
    cv = jnp.asarray(rng.normal(size=(1, S, Hkv, hd)), jnp.bfloat16)
    # rows beyond `length` must not influence the result: poison them
    poison = jnp.full((1, S - length - 1, Hkv, hd), 37.0, jnp.bfloat16)
    ck = ck.at[:, length + 1:].set(poison)
    cv = cv.at[:, length + 1:].set(poison)
    pos = jnp.asarray([[length]])
    from gptq_tpu.models.common import rope_tables

    class _Spec:
        rope_theta = 10000.0

    _Spec.hd = hd
    cos, sin = rope_tables(_Spec, pos)

    want_y, want_ck, want_cv = _oracle(
        x, L, ck, cv, length, cos, sin,
        jnp.ones((hidden,)), jnp.ones((hidden,)), H, Hkv, hd, a8)

    got_y, got_ck, got_cv = decode_layer_fused(
        x, ck, cv, jnp.asarray(length), cos, sin,
        jnp.ones((hidden,)), jnp.ones((hidden,)),
        L["qkv"], L["o"], L["gu"], L["dn"],
        n_heads=H, n_kv_heads=Hkv, sm_scale=hd ** -0.5, a8=a8,
        interpret=True)

    tol = 0.08 if a8 else 0.03
    ref = np.asarray(want_y, np.float32)
    np.testing.assert_allclose(
        np.asarray(got_y, np.float32), ref, rtol=tol,
        atol=tol * float(np.abs(ref).max()))
    # the fresh row landed; untouched rows identical
    np.testing.assert_allclose(
        np.asarray(got_ck[0, length], np.float32),
        np.asarray(want_ck[0, length], np.float32), rtol=0.05, atol=0.05)
    np.testing.assert_array_equal(np.asarray(got_ck[0, :length]),
                                  np.asarray(ck[0, :length]))
    np.testing.assert_array_equal(np.asarray(got_cv[0, :length]),
                                  np.asarray(cv[0, :length]))


@pytest.mark.parametrize("a8", [False, True])
@pytest.mark.parametrize("gqa", [1, 2])
def test_layer_fused_matches_oracle(a8, gqa):
    _check_oracle(a8, gqa, S=32, length=5)


def test_layer_fused_multislab():
    """S=2048 -> Sb=512 -> 4 S-blocks: exercises the 3-slot slab rotation
    (slab b+2 prefetch must not land in the slot slab b is read from) and
    masking across block boundaries."""
    _check_oracle(a8=True, gqa=2, S=2048, length=1100)


@pytest.mark.parametrize("a8", [False, True])
def test_model_decode_layer_fusion(a8, monkeypatch):
    """End-to-end: model decode through the single-launch layer kernel
    must track the unfused route token-for-token."""
    from gptq_tpu.config import QuantConfig
    from gptq_tpu.models.common import (ArchSpec, KVCache, fuse_serving,
                                        init_params, model_forward,
                                        _layer_fusion_ok)
    from gptq_tpu.pipeline import pack_model, quantize_model

    spec = ArchSpec(arch="llama", n_layers=2, hidden=512, n_heads=4,
                    n_kv_heads=2, ffn=512, vocab=96, max_pos=32,
                    act="silu", pos="rope", norm_type="rmsnorm",
                    linear_bias=False, tie_embeddings=False)
    params = init_params(spec, jax.random.PRNGKey(30))
    calib = jnp.asarray(
        np.random.default_rng(30).integers(0, 96, size=(2, 16)))
    cfg = QuantConfig(wbits=4, nsamples=2)
    res = quantize_model(spec, params, calib, cfg, log=lambda s: None)
    pack_model(spec, params, res.quantizers, cfg)
    served = fuse_serving(spec, params, a8=a8)
    monkeypatch.setenv("GPTQ_TPU_LAYER_FUSION", "interpret")
    assert _layer_fusion_ok(
        spec, served["layers"][0], None, None, 1, 1,
        (jnp.zeros((1, 8, 2, 128), jnp.bfloat16),) * 2,
        jnp.asarray(0)) is a8

    def decode(mode):
        monkeypatch.setenv("GPTQ_TPU_LAYER_FUSION", mode)
        cache = KVCache.init(spec, 1, 8, jnp.float32)
        toks, logits_all = [], []
        tok = jnp.asarray([[7]])
        for _ in range(4):
            logits, cache = model_forward(spec, served, tok, cache)
            tok = jnp.argmax(logits[:, -1], axis=-1)[:, None]
            toks.append(int(tok[0, 0]))
            logits_all.append(np.asarray(logits[:, -1], np.float32))
        return toks, np.stack(logits_all)

    toks_off, l_off = decode("off")
    toks_on, l_on = decode("interpret")
    assert toks_on == toks_off
    rel = np.abs(l_on - l_off).max() / np.abs(l_off).max()
    assert rel < (0.05 if a8 else 0.02), rel


def test_layer_fusable_gates():
    hidden, H, Hkv, ffn = 256, 4, 4, 512
    hd = hidden // H
    L = make_layer(jax.random.PRNGKey(0), hidden, H, Hkv, ffn)
    ok = _Splits(((hidden, hidden), (hidden, hidden), (hidden, hidden)))
    assert layer_fusable(L["qkv"], ok, L["o"], L["gu"], L["dn"],
                         hidden, H, Hkv)
    # padded stored widths in the qkv parts break lane slicing
    bad = _Splits(((hidden + 128, hidden), (hidden, hidden),
                   (hidden, hidden)))
    assert not layer_fusable(L["qkv"], bad, L["o"], L["gu"], L["dn"],
                             hidden, H, Hkv)
