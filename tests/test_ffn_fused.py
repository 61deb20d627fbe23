"""Whole-FFN fused kernel (interpret mode): must reproduce the unfused
gateup+act+down w4a8 path."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gptq_tpu.ops.ffn import ffn_fusable, ffn_fused
from gptq_tpu.ops.kernel_bench import make_random_packed
from gptq_tpu.ops.pack import fuse_packed
from gptq_tpu.ops.qmatmul import dequant_matmul


def make_gateup_down(key, hidden=256, ffn=512, bits=4):
    ks = jax.random.split(key, 3)
    gate = make_random_packed(ks[0], hidden, ffn, bits, -1)
    up = make_random_packed(ks[1], hidden, ffn, bits, -1)
    down = make_random_packed(ks[2], ffn, hidden, bits, -1)
    gu = fuse_packed([gate, up])
    return gate, up, down, gu


@pytest.mark.parametrize("bits", [4, 8])
def test_ffn_fused_matches_unfused(bits):
    key = jax.random.PRNGKey(0)
    gate, up, down, gu = make_gateup_down(key, bits=bits)
    assert ffn_fusable(gu, down)
    m = jax.random.normal(jax.random.fold_in(key, 9), (1, 2, 256),
                          jnp.bfloat16)

    # unfused w4a8 reference (same quantize-per-row semantics)
    g = dequant_matmul(m, gate, impl="xla", a8=True)
    u = dequant_matmul(m, up, impl="xla", a8=True)
    inner = (jax.nn.silu(g.astype(jnp.float32)) * u.astype(jnp.float32)
             ).astype(jnp.bfloat16)
    want = dequant_matmul(inner, down, impl="xla", a8=True)

    got = ffn_fused(m, gu, down, act="silu", interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=0.08, atol=0.08 * float(jnp.abs(want).max()))


def test_ffn_fusable_gates():
    key = jax.random.PRNGKey(1)
    gate, up, down, gu = make_gateup_down(key)
    assert ffn_fusable(gu, down)
    # grouped grids supported when groups tile K in >=128 lane slices
    g128 = make_random_packed(key, 256, 512, 4, 128)
    d128 = make_random_packed(jax.random.fold_in(key, 2), 512, 256, 4, 128)
    assert ffn_fusable(fuse_packed([g128, g128]), d128)
    # ...but not sub-128 groups
    g64 = make_random_packed(key, 256, 512, 4, 64)
    assert not ffn_fusable(fuse_packed([g64, g64]), down)
    # multi-field (3-bit) IS supported: one DMA pipeline per field
    b3 = make_random_packed(key, 256, 512, 3, -1)
    d3 = make_random_packed(jax.random.fold_in(key, 1), 512, 256, 3, -1)
    assert ffn_fusable(fuse_packed([b3, b3]), d3)


@pytest.mark.parametrize("groupsize", [128])
def test_ffn_fused_grouped(groupsize):
    """Grouped grids (the standard 4-bit g128 quality config) through the
    fused kernel."""
    key = jax.random.PRNGKey(13)
    ks = jax.random.split(key, 3)
    gate = make_random_packed(ks[0], 256, 512, 4, groupsize)
    up = make_random_packed(ks[1], 256, 512, 4, groupsize)
    down = make_random_packed(ks[2], 512, 256, 4, groupsize)
    gu = fuse_packed([gate, up])
    assert ffn_fusable(gu, down)
    m = jax.random.normal(jax.random.fold_in(key, 9), (1, 2, 256),
                          jnp.bfloat16)
    g = dequant_matmul(m, gate, impl="xla", a8=True)
    u = dequant_matmul(m, up, impl="xla", a8=True)
    inner = (jax.nn.silu(g.astype(jnp.float32)) * u.astype(jnp.float32)
             ).astype(jnp.bfloat16)
    want = dequant_matmul(inner, down, impl="xla", a8=True)
    got = ffn_fused(m, gu, down, act="silu", interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=0.08, atol=0.08 * float(jnp.abs(want).max()))


@pytest.mark.parametrize("bits", [3])
def test_ffn_fused_multifield(bits):
    """3-bit (2+1 field split) through the fused kernel."""
    key = jax.random.PRNGKey(11)
    gate, up, down, gu = make_gateup_down(key, bits=bits)
    m = jax.random.normal(jax.random.fold_in(key, 9), (1, 2, 256),
                          jnp.bfloat16)
    g = dequant_matmul(m, gate, impl="xla", a8=True)
    u = dequant_matmul(m, up, impl="xla", a8=True)
    inner = (jax.nn.silu(g.astype(jnp.float32)) * u.astype(jnp.float32)
             ).astype(jnp.bfloat16)
    want = dequant_matmul(inner, down, impl="xla", a8=True)
    got = ffn_fused(m, gu, down, act="silu", interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=0.08, atol=0.08 * float(jnp.abs(want).max()))


def test_model_decode_with_ffn_fusion(monkeypatch):
    """End-to-end decode: fused-FFN route must match the unfused route."""
    from gptq_tpu.config import QuantConfig
    from gptq_tpu.models.common import (ArchSpec, KVCache, fuse_serving,
                                        init_params, model_forward)
    from gptq_tpu.pipeline import pack_model, quantize_model

    spec = ArchSpec(arch="llama", n_layers=1, hidden=512, n_heads=4,
                    n_kv_heads=4, ffn=512, vocab=96, max_pos=32,
                    act="silu", pos="rope", norm_type="rmsnorm",
                    linear_bias=False, tie_embeddings=False)
    params = init_params(spec, jax.random.PRNGKey(2))
    calib = jnp.asarray(
        np.random.default_rng(2).integers(0, 96, size=(2, 16)))
    cfg = QuantConfig(wbits=4, nsamples=2)
    res = quantize_model(spec, params, calib, cfg, log=lambda s: None)
    pack_model(spec, params, res.quantizers, cfg)
    served = fuse_serving(spec, params, a8=True)

    def decode(mode):
        # teacher-forced token sequence: greedy trajectories can diverge
        # after one near-tie argmax flip on a random tiny model
        monkeypatch.setenv("GPTQ_TPU_FFN_FUSION", mode)
        cache = KVCache.init(spec, 1, 8, jnp.float32)
        logits_all = []
        for t in (5, 9, 3, 7):
            logits, cache = model_forward(spec, served,
                                          jnp.asarray([[t]]), cache)
            logits_all.append(np.asarray(logits[:, -1], np.float32))
        return np.stack(logits_all)

    l_off = decode("off")
    l_fused = decode("interpret")
    # a8 int8-rounding differs slightly between the in-kernel and XLA
    # quantize orderings; teacher-forced logits agree to a8 noise
    rel = np.abs(l_fused - l_off).max() / np.abs(l_off).max()
    assert rel < 0.08, rel


def test_attn_mlp_fused_matches_unfused():
    """Full post-attention half (o + residual + norm + FFN + residual) in
    one kernel must match the composed unfused path."""
    from gptq_tpu.ops.ffn import attn_mlp_fusable, attn_mlp_fused

    key = jax.random.PRNGKey(3)
    ks = jax.random.split(key, 4)
    H = 256
    o = make_random_packed(ks[3], H, H, 4, -1)
    gate = make_random_packed(ks[0], H, 512, 4, -1)
    up = make_random_packed(ks[1], H, 512, 4, -1)
    down = make_random_packed(ks[2], 512, H, 4, -1)
    gu = fuse_packed([gate, up])
    assert attn_mlp_fusable(o, gu, down)

    attn = jax.random.normal(jax.random.fold_in(key, 7), (1, 1, H),
                             jnp.bfloat16)
    xres = jax.random.normal(jax.random.fold_in(key, 8), (1, 1, H),
                             jnp.bfloat16)
    w2 = jnp.abs(jax.random.normal(jax.random.fold_in(key, 9), (H,))) + 0.5

    # unfused reference
    r2 = (xres.astype(jnp.float32)
          + dequant_matmul(attn, o, impl="xla", a8=True).astype(jnp.float32)
          ).astype(jnp.bfloat16).astype(jnp.float32)
    var = jnp.mean(r2 * r2, axis=-1, keepdims=True)
    m = ((r2 * jax.lax.rsqrt(var + 1e-5)) * w2[None, None, :]
         ).astype(jnp.bfloat16)
    g = dequant_matmul(m, gate, impl="xla", a8=True)
    u = dequant_matmul(m, up, impl="xla", a8=True)
    inner = (jax.nn.silu(g.astype(jnp.float32)) * u.astype(jnp.float32)
             ).astype(jnp.bfloat16)
    want = r2 + dequant_matmul(inner, down, impl="xla",
                               a8=True).astype(jnp.float32)

    got = attn_mlp_fused(attn, xres, w2, o, gu, down, act="silu",
                         norm="rmsnorm", eps=1e-5, interpret=True)
    denom = float(jnp.abs(want).max())
    rel = float(jnp.abs(got.astype(jnp.float32) - want).max()) / denom
    assert rel < 0.08, rel


def test_model_decode_with_attn_mlp_fusion(monkeypatch):
    """End-to-end: the mega-fused route must match the unfused route at
    serving scale (o/gateup/down all packed, a8)."""
    from gptq_tpu.config import QuantConfig
    from gptq_tpu.models.common import (ArchSpec, KVCache, fuse_serving,
                                        init_params, model_forward,
                                        _attn_mlp_ok)
    from gptq_tpu.pipeline import pack_model, quantize_model

    spec = ArchSpec(arch="llama", n_layers=1, hidden=512, n_heads=4,
                    n_kv_heads=4, ffn=512, vocab=96, max_pos=32,
                    act="silu", pos="rope", norm_type="rmsnorm",
                    linear_bias=False, tie_embeddings=False)
    params = init_params(spec, jax.random.PRNGKey(4))
    calib = jnp.asarray(
        np.random.default_rng(4).integers(0, 96, size=(2, 16)))
    cfg = QuantConfig(wbits=4, nsamples=2)
    res = quantize_model(spec, params, calib, cfg, log=lambda s: None)
    pack_model(spec, params, res.quantizers, cfg)
    served = fuse_serving(spec, params, a8=True)
    monkeypatch.setenv("GPTQ_TPU_FFN_FUSION", "interpret")
    assert _attn_mlp_ok(spec, served["layers"][0], None, None, 1)

    def decode(mode):
        monkeypatch.setenv("GPTQ_TPU_FFN_FUSION", mode)
        cache = KVCache.init(spec, 1, 8, jnp.float32)
        toks = []
        tok = jnp.asarray([[5]])
        for _ in range(4):
            logits, cache = model_forward(spec, served, tok, cache)
            tok = jnp.argmax(logits[:, -1], axis=-1)[:, None]
            toks.append(int(tok[0, 0]))
        return toks

    assert decode("interpret") == decode("off")


def test_norm_qkv_fused_matches_unfused():
    from gptq_tpu.ops.ffn import norm_qkv_fusable, norm_qkv_fused

    key = jax.random.PRNGKey(5)
    pw = make_random_packed(key, 256, 768, 4, -1)
    assert norm_qkv_fusable(pw)
    x = jax.random.normal(jax.random.fold_in(key, 1), (1, 2, 256),
                          jnp.bfloat16)
    w1 = jnp.abs(jax.random.normal(jax.random.fold_in(key, 2), (256,))) + 0.5

    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    h = ((xf * jax.lax.rsqrt(var + 1e-5)) * w1[None, None, :]
         ).astype(jnp.bfloat16)
    want = dequant_matmul(h, pw, impl="xla", a8=True).astype(jnp.float32)

    got = norm_qkv_fused(x, w1, pw, norm="rmsnorm", eps=1e-5,
                         interpret=True).astype(jnp.float32)
    denom = float(jnp.abs(want).max())
    rel = float(jnp.abs(got - want).max()) / denom
    assert rel < 0.08, rel


def test_model_decode_all_fusions(monkeypatch):
    """ln1+qkv, o+norm+FFN fusions together: decode tokens must match the
    fully-unfused route."""
    from gptq_tpu.config import QuantConfig
    from gptq_tpu.models.common import (ArchSpec, KVCache, fuse_serving,
                                        init_params, model_forward,
                                        _norm_qkv_ok)
    from gptq_tpu.pipeline import pack_model, quantize_model

    spec = ArchSpec(arch="llama", n_layers=1, hidden=512, n_heads=4,
                    n_kv_heads=2, ffn=512, vocab=96, max_pos=32,
                    act="silu", pos="rope", norm_type="rmsnorm",
                    linear_bias=False, tie_embeddings=False)
    params = init_params(spec, jax.random.PRNGKey(6))
    calib = jnp.asarray(
        np.random.default_rng(6).integers(0, 96, size=(2, 16)))
    cfg = QuantConfig(wbits=4, nsamples=2)
    res = quantize_model(spec, params, calib, cfg, log=lambda s: None)
    pack_model(spec, params, res.quantizers, cfg)
    served = fuse_serving(spec, params, a8=True)
    monkeypatch.setenv("GPTQ_TPU_FFN_FUSION", "interpret")
    assert _norm_qkv_ok(spec, served["layers"][0], None, None, 1)

    def decode(mode):
        monkeypatch.setenv("GPTQ_TPU_FFN_FUSION", mode)
        cache = KVCache.init(spec, 1, 8, jnp.float32)
        toks = []
        tok = jnp.asarray([[5]])
        for _ in range(4):
            logits, cache = model_forward(spec, served, tok, cache)
            tok = jnp.argmax(logits[:, -1], axis=-1)[:, None]
            toks.append(int(tok[0, 0]))
        return toks

    assert decode("interpret") == decode("off")


def test_model_decode_fusions_gemma(monkeypatch):
    """Gemma flavor: rmsnorm1p + gelu_tanh through both fused kernels."""
    from gptq_tpu.config import QuantConfig
    from gptq_tpu.models.common import (ArchSpec, KVCache, fuse_serving,
                                        init_params, model_forward,
                                        _attn_mlp_ok, _norm_qkv_ok)
    from gptq_tpu.pipeline import pack_model, quantize_model

    spec = ArchSpec(arch="gemma", n_layers=1, hidden=512, n_heads=4,
                    n_kv_heads=4, ffn=512, vocab=96, max_pos=32,
                    act="gelu_tanh", pos="rope", norm_type="rmsnorm1p",
                    embed_scale=512 ** 0.5, linear_bias=False,
                    tie_embeddings=False)
    params = init_params(spec, jax.random.PRNGKey(8))
    calib = jnp.asarray(
        np.random.default_rng(8).integers(0, 96, size=(2, 16)))
    cfg = QuantConfig(wbits=4, nsamples=2)
    res = quantize_model(spec, params, calib, cfg, log=lambda s: None)
    pack_model(spec, params, res.quantizers, cfg)
    served = fuse_serving(spec, params, a8=True)
    monkeypatch.setenv("GPTQ_TPU_FFN_FUSION", "interpret")
    assert _norm_qkv_ok(spec, served["layers"][0], None, None, 1)
    assert _attn_mlp_ok(spec, served["layers"][0], None, None, 1)

    def decode(mode):
        monkeypatch.setenv("GPTQ_TPU_FFN_FUSION", mode)
        cache = KVCache.init(spec, 1, 8, jnp.float32)
        logits_all = []
        for t in (5, 9, 3):
            logits, cache = model_forward(spec, served,
                                          jnp.asarray([[t]]), cache)
            logits_all.append(np.asarray(logits[:, -1], np.float32))
        return np.stack(logits_all)

    l_off = decode("off")
    l_on = decode("interpret")
    rel = np.abs(l_on - l_off).max() / np.abs(l_off).max()
    assert rel < 0.08, rel


def test_model_decode_fusions_opt(monkeypatch):
    """OPT flavor: layernorm (+bias), biased qkv/o/fc1/fc2, non-GLU MLP
    through both fused kernels."""
    from gptq_tpu.config import QuantConfig
    from gptq_tpu.models.common import (ArchSpec, KVCache, fuse_serving,
                                        init_params, model_forward,
                                        _attn_mlp_ok, _norm_qkv_ok)
    from gptq_tpu.pipeline import pack_model, quantize_model

    spec = ArchSpec(arch="opt", n_layers=1, hidden=512, n_heads=4,
                    n_kv_heads=4, ffn=512, vocab=96, max_pos=32,
                    act="relu", pos="learned", norm_type="layernorm",
                    linear_bias=True, tie_embeddings=False)
    params = init_params(spec, jax.random.PRNGKey(12))
    calib = jnp.asarray(
        np.random.default_rng(12).integers(0, 96, size=(2, 16)))
    cfg = QuantConfig(wbits=4, nsamples=2)
    res = quantize_model(spec, params, calib, cfg, log=lambda s: None)
    pack_model(spec, params, res.quantizers, cfg)
    served = fuse_serving(spec, params, a8=True)
    monkeypatch.setenv("GPTQ_TPU_FFN_FUSION", "interpret")
    assert _norm_qkv_ok(spec, served["layers"][0], None, None, 1)
    assert _attn_mlp_ok(spec, served["layers"][0], None, None, 1)

    def decode(mode):
        monkeypatch.setenv("GPTQ_TPU_FFN_FUSION", mode)
        cache = KVCache.init(spec, 1, 8, jnp.float32)
        logits_all = []
        for t in (5, 9, 3):
            logits, cache = model_forward(spec, served,
                                          jnp.asarray([[t]]), cache)
            logits_all.append(np.asarray(logits[:, -1], np.float32))
        return np.stack(logits_all)

    l_off = decode("off")
    l_on = decode("interpret")
    rel = np.abs(l_on - l_off).max() / np.abs(l_off).max()
    assert rel < 0.08, rel


def test_model_decode_fusions_bloom(monkeypatch):
    """BLOOM flavor: natively-fused q/k/v linear + layernorm + biases +
    alibi attention with the fused kernels."""
    from gptq_tpu.config import QuantConfig
    from gptq_tpu.models.common import (ArchSpec, KVCache, fuse_serving,
                                        init_params, model_forward,
                                        _attn_mlp_ok, _norm_qkv_ok)
    from gptq_tpu.pipeline import pack_model, quantize_model

    spec = ArchSpec(arch="bloom", n_layers=1, hidden=512, n_heads=4,
                    n_kv_heads=4, ffn=512, vocab=96, max_pos=32,
                    act="gelu_tanh", pos="alibi", norm_type="layernorm",
                    linear_bias=True, tie_embeddings=True)
    params = init_params(spec, jax.random.PRNGKey(14))
    calib = jnp.asarray(
        np.random.default_rng(14).integers(0, 96, size=(2, 16)))
    cfg = QuantConfig(wbits=4, nsamples=2)
    res = quantize_model(spec, params, calib, cfg, log=lambda s: None)
    pack_model(spec, params, res.quantizers, cfg)
    served = fuse_serving(spec, params, a8=True)
    monkeypatch.setenv("GPTQ_TPU_FFN_FUSION", "interpret")
    assert _norm_qkv_ok(spec, served["layers"][0], None, None, 1)
    assert _attn_mlp_ok(spec, served["layers"][0], None, None, 1)

    def decode(mode):
        monkeypatch.setenv("GPTQ_TPU_FFN_FUSION", mode)
        cache = KVCache.init(spec, 1, 8, jnp.float32)
        logits_all = []
        for t in (5, 9, 3):
            logits, cache = model_forward(spec, served,
                                          jnp.asarray([[t]]), cache)
            logits_all.append(np.asarray(logits[:, -1], np.float32))
        return np.stack(logits_all)

    l_off = decode("off")
    l_on = decode("interpret")
    rel = np.abs(l_on - l_off).max() / np.abs(l_off).max()
    assert rel < 0.08, rel


def test_head_fusion_matches_unfused(monkeypatch):
    """final_ln + packed lm_head as one launch (w8 head with dynamic int8
    activations) must track the unfused w8a16 head to a8 noise."""
    from gptq_tpu.models.common import (ArchSpec, KVCache, init_params,
                                        model_forward, _head_fusion_ok)
    from gptq_tpu.pipeline import quantize_lm_head

    spec = ArchSpec(arch="llama", n_layers=1, hidden=512, n_heads=4,
                    n_kv_heads=4, ffn=512, vocab=512, max_pos=32,
                    act="silu", pos="rope", norm_type="rmsnorm",
                    linear_bias=False, tie_embeddings=False)
    from gptq_tpu.models.common import fuse_serving

    params = init_params(spec, jax.random.PRNGKey(15))
    assert quantize_lm_head(spec, params, bits=8)
    monkeypatch.setenv("GPTQ_TPU_FFN_FUSION", "interpret")
    # w8a16 head (no --faster-kernel): fuses in EXACT a16 mode
    assert _head_fusion_ok(spec, params, None, 1) is False
    params = fuse_serving(spec, params, a8=True)
    # --faster-kernel: the fused head runs dynamic int8 activations
    assert _head_fusion_ok(spec, params, None, 1) is True

    def logits_of(mode):
        monkeypatch.setenv("GPTQ_TPU_FFN_FUSION", mode)
        cache = KVCache.init(spec, 1, 8, jnp.float32)
        l, _ = model_forward(spec, params, jnp.asarray([[7]]), cache)
        return np.asarray(l[:, -1], np.float32)

    l_off = logits_of("off")
    l_on = logits_of("interpret")
    rel = np.abs(l_on - l_off).max() / np.abs(l_off).max()
    assert rel < 0.05, rel


def test_ffn_fused_bcq():
    """BCQ/LUT bitplane weights (the reference's flagship serving format)
    through the fused kernel: sign-select identity, per-plane DMA."""
    from gptq_tpu.ops.kernel_bench import make_random_bcq
    from gptq_tpu.ops.bcq_matmul import bcq_matmul

    key = jax.random.PRNGKey(17)
    ks = jax.random.split(key, 3)
    gate = make_random_bcq(ks[0], 256, 512, 3, -1)
    up = make_random_bcq(ks[1], 256, 512, 3, -1)
    down = make_random_bcq(ks[2], 512, 256, 3, -1)
    gu = fuse_packed([gate, up])
    assert ffn_fusable(gu, down)
    m = jax.random.normal(jax.random.fold_in(key, 9), (1, 2, 256),
                          jnp.bfloat16)
    g = bcq_matmul(m, gate, impl="xla", a8=True)
    u = bcq_matmul(m, up, impl="xla", a8=True)
    inner = (jax.nn.silu(g.astype(jnp.float32)) * u.astype(jnp.float32)
             ).astype(jnp.bfloat16)
    want = bcq_matmul(inner, down, impl="xla", a8=True)
    got = ffn_fused(m, gu, down, act="silu", interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=0.08, atol=0.08 * float(jnp.abs(want).max()))


def test_model_decode_fusions_bcq_lut(monkeypatch):
    """End-to-end LUT-mode serving (--lut_eval counterpart) through the
    fused kernels."""
    from gptq_tpu.config import QuantConfig
    from gptq_tpu.models.common import (ArchSpec, KVCache, fuse_serving,
                                        init_params, model_forward,
                                        _attn_mlp_ok)
    from gptq_tpu.pipeline import pack_model, quantize_model

    spec = ArchSpec(arch="llama", n_layers=1, hidden=512, n_heads=4,
                    n_kv_heads=4, ffn=512, vocab=96, max_pos=32,
                    act="silu", pos="rope", norm_type="rmsnorm",
                    linear_bias=False, tie_embeddings=False)
    params = init_params(spec, jax.random.PRNGKey(18))
    calib = jnp.asarray(
        np.random.default_rng(18).integers(0, 96, size=(2, 16)))
    cfg = QuantConfig(wbits=3, nsamples=2, lut_eval=True, bcq_round=2)
    res = quantize_model(spec, params, calib, cfg, log=lambda s: None)
    pack_model(spec, params, res.quantizers, cfg)
    served = fuse_serving(spec, params, a8=True)
    monkeypatch.setenv("GPTQ_TPU_FFN_FUSION", "interpret")
    # BCQ serving keeps the bitplane GRID kernel (chip-measured faster
    # than the streamed fusion: 104 vs 146 us — 3 sign planes = 3x MXU
    # ingest); the fused route stays available at kernel level only
    assert not _attn_mlp_ok(spec, served["layers"][0], None, None, 1)

    def decode(mode):
        monkeypatch.setenv("GPTQ_TPU_FFN_FUSION", mode)
        cache = KVCache.init(spec, 1, 8, jnp.float32)
        logits_all = []
        for t in (5, 9, 3):
            logits, cache = model_forward(spec, served,
                                          jnp.asarray([[t]]), cache)
            logits_all.append(np.asarray(logits[:, -1], np.float32))
        return np.stack(logits_all)

    l_off = decode("off")
    l_on = decode("interpret")
    rel = np.abs(l_on - l_off).max() / np.abs(l_off).max()
    assert rel < 1e-6, rel  # identical: both routes use the grid kernel


def test_ffn_fused_a16_matches_unfused():
    """bf16-activation (accuracy-mode) fused FFN must match the unfused
    w4a16 path tightly (no activation quantization anywhere)."""
    key = jax.random.PRNGKey(19)
    gate, up, down, gu = make_gateup_down(key)
    m = jax.random.normal(jax.random.fold_in(key, 9), (1, 2, 256),
                          jnp.bfloat16)
    g = dequant_matmul(m, gate, impl="xla")
    u = dequant_matmul(m, up, impl="xla")
    inner = (jax.nn.silu(g.astype(jnp.float32)) * u.astype(jnp.float32)
             ).astype(jnp.bfloat16)
    want = dequant_matmul(inner, down, impl="xla")
    got = ffn_fused(m, gu, down, act="silu", a8=False, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=0.02, atol=0.02 * float(jnp.abs(want).max()))


def test_model_decode_fusion_a16(monkeypatch):
    """The w4a16 accuracy config also serves through the fused kernels
    (fuse=True without a8): logits must track the unfused route closely."""
    from gptq_tpu.config import QuantConfig
    from gptq_tpu.models.common import (ArchSpec, KVCache, fuse_serving,
                                        init_params, model_forward,
                                        _attn_mlp_ok, _norm_qkv_ok)
    from gptq_tpu.pipeline import pack_model, quantize_model

    spec = ArchSpec(arch="llama", n_layers=1, hidden=512, n_heads=4,
                    n_kv_heads=4, ffn=512, vocab=96, max_pos=32,
                    act="silu", pos="rope", norm_type="rmsnorm",
                    linear_bias=False, tie_embeddings=False)
    params = init_params(spec, jax.random.PRNGKey(20))
    calib = jnp.asarray(
        np.random.default_rng(20).integers(0, 96, size=(2, 16)))
    cfg = QuantConfig(wbits=4, nsamples=2)
    res = quantize_model(spec, params, calib, cfg, log=lambda s: None)
    pack_model(spec, params, res.quantizers, cfg)
    served = fuse_serving(spec, params)  # a8=False: accuracy mode
    monkeypatch.setenv("GPTQ_TPU_FFN_FUSION", "interpret")
    assert _norm_qkv_ok(spec, served["layers"][0], None, None, 1) is False
    assert _attn_mlp_ok(spec, served["layers"][0], None, None, 1) is False

    def decode(mode):
        monkeypatch.setenv("GPTQ_TPU_FFN_FUSION", mode)
        cache = KVCache.init(spec, 1, 8, jnp.float32)
        logits_all = []
        for t in (5, 9, 3):
            logits, cache = model_forward(spec, served,
                                          jnp.asarray([[t]]), cache)
            logits_all.append(np.asarray(logits[:, -1], np.float32))
        return np.stack(logits_all)

    l_off = decode("off")
    l_on = decode("interpret")
    rel = np.abs(l_on - l_off).max() / np.abs(l_off).max()
    assert rel < 0.02, rel


def test_model_decode_fusion_a16_int8kv(monkeypatch):
    """a16 fused serving composed with the int8 KV cache + fused decode
    attention kernel (bench.py's w4a16+int8kv leg): logits must track the
    fully-unfused bf16-cache route."""
    from gptq_tpu.config import QuantConfig
    from gptq_tpu.models.common import (ArchSpec, KVCache, fuse_serving,
                                        init_params, model_forward)
    from gptq_tpu.pipeline import pack_model, quantize_model

    spec = ArchSpec(arch="llama", n_layers=1, hidden=512, n_heads=4,
                    n_kv_heads=4, ffn=512, vocab=96, max_pos=32,
                    act="silu", pos="rope", norm_type="rmsnorm",
                    linear_bias=False, tie_embeddings=False)
    params = init_params(spec, jax.random.PRNGKey(21))
    calib = jnp.asarray(
        np.random.default_rng(21).integers(0, 96, size=(2, 16)))
    cfg = QuantConfig(wbits=4, nsamples=2)
    res = quantize_model(spec, params, calib, cfg, log=lambda s: None)
    pack_model(spec, params, res.quantizers, cfg)
    served = fuse_serving(spec, params)  # a16 accuracy mode

    def decode(fusion, attn, cache_dtype):
        monkeypatch.setenv("GPTQ_TPU_FFN_FUSION", fusion)
        monkeypatch.setenv("GPTQ_TPU_ATTN_IMPL", attn)
        cache = KVCache.init(spec, 1, 8, cache_dtype)
        logits_all = []
        for t in (5, 9, 3):
            logits, cache = model_forward(spec, served,
                                          jnp.asarray([[t]]), cache)
            logits_all.append(np.asarray(logits[:, -1], np.float32))
        return np.stack(logits_all)

    l_ref = decode("off", "xla", jnp.float32)
    l_fused = decode("interpret", "interpret", jnp.int8)
    rel = np.abs(l_fused - l_ref).max() / np.abs(l_ref).max()
    assert rel < 0.05, rel
