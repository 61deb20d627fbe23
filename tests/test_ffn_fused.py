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
    # grouped grids not in the v1 envelope
    g128 = make_random_packed(key, 256, 512, 4, 128)
    assert not ffn_fusable(fuse_packed([g128, g128]), down)
    # 3-bit (two fields) not in the v1 envelope
    b3 = make_random_packed(key, 256, 512, 3, -1)
    assert not ffn_fusable(fuse_packed([b3, b3]), down)


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
        monkeypatch.setenv("GPTQ_TPU_FFN_FUSION", mode)
        cache = KVCache.init(spec, 1, 8, jnp.float32)
        toks = []
        tok = jnp.asarray([[5]])
        for _ in range(4):
            logits, cache = model_forward(spec, served, tok, cache)
            tok = jnp.argmax(logits[:, -1], axis=-1)[:, None]
            toks.append(int(tok[0, 0]))
        return toks

    toks_off = decode("off")
    toks_fused = decode("interpret")
    assert toks_fused == toks_off
