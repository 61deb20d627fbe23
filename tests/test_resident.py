"""Resident-s4 serving mode (ops/qmatmul.StagedWeight,
models.common.stage_serving): weights unpacked once at load into
XLA-native signed s4 codes, every matmul a plain dot. Must match the
packed-kernel route exactly (same codes, same grid algebra)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gptq_tpu.ops.qmatmul import (StagedWeight, dequant_matmul,
                                  resident_matmul, stage_weight)
from tests.test_ops import make_packed


@pytest.mark.parametrize("bits,groupsize", [(4, -1), (4, 128), (8, -1),
                                            (3, -1), (2, 64)])
def test_stage_weight_matches_xla_oracle(bits, groupsize):
    pw, _ = make_packed(bits=bits, K=512, N=256, groupsize=groupsize)
    sw = stage_weight(pw)
    assert isinstance(sw, StagedWeight)
    assert sw.codes.dtype == (jnp.int4 if bits <= 4 else jnp.int8)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(3, 512)).astype(np.float32))
    got = np.asarray(resident_matmul(x, sw))
    want = np.asarray(dequant_matmul(x, pw, impl="xla"))
    # activations round to bf16 (the serving dtype) vs the f32 oracle:
    # bound the RMS error like test_staged_native_bf16_and_padding
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 5e-3, rel
    # int8 activations: the integer dot is exact, epilogue order only
    got8 = resident_matmul(x, sw, a8=True)
    want8 = dequant_matmul(x, pw, impl="xla", a8=True)
    np.testing.assert_allclose(np.asarray(got8), np.asarray(want8),
                               rtol=5e-3, atol=5e-3)


def test_stage_weight_keeps_perm_and_bias():
    import dataclasses

    pw, _ = make_packed(bits=4, K=256, N=128)
    perm = jnp.asarray(np.random.default_rng(1).permutation(256))
    bias = jnp.asarray(np.random.default_rng(2).normal(size=(128,)),
                       jnp.float32)
    pw = dataclasses.replace(pw, perm=perm, bias=bias)
    sw = stage_weight(pw)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(2, 256)),
                    jnp.float32)
    got = np.asarray(resident_matmul(x, sw))
    want = np.asarray(dequant_matmul(x, pw, impl="xla"))
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 5e-3, rel


def test_model_decode_resident_matches_packed():
    """End-to-end decode through stage_serving == the packed route
    (teacher-forced tokens; GPTQ_TPU_FFN_FUSION=off so both run the
    same XLA attention glue on CPU)."""
    from gptq_tpu.config import QuantConfig
    from gptq_tpu.models.common import (ArchSpec, KVCache, fuse_serving,
                                        init_params, model_forward,
                                        stage_serving)
    from gptq_tpu.pipeline import pack_model, quantize_model

    spec = ArchSpec(arch="llama", n_layers=2, hidden=512, n_heads=4,
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
    resident = stage_serving(spec, served)

    def decode(p):
        cache = KVCache.init(spec, 1, 8, jnp.float32)
        logits_all = []
        for t in (5, 9, 3, 7):
            logits, cache = model_forward(spec, p, jnp.asarray([[t]]),
                                          cache)
            logits_all.append(np.asarray(logits[:, -1], np.float32))
        return np.stack(logits_all)

    l_packed = decode(served)
    l_res = decode(resident)
    np.testing.assert_allclose(l_res, l_packed, rtol=2e-2,
                               atol=2e-2 * np.abs(l_packed).max())
