"""End-to-end quantization pipeline tests (SURVEY.md §7 step 3 on tiny
models): calibrate -> GPTQ -> eval, with packed serving equivalence."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import torch

from gptq_tpu.config import MixedPrecision, QuantConfig
from gptq_tpu.data import synthetic_stream
from gptq_tpu.eval.ppl import eval_ppl
from gptq_tpu.models.common import model_forward
from gptq_tpu.models.convert import params_from_hf_torch
from gptq_tpu.pipeline import pack_model, quantize_model

torch.manual_seed(0)
SEQLEN = 32
VOCAB = 99


def make_model(arch="opt"):
    if arch == "opt":
        from transformers import OPTConfig, OPTForCausalLM

        cfg = OPTConfig(vocab_size=VOCAB, hidden_size=32, num_hidden_layers=2,
                        ffn_dim=64, num_attention_heads=4,
                        max_position_embeddings=64)
        return OPTForCausalLM(cfg).eval()
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(vocab_size=VOCAB, hidden_size=32, intermediate_size=64,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=64,
                      tie_word_embeddings=False)
    return LlamaForCausalLM(cfg).eval()


def calib_and_test():
    stream = synthetic_stream(VOCAB, 4096, seed=0)
    calib = stream[: 8 * SEQLEN].reshape(8, SEQLEN)
    test = stream[-(4 * SEQLEN):]
    return jnp.asarray(calib), test[None]


@pytest.mark.parametrize("arch", ["opt", "llama"])
def test_quantize_pipeline_runs_and_eval(arch):
    model = make_model(arch)
    spec, params = params_from_hf_torch(model)
    calib, test = calib_and_test()

    ppl_fp = eval_ppl(spec, params, test, SEQLEN, log=lambda s: None)

    cfg = QuantConfig(wbits=8, dataset="wikitext2", nsamples=8)
    res = quantize_model(spec, params, calib, cfg, log=lambda s: None)
    assert len(res.quantizers) == 2 * (6 if arch == "opt" else 7)
    ppl_q = eval_ppl(spec, params, test, SEQLEN, log=lambda s: None)
    # 8-bit on a random-init tiny model must be nearly lossless
    assert ppl_q < ppl_fp * 1.02


def test_gptq_beats_rtn_e2e():
    model = make_model("opt")
    spec, params_fp = params_from_hf_torch(model)
    calib, test = calib_and_test()

    import copy

    params_gptq = jax.tree.map(lambda x: x, params_fp)
    params_rtn = jax.tree.map(lambda x: x, params_fp)
    # deep-copy the nested dicts so weight writes don't alias
    import jax.tree_util as jtu

    def clone(p):
        return jtu.tree_map(jnp.array, p)

    params_gptq = clone(params_fp)
    params_rtn = clone(params_fp)

    cfg = QuantConfig(wbits=3, nsamples=8)
    quantize_model(spec, params_gptq, calib, cfg, log=lambda s: None)
    quantize_model(spec, params_rtn, calib, cfg.replace(nearest=True), log=lambda s: None)

    ppl_gptq = eval_ppl(spec, params_gptq, test, SEQLEN, log=lambda s: None)
    ppl_rtn = eval_ppl(spec, params_rtn, test, SEQLEN, log=lambda s: None)
    assert ppl_gptq <= ppl_rtn * 1.01, (ppl_gptq, ppl_rtn)


def test_true_sequential_and_groups():
    model = make_model("llama")
    spec, params = params_from_hf_torch(model)
    calib, test = calib_and_test()
    cfg = QuantConfig(wbits=4, groupsize=16, true_sequential=True, nsamples=8)
    res = quantize_model(spec, params, calib, cfg, log=lambda s: None)
    assert len(res.quantizers) == 14
    ppl = eval_ppl(spec, params, test, SEQLEN, log=lambda s: None)
    assert np.isfinite(ppl)


def test_mixed_precision_layer_bits():
    model = make_model("opt")
    spec, params = params_from_hf_torch(model)
    calib, _ = calib_and_test()
    cfg = QuantConfig(wbits=3, nsamples=8, layermix=True)
    mixed = MixedPrecision(layer_bits=[3, 4])
    res = quantize_model(spec, params, calib, cfg, mixed=mixed, log=lambda s: None)
    assert res.quantizers["model.decoder.layers.0.fc1"]["bits"] == 3
    assert res.quantizers["model.decoder.layers.1.fc1"]["bits"] == 4


def test_packed_serving_matches_fake_quant():
    """pack_model must not change the model function (beyond packing noise)."""
    model = make_model("opt")
    spec, params = params_from_hf_torch(model)
    calib, test = calib_and_test()
    cfg = QuantConfig(wbits=4, nsamples=8)
    res = quantize_model(spec, params, calib, cfg, log=lambda s: None)

    ids = jnp.asarray(test[:, :SEQLEN])
    logits_fake, _ = model_forward(spec, params, ids)

    pack_model(spec, params, res.quantizers, cfg)
    from gptq_tpu.ops.pack import PackedWeight

    assert isinstance(params["layers"][0]["q"]["w"], PackedWeight)
    logits_packed, _ = model_forward(spec, params, ids)
    np.testing.assert_allclose(
        np.asarray(logits_packed), np.asarray(logits_fake), rtol=5e-3, atol=5e-3
    )

    # serving fusion (q/k/v merged into one launch) must be a no-op on the
    # model function
    from gptq_tpu.models.common import fuse_serving

    fused = fuse_serving(spec, params)
    assert "qkv_fused" in fused["layers"][0]
    assert "q" not in fused["layers"][0]
    logits_fused, _ = model_forward(spec, fused, ids)
    np.testing.assert_allclose(
        np.asarray(logits_fused), np.asarray(logits_packed), rtol=2e-5,
        atol=2e-5
    )


def test_fused_serving_llama_matches():
    """llama-family fusion (qkv + gate/up merged) is a no-op on outputs."""
    model = make_model("llama")
    spec, params = params_from_hf_torch(model)
    calib, test = calib_and_test()
    cfg = QuantConfig(wbits=4, nsamples=8)
    res = quantize_model(spec, params, calib, cfg, log=lambda s: None)
    pack_model(spec, params, res.quantizers, cfg)

    from gptq_tpu.models.common import fuse_serving

    ids = jnp.asarray(test[:, :SEQLEN])
    logits_packed, _ = model_forward(spec, params, ids)
    fused = fuse_serving(spec, params)
    assert "qkv_fused" in fused["layers"][0]
    assert "gateup_fused" in fused["layers"][0]
    # under jit too (split extents must stay static)
    logits_fused, _ = jax.jit(
        lambda p, i: model_forward(spec, p, i))(fused, ids)
    np.testing.assert_allclose(
        np.asarray(logits_fused), np.asarray(logits_packed), rtol=2e-5,
        atol=2e-5
    )


def test_quant_lm_head_8bit_near_lossless():
    from gptq_tpu.ops.pack import PackedWeight
    from gptq_tpu.pipeline import quantize_lm_head

    model = make_model("llama")
    spec, params = params_from_hf_torch(model)
    calib, test = calib_and_test()
    ids = jnp.asarray(test[:, :SEQLEN])
    logits_dense, _ = model_forward(spec, params, ids)

    assert quantize_lm_head(spec, params, bits=8)
    assert isinstance(params["lm_head"]["w"], PackedWeight)
    logits_q, _ = model_forward(spec, params, ids)
    denom = float(jnp.abs(logits_dense).max())
    rel = float(jnp.abs(logits_q - logits_dense).max()) / denom
    assert rel < 0.01, rel
    # idempotent / tied-embedding no-op
    assert not quantize_lm_head(spec, params, bits=8)


def test_a8_serving_close_to_a16():
    """--faster-kernel (dynamic int8 activations) must jit and stay close
    to the full-precision-activation packed model."""
    model = make_model("llama")
    spec, params = params_from_hf_torch(model)
    calib, test = calib_and_test()
    cfg = QuantConfig(wbits=4, nsamples=8)
    res = quantize_model(spec, params, calib, cfg, log=lambda s: None)
    pack_model(spec, params, res.quantizers, cfg)

    from gptq_tpu.models.common import fuse_serving

    ids = jnp.asarray(test[:, :SEQLEN])
    logits_a16, _ = model_forward(spec, params, ids)
    fast = fuse_serving(spec, params, a8=True)
    logits_a8, _ = jax.jit(lambda p, i: model_forward(spec, p, i))(fast, ids)
    # activation quantization error is small relative to logit scale
    denom = float(jnp.abs(logits_a16).max())
    rel = float(jnp.abs(logits_a8 - logits_a16).max()) / denom
    assert rel < 0.05, rel


def test_bcq_rtn_whole_model():
    model = make_model("opt")
    spec, params = params_from_hf_torch(model)
    calib, test = calib_and_test()
    cfg = QuantConfig(wbits=3, bcq=True, bcq_round=3, nsamples=8)
    res = quantize_model(spec, params, calib, cfg, log=lambda s: None)
    assert all(q["mode"] == "bcq_rtn" for q in res.quantizers.values())
    assert np.isfinite(eval_ppl(spec, params, test, SEQLEN, log=lambda s: None))


def test_fuse_serving_preserves_act_q():
    """Serving fusion must carry activation quantizers onto the fused
    entry (an act-quantized model previously served WITHOUT activation
    quantization after the default fuse)."""
    from gptq_tpu.models.common import fuse_serving
    from gptq_tpu.pipeline import add_actquant

    model = make_model("llama")
    spec, params = params_from_hf_torch(model)
    calib, test = calib_and_test()
    cfg = QuantConfig(wbits=4, nsamples=8)
    res = quantize_model(spec, params, calib, cfg, log=lambda s: None)
    add_actquant(spec, params, calib, bits=8)
    pack_model(spec, params, res.quantizers, cfg)

    ids = jnp.asarray(test[:, :SEQLEN])
    logits_unfused, _ = model_forward(spec, params, ids)
    fused = fuse_serving(spec, params)
    assert fused["layers"][0]["qkv_fused"]["act_q"] is not None
    logits_fused, _ = model_forward(spec, fused, ids)
    np.testing.assert_allclose(
        np.asarray(logits_fused), np.asarray(logits_unfused), rtol=2e-5,
        atol=2e-5)
