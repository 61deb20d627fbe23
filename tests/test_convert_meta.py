"""Meta-format converter test: build a synthetic consolidated.00.pth from a
tiny HF llama (applying the inverse rotary permute), convert with
params_from_meta_llama, and check logits parity against the HF model."""

import json

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from gptq_tpu.models.common import model_forward
from gptq_tpu.models.convert import params_from_hf_torch
from gptq_tpu.models.convert_meta import params_from_meta_llama

torch.manual_seed(0)


def inverse_permute(w, n_heads, dim1, dim2):
    # inverse of reference convert_llama_weights_to_hf.py:134
    return (w.view(n_heads, 2, dim1 // n_heads // 2, dim2)
            .transpose(1, 2).reshape(dim1, dim2))


def test_meta_llama_roundtrip(tmp_path):
    from transformers import LlamaConfig, LlamaForCausalLM

    dim, heads, kv = 32, 4, 4
    cfg = LlamaConfig(vocab_size=67, hidden_size=dim, intermediate_size=96,
                      num_hidden_layers=2, num_attention_heads=heads,
                      num_key_value_heads=kv, max_position_embeddings=64,
                      tie_word_embeddings=False)
    model = LlamaForCausalLM(cfg).eval()
    sd = model.state_dict()

    meta = {}
    meta["tok_embeddings.weight"] = sd["model.embed_tokens.weight"]
    meta["norm.weight"] = sd["model.norm.weight"]
    meta["output.weight"] = sd["lm_head.weight"]
    for i in range(2):
        h = f"model.layers.{i}."
        m = f"layers.{i}."
        meta[m + "attention.wq.weight"] = inverse_permute(
            sd[h + "self_attn.q_proj.weight"], heads, dim, dim)
        meta[m + "attention.wk.weight"] = inverse_permute(
            sd[h + "self_attn.k_proj.weight"], kv, dim * kv // heads, dim)
        meta[m + "attention.wv.weight"] = sd[h + "self_attn.v_proj.weight"]
        meta[m + "attention.wo.weight"] = sd[h + "self_attn.o_proj.weight"]
        meta[m + "feed_forward.w1.weight"] = sd[h + "mlp.gate_proj.weight"]
        meta[m + "feed_forward.w2.weight"] = sd[h + "mlp.down_proj.weight"]
        meta[m + "feed_forward.w3.weight"] = sd[h + "mlp.up_proj.weight"]
        meta[m + "attention_norm.weight"] = sd[h + "input_layernorm.weight"]
        meta[m + "ffn_norm.weight"] = sd[h + "post_attention_layernorm.weight"]

    torch.save(meta, tmp_path / "consolidated.00.pth")
    # ffn sizing: pick multiple_of so the derived ffn == 96
    with open(tmp_path / "params.json", "w") as f:
        json.dump({"dim": dim, "n_layers": 2, "n_heads": heads,
                   "n_kv_heads": kv, "norm_eps": cfg.rms_norm_eps,
                   "multiple_of": 96, "ffn_dim_multiplier": 96 / (8 * dim / 3),
                   "max_seq_len": 64}, f)

    spec, params = params_from_meta_llama(str(tmp_path))
    assert spec.ffn == 96

    ids = np.random.default_rng(0).integers(0, 67, size=(1, 10))
    with torch.no_grad():
        want = model(torch.from_numpy(ids)).logits.numpy()
    got, _ = model_forward(spec, params, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-4, atol=5e-4)

    # the generic checkpoint loader must detect the Meta format, so the CLI
    # accepts a raw Meta dir directly (no separate converter invocation)
    from gptq_tpu.models.convert import params_from_dir

    spec2, params2 = params_from_dir(str(tmp_path))
    assert spec2.arch == "llama" and spec2.ffn == 96
    np.testing.assert_array_equal(
        np.asarray(params2["layers"][0]["q"]["w"]),
        np.asarray(params["layers"][0]["q"]["w"]))
