"""Model-zoo parity tests: our functional JAX forward vs HF transformers
torch forward on random-init tiny configs (offline, no downloads).

This is the correctness anchor for PPL parity: if logits match, the eval
pipeline matches the reference drivers' semantics."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import torch

from gptq_tpu.models.common import KVCache, model_forward
from gptq_tpu.models.convert import params_from_hf_torch

torch.manual_seed(0)


def tiny_opt(do_layer_norm_before=True):
    from transformers import OPTConfig, OPTForCausalLM

    cfg = OPTConfig(
        vocab_size=99, hidden_size=32, num_hidden_layers=2,
        ffn_dim=64, num_attention_heads=4, max_position_embeddings=64,
        word_embed_proj_dim=32, do_layer_norm_before=do_layer_norm_before,
        activation_function="relu",
    )
    return OPTForCausalLM(cfg).eval()


def tiny_opt_projected():
    from transformers import OPTConfig, OPTForCausalLM

    cfg = OPTConfig(
        vocab_size=99, hidden_size=32, num_hidden_layers=2,
        ffn_dim=64, num_attention_heads=4, max_position_embeddings=64,
        word_embed_proj_dim=16,  # exercises project_in/project_out
    )
    return OPTForCausalLM(cfg).eval()


def tiny_bloom():
    from transformers import BloomConfig, BloomForCausalLM

    cfg = BloomConfig(
        vocab_size=99, hidden_size=32, n_layer=2, n_head=4,
    )
    return BloomForCausalLM(cfg).eval()


def tiny_llama(kv_heads=2):
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(
        vocab_size=99, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=kv_heads, max_position_embeddings=64,
        rms_norm_eps=1e-5, tie_word_embeddings=False,
    )
    return LlamaForCausalLM(cfg).eval()


def tiny_gemma():
    from transformers import GemmaConfig, GemmaForCausalLM

    cfg = GemmaConfig(
        vocab_size=99, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=1,
        head_dim=16, max_position_embeddings=64,
    )
    return GemmaForCausalLM(cfg).eval()


def tiny_mixtral():
    from transformers import MixtralConfig, MixtralForCausalLM

    cfg = MixtralConfig(
        vocab_size=99, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-5,
        num_local_experts=4, num_experts_per_tok=2,
        tie_word_embeddings=False,
    )
    return MixtralForCausalLM(cfg).eval()


FACTORIES = {
    "opt": tiny_opt,
    "opt_postnorm": lambda: tiny_opt(do_layer_norm_before=False),
    "opt_projected": tiny_opt_projected,
    "bloom": tiny_bloom,
    "llama": tiny_llama,
    "llama_mha": lambda: tiny_llama(kv_heads=4),
    "gemma": tiny_gemma,
    # routed MoE: HF inference is dropless — spec_from_hf_config sets
    # expert_capacity = E/k so route() drops nothing and logits match
    "mixtral": tiny_mixtral,
}


@pytest.mark.parametrize("name", list(FACTORIES))
def test_forward_matches_hf(name):
    model = FACTORIES[name]()
    spec, params = params_from_hf_torch(model)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 99, size=(2, 12))
    with torch.no_grad():
        want = model(torch.from_numpy(ids)).logits.numpy()
    got, _ = model_forward(spec, params, jnp.asarray(ids))
    got = np.asarray(got, dtype=np.float32)
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize("name", ["opt", "llama", "bloom"])
def test_decode_cache_matches_full_forward(name):
    """Token-by-token decode with KV cache must reproduce the full forward."""
    model = FACTORIES[name]()
    spec, params = params_from_hf_torch(model)
    rng = np.random.default_rng(1)
    T = 10
    ids = rng.integers(0, 99, size=(1, T))
    full, _ = model_forward(spec, params, jnp.asarray(ids))

    cache = KVCache.init(spec, batch=1, max_len=16, dtype=jnp.float32)
    outs = []
    for t in range(T):
        logits, cache = model_forward(spec, params, jnp.asarray(ids[:, t : t + 1]), cache)
        outs.append(np.asarray(logits)[:, 0])
    got = np.stack(outs, axis=1)
    np.testing.assert_allclose(got, np.asarray(full), rtol=1e-3, atol=1e-3)


def test_block_captures_linear_inputs():
    """The functional capture replaces torch forward hooks
    (reference: opt.py:177-187)."""
    from gptq_tpu.models.common import block_forward, build_mask

    model = tiny_llama()
    spec, params = params_from_hf_torch(model)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(1, 8, 32)), jnp.float32)
    positions = jnp.arange(8)[None]
    mask = build_mask(spec, 8, 8)
    out, _, caps = block_forward(
        spec, params["layers"][0], x, positions=positions, mask=mask, capture=True
    )
    assert set(caps) == {
        "self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj",
        "self_attn.o_proj", "mlp.gate_proj", "mlp.up_proj", "mlp.down_proj",
    }
    assert caps["self_attn.q_proj"].shape == (1, 8, 32)
    assert out.shape == x.shape
