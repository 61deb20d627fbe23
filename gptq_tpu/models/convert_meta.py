"""Meta-format checkpoint converters (LLaMa consolidated.*.pth, Gemma).

Counterpart of the reference's vendored HF converter scripts
(reference: script/convert_llama_weights_to_hf.py, script/
convert_gemma_weights_to_hf.py) — but converting directly into gptq_tpu
param pytrees instead of an intermediate HF directory. The interleaved->
sliced rotary permutation (reference: convert_llama_weights_to_hf.py:134)
is applied to q/k so apply_rope's rotate-half convention matches.
"""

from __future__ import annotations

import glob
import json
import math
import os

import jax.numpy as jnp
import numpy as np

from gptq_tpu.models.common import ArchSpec


def _permute_rotary(w: np.ndarray, n_heads: int, dim1: int, dim2: int) -> np.ndarray:
    """Interleaved rotary layout -> HF 'sliced' rotate-half layout
    (reference: convert_llama_weights_to_hf.py:134)."""
    return (w.reshape(n_heads, dim1 // n_heads // 2, 2, dim2)
            .transpose(0, 2, 1, 3).reshape(dim1, dim2))


def llama_spec_from_params_json(pj: dict, vocab: int) -> ArchSpec:
    dim = pj["dim"]
    n_heads = pj["n_heads"]
    n_kv = pj.get("n_kv_heads", n_heads)
    multiple_of = pj.get("multiple_of", 256)
    ffn_mult = pj.get("ffn_dim_multiplier", 1.0) or 1.0
    hidden = int(8 * dim / 3 * ffn_mult)
    ffn = multiple_of * ((hidden + multiple_of - 1) // multiple_of)
    return ArchSpec(
        arch="llama", n_layers=pj["n_layers"], hidden=dim, n_heads=n_heads,
        n_kv_heads=n_kv, ffn=ffn, vocab=vocab,
        max_pos=pj.get("max_seq_len", 2048),
        norm_eps=pj.get("norm_eps", 1e-5), act="silu", pos="rope",
        norm_type="rmsnorm", linear_bias=False, tie_embeddings=False,
        rope_theta=pj.get("rope_theta", 10000.0),
    )


def params_from_meta_llama(path: str, dtype=jnp.float32):
    """Convert a Meta LLaMa checkpoint directory (params.json +
    consolidated.*.pth shards, sharded along the Megatron conventions the
    reference converter handles at convert_llama_weights_to_hf.py:146-215)."""
    import torch

    with open(os.path.join(path, "params.json")) as f:
        pj = json.load(f)
    shards = sorted(glob.glob(os.path.join(path, "consolidated.*.pth")))
    loaded = [torch.load(s, map_location="cpu", weights_only=True) for s in shards]
    ns = len(loaded)

    def cat(key, dim):
        ts = [sd[key] for sd in loaded]
        t = ts[0] if ns == 1 else torch.cat(ts, dim=dim)
        return t.float().numpy()

    tok = cat("tok_embeddings.weight", 1 if ns > 1 else 0)  # col-sharded
    vocab = tok.shape[0]
    spec = llama_spec_from_params_json(pj, vocab)
    dim = spec.hidden
    n_heads = spec.n_heads
    n_kv = spec.kv_heads
    kv_dim = dim * n_kv // n_heads

    layers = []
    for i in range(spec.n_layers):
        pre = f"layers.{i}."
        wq = _permute_rotary(cat(pre + "attention.wq.weight", 0), n_heads, dim, dim)
        wk = _permute_rotary(cat(pre + "attention.wk.weight", 0), n_kv, kv_dim, dim)
        layers.append({
            "q": {"w": jnp.asarray(wq, dtype), "b": None},
            "k": {"w": jnp.asarray(wk, dtype), "b": None},
            "v": {"w": jnp.asarray(cat(pre + "attention.wv.weight", 0), dtype), "b": None},
            "o": {"w": jnp.asarray(cat(pre + "attention.wo.weight", 1), dtype), "b": None},
            "gate": {"w": jnp.asarray(cat(pre + "feed_forward.w1.weight", 0), dtype), "b": None},
            "down": {"w": jnp.asarray(cat(pre + "feed_forward.w2.weight", 1), dtype), "b": None},
            "up": {"w": jnp.asarray(cat(pre + "feed_forward.w3.weight", 0), dtype), "b": None},
            "ln1": {"w": jnp.asarray(loaded[0][pre + "attention_norm.weight"].float().numpy(), dtype)},
            "ln2": {"w": jnp.asarray(loaded[0][pre + "ffn_norm.weight"].float().numpy(), dtype)},
        })
    params = {
        "embed": {"tokens": jnp.asarray(tok, dtype)},
        "layers": layers,
        "final_ln": {"w": jnp.asarray(loaded[0]["norm.weight"].float().numpy(), dtype)},
        "lm_head": {"w": jnp.asarray(cat("output.weight", 0), dtype), "b": None},
    }
    return spec, params


def params_from_gemma_ckpt(path: str, dtype=jnp.float32):
    """Convert a Gemma torch checkpoint (single .ckpt with fused qkv, as
    handled by reference script/convert_gemma_weights_to_hf.py)."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=True)
    sd = blob.get("model_state_dict", blob)
    # infer sizes
    emb = sd["embedder.weight"].float().numpy()
    vocab, dim = emb.shape
    n_layers = max(
        int(k.split(".")[2]) for k in sd if k.startswith("model.layers.")
    ) + 1
    # qkv fused: (n_heads*hd + 2*n_kv*hd, dim)
    qkv0 = sd["model.layers.0.self_attn.qkv_proj.weight"]
    o0 = sd["model.layers.0.self_attn.o_proj.weight"]
    q_out = o0.shape[1]
    kv_out = (qkv0.shape[0] - q_out) // 2
    hd = 256 if dim in (2048, 3072) else dim // 8
    n_heads = q_out // hd
    n_kv = kv_out // hd
    ffn = sd["model.layers.0.mlp.gate_proj.weight"].shape[0]
    spec = ArchSpec(
        arch="gemma", n_layers=n_layers, hidden=dim, n_heads=n_heads,
        n_kv_heads=n_kv, head_dim=hd, ffn=ffn, vocab=vocab, max_pos=8192,
        norm_eps=1e-6, act="gelu_tanh", pos="rope", norm_type="rmsnorm1p",
        linear_bias=False, tie_embeddings=True,
        embed_scale=float(dim) ** 0.5,
    )
    layers = []
    for i in range(n_layers):
        pre = f"model.layers.{i}."
        qkv = sd[pre + "self_attn.qkv_proj.weight"].float().numpy()
        wq = qkv[:q_out]
        wk = qkv[q_out : q_out + kv_out]
        wv = qkv[q_out + kv_out :]
        layers.append({
            "q": {"w": jnp.asarray(wq, dtype), "b": None},
            "k": {"w": jnp.asarray(wk, dtype), "b": None},
            "v": {"w": jnp.asarray(wv, dtype), "b": None},
            "o": {"w": jnp.asarray(sd[pre + "self_attn.o_proj.weight"].float().numpy(), dtype), "b": None},
            "gate": {"w": jnp.asarray(sd[pre + "mlp.gate_proj.weight"].float().numpy(), dtype), "b": None},
            "up": {"w": jnp.asarray(sd[pre + "mlp.up_proj.weight"].float().numpy(), dtype), "b": None},
            "down": {"w": jnp.asarray(sd[pre + "mlp.down_proj.weight"].float().numpy(), dtype), "b": None},
            "ln1": {"w": jnp.asarray(sd[pre + "input_layernorm.weight"].float().numpy(), dtype)},
            "ln2": {"w": jnp.asarray(sd[pre + "post_attention_layernorm.weight"].float().numpy(), dtype)},
        })
    params = {
        "embed": {"tokens": jnp.asarray(emb, dtype)},
        "layers": layers,
        "final_ln": {"w": jnp.asarray(sd["model.norm.weight"].float().numpy(), dtype)},
        "lm_head": None,
    }
    return spec, params
