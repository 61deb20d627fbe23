"""Architecture registry: specs, per-block linear names, sequential groups.

The per-arch linear name lists replace the reference's find_layers module
walk (reference: modelutils.py:8-16); the true-sequential grouping mirrors
the intent of reference llama.py:97-105 ([qkv], [o], [up,gate], [down]) —
note the reference's mis-indentation bug (llama.py:106-110) is NOT
replicated (SURVEY.md §7 "replicate intent, not bugs").
"""

from __future__ import annotations

from dataclasses import dataclass

from gptq_tpu.models.common import ArchSpec


@dataclass(frozen=True)
class ArchInfo:
    spec_defaults: dict
    # map: capture/linear name -> param key in the block dict
    linears: dict
    # true-sequential ordering: list of groups of linear names
    seq_groups: tuple
    hf_prefix: str


ARCHS = {
    "opt": ArchInfo(
        spec_defaults=dict(arch="opt", act="relu", pos="learned",
                           norm_type="layernorm", linear_bias=True),
        linears={
            "self_attn.k_proj": "k",
            "self_attn.v_proj": "v",
            "self_attn.q_proj": "q",
            "self_attn.out_proj": "o",
            "fc1": "fc1",
            "fc2": "fc2",
        },
        seq_groups=(
            ("self_attn.k_proj", "self_attn.v_proj", "self_attn.q_proj"),
            ("self_attn.out_proj",),
            ("fc1",),
            ("fc2",),
        ),
        hf_prefix="model.decoder.layers",
    ),
    "bloom": ArchInfo(
        spec_defaults=dict(arch="bloom", act="gelu_tanh", pos="alibi",
                           norm_type="layernorm", linear_bias=True,
                           tie_embeddings=True),
        linears={
            "self_attention.query_key_value": "qkv",
            "self_attention.dense": "o",
            "mlp.dense_h_to_4h": "fc1",
            "mlp.dense_4h_to_h": "fc2",
        },
        seq_groups=(
            ("self_attention.query_key_value",),
            ("self_attention.dense",),
            ("mlp.dense_h_to_4h",),
            ("mlp.dense_4h_to_h",),
        ),
        hf_prefix="transformer.h",
    ),
    "llama": ArchInfo(
        spec_defaults=dict(arch="llama", act="silu", pos="rope",
                           norm_type="rmsnorm", linear_bias=False),
        linears={
            "self_attn.q_proj": "q",
            "self_attn.k_proj": "k",
            "self_attn.v_proj": "v",
            "self_attn.o_proj": "o",
            "mlp.gate_proj": "gate",
            "mlp.up_proj": "up",
            "mlp.down_proj": "down",
        },
        seq_groups=(
            ("self_attn.k_proj", "self_attn.v_proj", "self_attn.q_proj"),
            ("self_attn.o_proj",),
            ("mlp.up_proj", "mlp.gate_proj"),
            ("mlp.down_proj",),
        ),
        hf_prefix="model.layers",
    ),
    "gemma": ArchInfo(
        spec_defaults=dict(arch="gemma", act="gelu_tanh", pos="rope",
                           norm_type="rmsnorm1p", linear_bias=False,
                           tie_embeddings=True),
        linears={
            "self_attn.q_proj": "q",
            "self_attn.k_proj": "k",
            "self_attn.v_proj": "v",
            "self_attn.o_proj": "o",
            "mlp.gate_proj": "gate",
            "mlp.up_proj": "up",
            "mlp.down_proj": "down",
        },
        seq_groups=(
            ("self_attn.k_proj", "self_attn.v_proj", "self_attn.q_proj"),
            ("self_attn.o_proj",),
            ("mlp.up_proj", "mlp.gate_proj"),
            ("mlp.down_proj",),
        ),
        hf_prefix="model.layers",
    ),
}


def get_arch(name: str) -> ArchInfo:
    return ARCHS[name]


def arch_of_hf_config(config) -> str:
    mt = getattr(config, "model_type", "")
    if mt in ARCHS:
        return mt
    if "opt" in mt:
        return "opt"
    if "bloom" in mt:
        return "bloom"
    if "gemma" in mt:
        return "gemma"
    return "llama"  # incl. mixtral (llama attention + routed GLU experts)


def spec_from_hf_config(config) -> ArchSpec:
    """Build an ArchSpec from a transformers PretrainedConfig."""
    arch = arch_of_hf_config(config)
    d = dict(ARCHS[arch].spec_defaults)
    if arch == "opt":
        d.update(
            n_layers=config.num_hidden_layers,
            hidden=config.hidden_size,
            n_heads=config.num_attention_heads,
            ffn=config.ffn_dim,
            vocab=config.vocab_size,
            max_pos=config.max_position_embeddings,
            word_embed_dim=config.word_embed_proj_dim,
            do_layer_norm_before=config.do_layer_norm_before,
            norm_eps=1e-5,
        )
    elif arch == "bloom":
        d.update(
            n_layers=config.n_layer,
            hidden=config.hidden_size,
            n_heads=config.n_head,
            ffn=4 * config.hidden_size,
            vocab=config.vocab_size,
            max_pos=2048,
            norm_eps=config.layer_norm_epsilon,
        )
    else:  # llama / gemma
        d.update(
            n_layers=config.num_hidden_layers,
            hidden=config.hidden_size,
            n_heads=config.num_attention_heads,
            n_kv_heads=getattr(config, "num_key_value_heads", config.num_attention_heads),
            head_dim=getattr(config, "head_dim", -1) or -1,
            ffn=config.intermediate_size,
            vocab=config.vocab_size,
            max_pos=config.max_position_embeddings,
            norm_eps=config.rms_norm_eps,
            rope_theta=getattr(config, "rope_theta", 10000.0),
            tie_embeddings=bool(getattr(config, "tie_word_embeddings", arch == "gemma")),
            # Mixtral-style routed MoE (model_type "mixtral"): llama
            # attention + gate-routed GLU experts (models/moe.py)
            n_experts=getattr(config, "num_local_experts", 0) or 0,
            expert_top_k=getattr(config, "num_experts_per_tok", 2) or 2,
        )
        if d["n_experts"]:
            # HF Mixtral inference is DROPLESS (no per-expert capacity);
            # capacity_factor = E/k makes C = ceil(k*N*(E/k)/E) = N, so
            # converted checkpoints reproduce the source model exactly
            # instead of silently dropping assignments under imbalance
            d["expert_capacity"] = d["n_experts"] / d["expert_top_k"]
        if arch == "gemma":
            d["embed_scale"] = float(config.hidden_size) ** 0.5
            if getattr(config, "hidden_activation", None) in ("gelu_pytorch_tanh", None):
                d["act"] = "gelu_tanh"
    return ArchSpec(**d)
