from gptq_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_params,
    sharding_rules,
)

# The strategy modules (tp, pp, sp, ep) are heavier than mesh (pp pulls in
# optax); re-export their entry points LAZILY (PEP 562) so importing
# gptq_tpu.parallel.mesh — which finetune.py and the CLI do at startup —
# doesn't pay for all four plus optax.
_LAZY = {
    "make_tp_decode_step": "tp", "make_tp_forward": "tp",
    "make_pp_eval": "pp", "make_pp_mesh": "pp",
    "make_pp_train_step": "pp", "stack_stage_params": "pp",
    "unstack_stage_params": "pp",
    "SPCache": "sp", "make_sp_cache_prefill": "sp",
    "make_sp_decode_step": "sp", "make_sp_mesh": "sp",
    "make_sp_prefill": "sp", "make_sp_tp_cache_prefill": "sp",
    "make_sp_tp_decode_step": "sp", "make_sp_tp_mesh": "sp",
    "make_sp_tp_prefill": "sp",
    "make_ep_decode_step": "ep", "make_ep_forward": "ep",
    "make_ep_mesh": "ep", "make_ep_tp_decode_step": "ep",
    "make_ep_tp_forward": "ep",
}


def __getattr__(name):
    mod = _LAZY.get(name)
    if mod is None:
        raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
    import importlib

    return getattr(importlib.import_module(f"gptq_tpu.parallel.{mod}"), name)


def __dir__():
    return sorted(set(globals()) | set(_LAZY))
