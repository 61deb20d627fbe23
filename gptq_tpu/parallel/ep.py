"""Explicit expert parallelism via shard_map: MoE expert stacks shard
over an "ep" mesh axis.

The regime matches parallel/tp.py — activations replicated, weights
sharded. Each device runs the (cheap, replicated) router over the full
token set, dispatches only into its LOCAL expert slice (models/moe.py
slices the dispatch/combine tensors by axis_index), computes its experts'
GLU FFN, and one psum over the axis merges the combined outputs. No
all_to_all is needed with replicated activations; on a pod the psum rides
ICI. Weight memory for the FFN drops by ep — the capacity axis for expert
count, complementing tp (attention/linear width), pp (layers) and sp
(sequence).

The reference has no MoE at all (four dense families); this serves the
routed-FFN descendants of its llama family. Two compositions:

* `make_ep_forward` / `make_ep_decode_step`: ep-only mesh, every non-MoE
  weight replicated.
* `make_ep_tp_forward`: 2-D (ep, tp) mesh — attention linears replicate
  over ep and shard over tp (Megatron col/row via parallel.tp), expert
  stacks shard over ep and replicate over tp. The ROUTER weight stays
  fully replicated on both axes: route() needs the intact (E, D) weight
  to score every expert (models/moe.py).

GSPMD training needs none of this: parallel.mesh.param_specs already
shards expert stacks over the "tp" axis and XLA partitions the
dispatch/combine einsums itself.
"""

from __future__ import annotations

import jax
import numpy as np

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from gptq_tpu.models.common import ArchSpec, KVCache, model_forward

_REP = P()


def make_ep_mesh(ep: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if len(devices) < ep:
        raise ValueError(f"need {ep} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:ep]), ("ep",))


def _check(spec: ArchSpec, ep: int) -> None:
    if not spec.n_experts:
        raise ValueError("spec has no experts (n_experts == 0)")
    if spec.n_experts % ep:
        raise ValueError(f"n_experts {spec.n_experts} % ep {ep} != 0")


def ep_specs(params: dict, axis: str = "ep") -> dict:
    """PartitionSpec pytree: expert stacks shard dim 0 over `axis`,
    everything else replicated."""

    def layer_specs(bp):
        out = {}
        for key, val in bp.items():
            if key == "experts":
                out[key] = {k: P(axis) for k in val}  # rank-agnostic: dim 0 = E
            else:
                out[key] = jax.tree_util.tree_map(
                    lambda v: None if v is None else _REP, val,
                    is_leaf=lambda v: v is None)
        return out

    return {
        "embed": jax.tree_util.tree_map(
            lambda v: None if v is None else _REP, params["embed"],
            is_leaf=lambda v: v is None),
        "layers": [layer_specs(bp) for bp in params["layers"]],
        "final_ln": jax.tree_util.tree_map(
            lambda v: None if v is None else _REP, params.get("final_ln"),
            is_leaf=lambda v: v is None),
        "lm_head": jax.tree_util.tree_map(
            lambda v: None if v is None else _REP, params.get("lm_head"),
            is_leaf=lambda v: v is None),
    }


def make_ep_forward(spec: ArchSpec, params: dict, mesh: Mesh,
                    axis: str = "ep"):
    """fwd(params, ids) -> logits with expert stacks sharded over `axis`."""
    ep = mesh.shape[axis]
    _check(spec, ep)
    specs = ep_specs(params, axis)

    def body(p, ids):
        logits, _ = model_forward(spec, p, ids, ep_axis=axis, ep_size=ep)
        return logits

    fwd = shard_map(body, mesh=mesh, in_specs=(specs, _REP),
                    out_specs=_REP, check_vma=False)
    return jax.jit(fwd)


def make_ep_decode_step(spec: ArchSpec, params: dict, mesh: Mesh,
                        axis: str = "ep", int8_cache: bool = False):
    """step(params, cache, token) -> (last logits, cache): single-token
    decode with the KV cache replicated (attention is dense) and only the
    expert FFN sharded. int8_cache=True accepts a KVCache.init(dtype=int8)
    cache (scale planes replicated like the values)."""
    ep = mesh.shape[axis]
    _check(spec, ep)
    specs = ep_specs(params, axis)
    sc = _REP if int8_cache else None
    crep = KVCache(k=_REP, v=_REP, length=_REP, k_scale=sc, v_scale=sc)

    def body(p, cache, token):
        logits, cache = model_forward(spec, p, token, cache,
                                      ep_axis=axis, ep_size=ep)
        return logits[:, -1], cache

    step = shard_map(body, mesh=mesh, in_specs=(specs, crep, _REP),
                     out_specs=(_REP, crep), check_vma=False)
    return jax.jit(step)


def make_ep_tp_forward(spec: ArchSpec, params: dict, mesh: Mesh,
                       ep_axis: str = "ep", tp_axis: str = "tp"):
    """fwd(local_params, ids) -> logits on a 2-D (ep, tp) mesh: attention
    linears shard over tp with psum epilogues, expert stacks shard over
    ep, and the router weight replicates on both axes (route() needs the
    intact (E, D) weight) — attention/FFN weight memory scales with
    tp/ep respectively. Returns (local_params, fwd) like
    parallel.tp.make_tp_forward."""
    from gptq_tpu.parallel.tp import tp_local_view

    ep = mesh.shape[ep_axis]
    tp = mesh.shape[tp_axis]
    _check(spec, ep)
    local, pspecs = tp_local_view(spec, params, tp, tp_axis)
    # tp_local_view replicates unknown keys; override the expert stacks
    for sl in pspecs["layers"]:
        if "experts" in sl:
            sl["experts"] = {k: P(ep_axis) for k in sl["experts"]}

    def body(p, ids):
        logits, _ = model_forward(spec, p, ids, tp_axis=tp_axis, tp_size=tp,
                                  ep_axis=ep_axis, ep_size=ep)
        return logits

    fwd = shard_map(body, mesh=mesh, in_specs=(pspecs, _REP),
                    out_specs=_REP, check_vma=False)
    return local, jax.jit(fwd)


def make_ep_tp_decode_step(spec: ArchSpec, params: dict, mesh: Mesh,
                           ep_axis: str = "ep", tp_axis: str = "tp",
                           fuse: bool = False, a8: bool = False,
                           int8_cache: bool = False):
    """step(local_params, cache, token) -> (last logits, cache): MoE
    serving on a 2-D (ep, tp) mesh — attention linears shard over tp
    (packed/fused/a8 configs via tp_local_view, KV heads + int8 cache
    scales shard over tp via parallel.tp.cache_pspec), expert stacks
    shard over ep, router replicated. Returns (local_params, step) like
    make_tp_decode_step."""
    from gptq_tpu.parallel.tp import cache_pspec, tp_local_view

    ep = mesh.shape[ep_axis]
    tp = mesh.shape[tp_axis]
    _check(spec, ep)
    local, pspecs = tp_local_view(spec, params, tp, tp_axis,
                                  fuse=fuse, a8=a8)
    for sl in pspecs["layers"]:
        if "experts" in sl:
            sl["experts"] = {k: P(ep_axis) for k in sl["experts"]}
    cspec = cache_pspec(tp_axis, int8=int8_cache)

    def body(p, cache, token):
        logits, cache = model_forward(spec, p, token, cache,
                                      tp_axis=tp_axis, tp_size=tp,
                                      ep_axis=ep_axis, ep_size=ep)
        return logits[:, -1], cache

    step = shard_map(body, mesh=mesh, in_specs=(pspecs, cspec, _REP),
                     out_specs=(_REP, cspec), check_vma=False)
    return local, jax.jit(step)
