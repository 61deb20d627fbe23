"""Explicit tensor-parallel serving via shard_map.

The GSPMD path (mesh.shard_params + jit) lets XLA partition the pure-jnp
oracle ops, but a Pallas kernel is an opaque custom call — GSPMD cannot
split it, so packed serving on a real pod needs each device to run the
kernel on its LOCAL shard with explicit collectives around it. This module
builds that: Megatron-pattern sharding (q/k/v/gate/up/fc1 column-sharded,
o/down/fc2 row-sharded, activations replicated) with one psum per residual
projection riding the ICI — the all-reduce the north star asks to overlap
with the dequant-matmul (XLA's latency-hiding scheduler overlaps the psum
of layer i with layer i+1's weight DMA).

Replaces (by design, not translation) the reference's naive per-GPU layer
placement with explicit activation movement (reference: opt.py:404-438
`opt_multigpu`/`MoveModule`).

Constraints (checked, with clear errors): heads and kv-heads divide tp;
PackedWeight shards must slice on subblock boundaries (see
`pack_quantized(tp=...)` which pads for a target tp); act-order perms are
a global gather on x and are not supported here — use the GSPMD path.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from gptq_tpu.models.common import ArchSpec, KVCache, model_forward
from gptq_tpu.ops.pack import PackedWeight, subblock
from gptq_tpu.parallel.mesh import sharding_rules

_REP = P()


def _check_packed(pw: PackedWeight, kind: str, tp: int, name: str) -> None:
    if pw.perm is not None:
        raise ValueError(
            f"{name}: act-order perm is a global x gather; use the GSPMD "
            f"path or repack without act-order for shard_map TP")
    if kind == "row" and pw.bias is not None:
        # a bias baked into a row-sharded PackedWeight would be added on
        # every shard and multiplied by tp after the psum; pack_model never
        # bakes biases, so fail loudly if one ever appears
        raise ValueError(
            f"{name}: row-sharded PackedWeight must not carry a baked-in "
            f"bias (it would be added tp times after the psum); keep the "
            f"bias in the layer dict's 'b' entry instead")
    if kind == "col":
        if pw.Np % tp:
            raise ValueError(f"{name}: stored N {pw.Np} % tp {tp} != 0")
        if pw.fmt != "bcq" and pw.scale.shape[1] % tp:
            raise ValueError(f"{name}: scale cols not divisible by tp")
    else:
        sb = subblock(pw.Kp, pw.groupsize)
        kl = pw.Kp // tp
        if pw.Kp % tp or kl % sb or subblock(kl, pw.groupsize) != sb:
            raise ValueError(
                f"{name}: stored K {pw.Kp} does not split into tp={tp} "
                f"subblock-aligned shards (sb={sb}); pack with "
                f"pack_quantized(..., tp={tp}) to pad for this mesh")
        ng = (pw.scale if pw.fmt != "bcq" else pw.alpha).shape[0]
        if ng > 1 and ng % tp:
            raise ValueError(f"{name}: groups {ng} % tp {tp} != 0")


def _packed_local(pw: PackedWeight, kind: str, tp: int) -> PackedWeight:
    """Rewrite static dims to the local shard's stored dims (logical ==
    stored locally: pad rows/cols flow through as exact zeros)."""
    if kind == "col":
        return dataclasses.replace(pw, N=pw.Np // tp)
    return dataclasses.replace(pw, K=pw.Kp // tp, N=pw.Np)


def _packed_pspec(pw: PackedWeight, kind: str, axis: str) -> PackedWeight:
    if pw.fmt == "bcq":
        wspec = P(None, None, axis) if kind == "col" else P(None, axis, None)
        aspec = P(None, None, axis) if kind == "col" else P(axis, None, None)
        alpha = aspec if pw.alpha.shape[0] > 1 or kind == "col" else P(
            None, None, None)
        if kind == "row" and pw.alpha.shape[0] == 1:
            alpha = _REP  # per-tensor alpha replicates across K shards
        return dataclasses.replace(
            pw, words=(wspec,), alpha=alpha, scale=None, zoff=None,
            bias=P(axis) if (kind == "col" and pw.bias is not None) else (
                _REP if pw.bias is not None else None),
            perm=None)
    wspec = P(None, axis) if kind == "col" else P(axis, None)
    if kind == "col":
        gspec = P(None, axis)
    else:
        gspec = P(axis, None) if pw.scale.shape[0] > 1 else _REP
    return dataclasses.replace(
        pw, words=tuple(wspec for _ in pw.words), scale=gspec, zoff=gspec,
        bias=P(axis) if (kind == "col" and pw.bias is not None) else (
            _REP if pw.bias is not None else None),
        perm=None)


def tp_local_view(spec: ArchSpec, params: dict, tp: int, axis: str = "tp"
                  ) -> tuple[dict, dict]:
    """(local_params, partition_spec_pytree) for shard_map.

    local_params has every PackedWeight's static dims rewritten to the
    local shard sizes; array leaves are untouched (shard_map slices them).
    """
    if spec.n_heads % tp or spec.kv_heads % tp:
        raise ValueError(
            f"heads ({spec.n_heads}/{spec.kv_heads}) must divide tp={tp}")
    rules = sharding_rules(spec)

    def lin_view(lin: dict, kind: str, name: str):
        w = lin["w"]
        if isinstance(w, PackedWeight):
            _check_packed(w, kind, tp, name)
            lw = _packed_local(w, kind, tp)
            # specs built from the LOCAL view: PackedWeight statics are
            # pytree metadata and must match between params and in_specs
            sw = _packed_pspec(lw, kind, axis)
        else:
            lw = w
            sw = P(axis, None) if kind == "col" else P(None, axis)
        lp: dict[str, Any] = {"w": lw}
        sp: dict[str, Any] = {"w": sw}
        if "b" in lin:
            lp["b"] = lin["b"]
            sp["b"] = None if lin["b"] is None else (
                P(axis) if kind == "col" else _REP)
        if "act_q" in lin:
            lp["act_q"] = lin["act_q"]
            sp["act_q"] = None if lin["act_q"] is None else {
                k: _REP for k in lin["act_q"]}
        return lp, sp

    def rep_tree(p):
        if p is None:
            return None, None
        return p, jax.tree.map(lambda _: _REP, p)

    lp_layers, sp_layers = [], []
    for li, bp in enumerate(params["layers"]):
        if "qkv_fused" in bp or "gateup_fused" in bp:
            raise ValueError(
                "shard_map TP runs on unfused params (fusion concatenates "
                "N across parts, which breaks per-part shard boundaries); "
                "build the engine with fuse=False")
        lpd, spd = {}, {}
        for key, val in bp.items():
            if key in rules:
                lpd[key], spd[key] = lin_view(val, rules[key],
                                              f"layer{li}.{key}")
            else:
                lpd[key], spd[key] = rep_tree(val)
        lp_layers.append(lpd)
        sp_layers.append(spd)

    le, se = rep_tree(params["embed"])
    lf, sf = rep_tree(params.get("final_ln"))
    lm = params.get("lm_head")
    if (lm is not None and not isinstance(lm.get("w"), PackedWeight)
            and lm["w"].shape[0] % tp == 0):
        # dense lm_head: shard the vocab dim; head_forward all-gathers the
        # logits (ServeFlags.vocab_tp)
        from gptq_tpu.models.common import ServeFlags

        lh = {**lm, "serve": ServeFlags(vocab_tp=True)}
        sh = {"w": P(axis, None),
              "b": None if lm.get("b") is None else P(axis)}
        sh = {**{k: _REP for k in lm if k not in ("w", "b")}, **sh}
        sh["serve"] = ServeFlags(vocab_tp=True)  # static: mirrors params
    else:
        lh, sh = rep_tree(lm)
    local = {"embed": le, "layers": lp_layers, "final_ln": lf, "lm_head": lh}
    specs = {"embed": se, "layers": sp_layers, "final_ln": sf, "lm_head": sh}
    return local, specs


def cache_pspec(axis: str = "tp", int8: bool = False) -> KVCache:
    """KV cache PartitionSpecs: kv heads sharded over the tp axis. With
    int8=True the per-token-head scale planes (L, B, S, kvh) shard on the
    same head axis so an int8 cache composes with shard_map TP."""
    kv = P(None, None, None, axis, None)
    sc = P(None, None, None, axis) if int8 else None
    return KVCache(k=kv, v=kv, length=_REP, k_scale=sc, v_scale=sc)


def local_cache(spec: ArchSpec, tp: int, batch: int, max_len: int,
                dtype=jnp.bfloat16) -> KVCache:
    """A GLOBAL cache sized so each shard holds kv_heads/tp heads."""
    return KVCache.init(spec, batch, max_len, dtype)


def make_tp_decode_step(spec: ArchSpec, params: dict, mesh: Mesh,
                        axis: str = "tp", int8_cache: bool = False):
    """(local_params, step): step(params, cache, token) -> (logits, cache)
    with every packed matmul running per-shard inside shard_map and one
    psum per residual projection. int8_cache=True expects a
    KVCache.init(dtype=int8) cache (scale planes head-sharded)."""
    tp = mesh.shape[axis]
    local, pspecs = tp_local_view(spec, params, tp, axis)
    cspec = cache_pspec(axis, int8=int8_cache)
    other = tuple(a for a in mesh.axis_names if a != axis)
    if any(mesh.shape[a] != 1 for a in other):
        raise ValueError("make_tp_decode_step expects a tp-only mesh; "
                         "add dp via an outer vmap/pjit")

    def local_step(p, cache: KVCache, token):
        logits, cache = model_forward(spec, p, token, cache,
                                      tp_axis=axis, tp_size=tp)
        return logits[:, -1], cache

    step = shard_map(
        local_step, mesh=mesh,
        in_specs=(pspecs, cspec, _REP),
        out_specs=(_REP, cspec),
        check_vma=False,
    )
    return local, jax.jit(step)


def make_tp_forward(spec: ArchSpec, params: dict, mesh: Mesh,
                    axis: str = "tp"):
    """(local_params, fwd): fwd(params, ids) -> logits, cache-less forward
    (PPL eval path) under shard_map TP."""
    tp = mesh.shape[axis]
    local, pspecs = tp_local_view(spec, params, tp, axis)

    def local_fwd(p, ids):
        logits, _ = model_forward(spec, p, ids, tp_axis=axis, tp_size=tp)
        return logits

    fwd = shard_map(
        local_fwd, mesh=mesh,
        in_specs=(pspecs, _REP),
        out_specs=_REP,
        check_vma=False,
    )
    return local, jax.jit(fwd)
