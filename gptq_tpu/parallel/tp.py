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
    perm = pw.perm
    if perm is not None:
        # pad the K-permutation to the stored Kp so it shards evenly; pad
        # entries gather x[..., 0] into zero-scale pad rows -> contribute 0
        perm = jnp.concatenate([
            jnp.asarray(perm, jnp.int32),
            jnp.zeros((pw.Kp - perm.shape[0],), jnp.int32)])
    return dataclasses.replace(pw, K=pw.Kp // tp, N=pw.Np, perm=perm)


def _packed_pspec(pw: PackedWeight, kind: str, axis: str) -> PackedWeight:
    # act-order perm: replicated for col shards (the input x is replicated,
    # so x[:, perm] is shard-local); K-sharded for row shards (each shard
    # gathers its own slice of the permutation after an all_gather of x —
    # see _row_linear in models/common.py)
    pspec = None if pw.perm is None else (
        _REP if kind == "col" else P(axis))
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
            perm=pspec)
    wspec = P(None, axis) if kind == "col" else P(axis, None)
    if kind == "col":
        gspec = P(None, axis)
    else:
        gspec = P(axis, None) if pw.scale.shape[0] > 1 else _REP
    return dataclasses.replace(
        pw, words=tuple(wspec for _ in pw.words), scale=gspec, zoff=gspec,
        bias=P(axis) if (kind == "col" and pw.bias is not None) else (
            _REP if pw.bias is not None else None),
        perm=pspec)


def tp_local_view(spec: ArchSpec, params: dict, tp: int, axis: str = "tp",
                  fuse: bool = False, a8: bool = False) -> tuple[dict, dict]:
    """(local_params, partition_spec_pytree) for shard_map.

    local_params has every PackedWeight's static dims rewritten to the
    local shard sizes; array leaves are untouched (shard_map slices them).

    fuse=True builds the q/k/v (and llama-family gate/up) serving fusion in
    the SHARD-INTERLEAVED layout (ops/pack.fuse_packed(tp=...)): slicing
    the fused N over the mesh hands every shard a standard fused weight of
    its own column shards — the fastest single-chip serving config now runs
    tensor-parallel. a8=True marks every packed linear for dynamic int8
    activations (the --faster-kernel path)."""
    if spec.n_heads % tp or spec.kv_heads % tp:
        raise ValueError(
            f"heads ({spec.n_heads}/{spec.kv_heads}) must divide tp={tp}")
    rules = sharding_rules(spec)

    def serve_flags(lw):
        from gptq_tpu.models.common import ServeFlags

        if a8 and isinstance(lw, PackedWeight):
            return ServeFlags(a8=True)
        return None

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
        fl = serve_flags(lw)
        if fl is not None:
            lp["serve"] = sp["serve"] = fl
        return lp, sp

    def try_fuse_tp(bp, names, li):
        """Interleaved fused entry (local + pspec) or None."""
        from gptq_tpu.models.common import FusedSplits
        from gptq_tpu.ops.pack import fuse_packed

        lins = [bp.get(n) for n in names]
        if any(l is None or not isinstance(l.get("w"), PackedWeight)
               for l in lins):
            return None
        ws = [l["w"] for l in lins]
        aqs = [l.get("act_q") for l in lins]
        if any(aq is not None for aq in aqs):
            # q/k/v share one input, so act_q params normally coincide;
            # verify VALUES (not just presence) — fusing applies aqs[0]
            # to every part, so a mixed-precision model with differing
            # per-linear act quantizers must stay unfused
            from gptq_tpu.models.common import same_actq

            a0 = aqs[0]
            for aq in aqs[1:]:
                if not same_actq(a0, aq):
                    return None
        if any(w.Np != w.N for w in ws):
            # pad columns would be emitted as logical head outputs after
            # the per-shard split (FusedSplits below uses stored == logical)
            return None
        for w, n in zip(ws, names):
            _check_packed(w, "col", tp, f"layer{li}.{n}")
        fused = fuse_packed(ws, tp=tp)
        if fused is None:
            return None
        local_w = dataclasses.replace(fused, N=fused.Np // tp)
        spec_w = _packed_pspec(local_w, "col", axis)
        splits = FusedSplits(tuple((w.Np // tp, w.Np // tp) for w in ws))
        lp = {"w": local_w, "splits": splits,
              "b_parts": [l.get("b") for l in lins], "act_q": aqs[0]}
        sp = {"w": spec_w, "splits": splits,
              "b_parts": [None if l.get("b") is None else P(axis)
                          for l in lins],
              "act_q": None if aqs[0] is None else {
                  k: _REP for k in aqs[0]}}
        fl = serve_flags(local_w)
        if fl is not None:
            lp["serve"] = sp["serve"] = fl
        return lp, sp

    def rep_tree(p):
        if p is None:
            return None, None
        return p, jax.tree.map(lambda _: _REP, p)

    lp_layers, sp_layers = [], []
    for li, bp in enumerate(params["layers"]):
        if "qkv_fused" in bp or "gateup_fused" in bp:
            raise ValueError(
                "shard_map TP cannot slice a globally-fused weight (its N "
                "concatenates parts); pass unfused params and use "
                "tp_local_view(fuse=True) for the shard-interleaved fusion")
        lpd, spd = {}, {}
        handled: set[str] = set()
        if fuse:
            groups = []
            if spec.arch != "bloom":
                groups.append((("q", "k", "v"), "qkv_fused"))
            if spec.arch in ("llama", "gemma"):
                groups.append((("gate", "up"), "gateup_fused"))
            for names, fkey in groups:
                entry = try_fuse_tp(bp, names, li)
                if entry is not None:
                    lpd[fkey], spd[fkey] = entry
                    handled.update(names)
        for key, val in bp.items():
            if key in handled:
                continue
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
                        axis: str = "tp", int8_cache: bool = False,
                        fuse: bool = False, a8: bool = False):
    """(local_params, step): step(params, cache, token) -> (logits, cache)
    with every packed matmul running per-shard inside shard_map and one
    psum per residual projection. int8_cache=True expects a
    KVCache.init(dtype=int8) cache (scale planes head-sharded); fuse/a8
    enable the fast serving config (shard-interleaved q/k/v + gate/up
    fusion, dynamic int8 activations) under TP."""
    tp = mesh.shape[axis]
    local, pspecs = tp_local_view(spec, params, tp, axis, fuse=fuse, a8=a8)
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
                    axis: str = "tp", fuse: bool = False, a8: bool = False):
    """(local_params, fwd): fwd(params, ids) -> logits, cache-less forward
    (PPL eval path) under shard_map TP."""
    tp = mesh.shape[axis]
    local, pspecs = tp_local_view(spec, params, tp, axis, fuse=fuse, a8=a8)

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
