"""Device mesh + sharding rules: tensor parallel over ICI, data parallel
over DCN.

The reference's only multi-device inference path is naive layer placement
with explicit activation movement (reference: opt.py:404-438 MoveModule).
Here layers stay resident and weights are tensor-sharded with
`jax.sharding.NamedSharding` (SURVEY.md §2.3): q/k/v/gate/up split the
output dim across "tp", o/down/fc2 split the input dim, so XLA inserts one
all-reduce per attention/MLP epilogue riding ICI; the batch dim of
activations splits across "dp" (DCN). Packed low-bit weights shard the same
way — the packed word arrays carry K/P x N layout, so the word axis follows
K and the lane axis follows N.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gptq_tpu.models.common import ArchSpec
from gptq_tpu.ops.pack import PackedWeight


def make_mesh(tp: int = 1, dp: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = tp * dp
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


# rule key -> (PartitionSpec for dense (out,in) weight, spec for bias)
# col = split output features over tp; row = split input features over tp
_COL = P("tp", None)
_ROW = P(None, "tp")
_REP = P()


def _block_rules(spec: ArchSpec) -> dict:
    if spec.arch == "bloom":
        return {"qkv": "col", "o": "row", "fc1": "col", "fc2": "row"}
    if spec.arch in ("llama", "gemma"):
        return {"q": "col", "k": "col", "v": "col", "o": "row",
                "gate": "col", "up": "col", "down": "row"}
    return {"q": "col", "k": "col", "v": "col", "o": "row",
            "fc1": "col", "fc2": "row"}


def sharding_rules(spec: ArchSpec) -> dict:
    return _block_rules(spec)


def _dense_spec(kind: str) -> P:
    return _COL if kind == "col" else _ROW


def _bias_spec(kind: str) -> P:
    return P("tp") if kind == "col" else _REP


def _packed_specs(pw: PackedWeight, kind: str) -> PackedWeight:
    """PartitionSpecs for each PackedWeight field.

    words are (K/P, N) (uniform) or (bits, K/32, N) (bcq): the N axis is
    last, the K axis is the word axis. col-kind shards N, row-kind shards K.
    """
    if pw.fmt == "bcq":
        wspec = P(None, None, "tp") if kind == "col" else P(None, "tp", None)
        alpha = P(None, None, "tp") if kind == "col" else P("tp", None, None)
        return PackedWeight(
            words=(wspec,), alpha=alpha,
            bias=P("tp") if (kind == "col" and pw.bias is not None) else (
                _REP if pw.bias is not None else None),
            perm=_REP if pw.perm is not None else None,
            scale=None, zoff=None,
            bits=pw.bits, K=pw.K, N=pw.N, groupsize=pw.groupsize, fmt=pw.fmt,
        )
    wspec = P(None, "tp") if kind == "col" else P("tp", None)
    gspec = P(None, "tp") if kind == "col" else P("tp", None)
    return PackedWeight(
        words=tuple(wspec for _ in pw.words),
        scale=gspec, zoff=gspec,
        bias=P("tp") if (kind == "col" and pw.bias is not None) else (
            _REP if pw.bias is not None else None),
        perm=_REP if pw.perm is not None else None,
        alpha=None,
        bits=pw.bits, K=pw.K, N=pw.N, groupsize=pw.groupsize, fmt=pw.fmt,
    )


def param_specs(spec: ArchSpec, params: dict) -> dict:
    """PartitionSpec pytree matching `params`."""
    rules = _block_rules(spec)

    def lin_spec(lin: dict, kind: str):
        w = lin["w"]
        if isinstance(w, PackedWeight):
            wspec = _packed_specs(w, kind)
        else:
            wspec = _dense_spec(kind)
        out = {"w": wspec}
        if "b" in lin:
            out["b"] = _bias_spec(kind) if lin["b"] is not None else None
        if "act_q" in lin:
            out["act_q"] = {k: _REP for k in lin["act_q"]}
        return out

    def norm_spec(p):
        return None if p is None else {k: _REP for k in p}

    layers = []
    for bp in params["layers"]:
        ls: dict[str, Any] = {}
        for key, val in bp.items():
            if key in rules:
                ls[key] = lin_spec(val, rules[key])
            elif key == "experts":
                # MoE expert stacks shard their expert dim over the tensor
                # axis (GSPMD expert parallelism: XLA partitions the
                # dispatch/combine einsums and inserts the collectives);
                # _fit_spec drops it back to replication if E % tp != 0
                ls[key] = {k: P("tp") for k in val}
            else:
                ls[key] = norm_spec(val)
        layers.append(ls)

    embed = {}
    for k, v in params["embed"].items():
        if v is None:
            embed[k] = None
        elif k == "tokens":
            embed[k] = P("tp", None)  # vocab-sharded
        elif k == "positions":
            embed[k] = _REP
        elif k in ("project_in", "project_out"):
            embed[k] = {"w": _REP, "b": _REP if v.get("b") is not None else None}
        else:  # bloom embed layernorm
            embed[k] = {kk: _REP for kk in v}

    out = {
        "embed": embed,
        "layers": layers,
        "final_ln": norm_spec(params.get("final_ln")),
    }
    lm = params.get("lm_head")
    out["lm_head"] = None if lm is None else {
        "w": P("tp", None), "b": None if lm.get("b") is None else P("tp")
    }
    return out


def _fit_spec(x: jax.Array, pspec: P, mesh: Mesh) -> P:
    """Drop axis shardings whose dimension doesn't divide evenly (e.g. an
    odd vocab size under tp) — replication is always correct."""
    dims = []
    for i, axis in enumerate(pspec):
        if axis is None:
            dims.append(None)
            continue
        size = mesh.shape[axis]
        dims.append(axis if x.shape[i] % size == 0 else None)
    return P(*dims)


def shard_params(spec: ArchSpec, params: dict, mesh: Mesh) -> dict:
    """Place params on the mesh with TP shardings (replicated over dp)."""
    specs = param_specs(spec, params)

    def place(x, s):
        if x is None:
            return None
        pspec = s if isinstance(s, P) else P()
        pspec = _fit_spec(x, pspec, mesh)
        return jax.device_put(x, NamedSharding(mesh, pspec))

    return jax.tree.map(
        place, params, specs,
        is_leaf=lambda x: x is None or isinstance(x, jax.Array),
    )
