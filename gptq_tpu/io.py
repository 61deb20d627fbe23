"""Packed-checkpoint save/load.

Counterpart of the reference's `--save` (torch.save of packed buffers,
reference: opt.py:719-721) and `load_quant3` skeleton+state_dict load
(reference: opt.py:375-402). Format: one .npz of flat key->array pairs plus
a JSON header carrying the ArchSpec, QuantConfig and per-tensor metadata —
self-describing and dependency-free.

A layer-indexed `resume` journal is also written during quantization so an
interrupted run can restart at the first un-quantized layer (improvement
noted in SURVEY.md §5: the reference has no mid-quantization resume).
"""

from __future__ import annotations

import dataclasses
import json
import os

import jax.numpy as jnp
import ml_dtypes
import numpy as np

from gptq_tpu.config import QuantConfig
from gptq_tpu.models.common import ArchSpec
from gptq_tpu.ops.pack import PackedExperts, PackedWeight


def enable_compilation_cache() -> None:
    """Opt into jax's persistent compilation cache.

    The CLI, bench.py and finetune driver all build large programs (20-40 s
    compiles each on a relayed chip); executables round-trip through the
    cache across processes, so repeat invocations on the same model/shapes
    skip them. Directory comes from GPTQ_TPU_CACHE_DIR (default
    ~/.cache/gptq_tpu_jax). Best-effort: harmless when the backend cannot
    serialize executables."""
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("GPTQ_TPU_CACHE_DIR",
                           os.path.expanduser("~/.cache/gptq_tpu_jax")))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001
        pass


def _flatten(tree, prefix="", out=None, meta=None):
    out = {} if out is None else out
    meta = {} if meta is None else meta
    if tree is None:
        return out, meta
    if isinstance(tree, PackedWeight):
        meta[prefix] = {
            "packed": True, "bits": tree.bits, "K": tree.K, "N": tree.N,
            "groupsize": tree.groupsize, "fmt": tree.fmt,
            "n_words": len(tree.words),
        }
        for i, w in enumerate(tree.words):
            out[f"{prefix}.words{i}"] = np.asarray(w)
        for f in ("scale", "zoff", "alpha", "bias", "perm"):
            v = getattr(tree, f)
            if v is not None:
                out[f"{prefix}.{f}"] = np.asarray(v)
        return out, meta
    if isinstance(tree, PackedExperts):
        meta[prefix] = {
            "packed": True, "experts": True, "bits": tree.bits,
            "K": tree.K, "N": tree.N, "groupsize": tree.groupsize,
            "n_words": len(tree.words),
        }
        for i, w in enumerate(tree.words):
            out[f"{prefix}.words{i}"] = np.asarray(w)
        out[f"{prefix}.scale"] = np.asarray(tree.scale)
        out[f"{prefix}.zoff"] = np.asarray(tree.zoff)
        return out, meta
    if isinstance(tree, dict):
        for k, v in tree.items():
            _flatten(v, f"{prefix}.{k}" if prefix else k, out, meta)
        return out, meta
    if isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            _flatten(v, f"{prefix}.{i}", out, meta)
        return out, meta
    out[prefix] = np.asarray(tree)
    return out, meta


def save_checkpoint(path: str, spec: ArchSpec, params: dict,
                    cfg: QuantConfig | None = None) -> None:
    flat, meta = _flatten(params)
    # numpy's npz format cannot represent bfloat16 (round-trips as a void
    # dtype that jax rejects); store the raw bits as uint16 and record the
    # keys so load restores the dtype
    bf16_keys = []
    for k, a in flat.items():
        if a.dtype == ml_dtypes.bfloat16:
            flat[k] = a.view(np.uint16)
            bf16_keys.append(k)
    header = {
        # packed-word layout generation: 2 = byteplane-subblock order
        # (ops/pack.py). Bump on any incompatible layout change so stale
        # checkpoints fail loudly instead of decoding scrambled weights.
        "pack_format": 2,
        "spec": dataclasses.asdict(spec),
        "config": dataclasses.asdict(cfg) if cfg else None,
        "packed": meta,
        "keys": sorted(flat.keys()),
        "bf16_keys": sorted(bf16_keys),
    }
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path if path.endswith(".npz") else path + ".npz",
             __header__=np.frombuffer(json.dumps(header).encode(), dtype=np.uint8),
             **flat)


def _set_path(tree, path_parts, value):
    node = tree
    for p in path_parts[:-1]:
        key = int(p) if isinstance(node, list) else p
        node = node[key]
    last = path_parts[-1]
    key = int(last) if isinstance(node, list) else last
    node[key] = value


def load_checkpoint(path: str):
    """Returns (spec, params, cfg|None)."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    z = np.load(path, allow_pickle=False)
    header = json.loads(bytes(z["__header__"]).decode())
    fmt = header.get("pack_format", 1)
    if fmt != 2 and header["packed"]:
        raise ValueError(
            f"checkpoint {path} uses packed-word layout v{fmt}; this build "
            f"reads v2 (byteplane order). Re-quantize and --save with this "
            f"build, or load the original fp weights instead.")
    spec = ArchSpec(**header["spec"])
    cfg = QuantConfig(**header["config"]) if header["config"] else None

    # rebuild the nested structure from flat keys
    params: dict = {"embed": {}, "layers": [], "final_ln": None, "lm_head": None}
    packed_meta = header["packed"]

    # collect plain arrays, grouping packed prefixes
    bf16_keys = set(header.get("bf16_keys", []))

    def arr(k):
        a = z[k]
        return a.view(ml_dtypes.bfloat16) if k in bf16_keys else a

    packed_fields: dict[str, dict] = {p: {} for p in packed_meta}
    plain: dict[str, np.ndarray] = {}
    for k in header["keys"]:
        owner = None
        for p in packed_meta:
            if k.startswith(p + "."):
                owner = p
                break
        if owner is not None:
            packed_fields[owner][k[len(owner) + 1:]] = arr(k)
        else:
            plain[k] = arr(k)

    def build_packed(prefix):
        m = packed_meta[prefix]
        f = packed_fields[prefix]
        words = tuple(jnp.asarray(f[f"words{i}"]) for i in range(m["n_words"]))
        if m.get("experts"):
            return PackedExperts(
                words=words, scale=jnp.asarray(f["scale"]),
                zoff=jnp.asarray(f["zoff"]), bits=m["bits"], K=m["K"],
                N=m["N"], groupsize=m["groupsize"])
        if m["fmt"] == "bcq" and m["n_words"] == 1:
            pass
        return PackedWeight(
            words=words,
            scale=jnp.asarray(f["scale"]) if "scale" in f else None,
            zoff=jnp.asarray(f["zoff"]) if "zoff" in f else None,
            alpha=jnp.asarray(f["alpha"]) if "alpha" in f else None,
            bias=jnp.asarray(f["bias"]) if "bias" in f else None,
            perm=jnp.asarray(f["perm"]) if "perm" in f else None,
            bits=m["bits"], K=m["K"], N=m["N"], groupsize=m["groupsize"],
            fmt=m["fmt"],
        )

    # ensure layer list capacity
    n_layers = spec.n_layers
    params["layers"] = [dict() for _ in range(n_layers)]

    def ensure_path(parts):
        node = params
        for i, p in enumerate(parts[:-1]):
            key = int(p) if isinstance(node, list) else p
            if isinstance(node, list):
                node = node[key]
            else:
                if key not in node or node[key] is None:
                    nxt = parts[i + 1]
                    node[key] = [dict() for _ in range(n_layers)] if nxt.isdigit() and key == "layers" else {}
                node = node[key]
        return node

    for k, v in plain.items():
        parts = k.split(".")
        node = ensure_path(parts)
        key = int(parts[-1]) if isinstance(node, list) else parts[-1]
        node[key] = jnp.asarray(v)

    for prefix in packed_meta:
        parts = prefix.split(".")
        node = ensure_path(parts)
        key = int(parts[-1]) if isinstance(node, list) else parts[-1]
        node[key] = build_packed(prefix)

    # normalize linears: every {"w": ...} dict gets a "b" key
    def add_b(node):
        if isinstance(node, dict):
            if "w" in node and "b" not in node:
                node["b"] = None
            for v in node.values():
                add_b(v)
        elif isinstance(node, list):
            for v in node:
                add_b(v)

    add_b(params)
    if "final_ln" not in params or params["final_ln"] == {}:
        params["final_ln"] = params.get("final_ln") or None
    if params.get("lm_head") == {}:
        params["lm_head"] = None
    return spec, params, cfg


def conform_params(template, loaded, strict: bool = True):
    """Rearrange `loaded` into `template`'s exact pytree structure.

    npz checkpoints cannot represent None leaves, and load_checkpoint's
    bias normalization can introduce keys the live tree lacks (e.g.
    "b": None on norm dicts) — either way a reloaded tree may differ
    STRUCTURALLY from the live params it replaces, and optimizer state
    built on the live tree then rejects it (finetune resume). Array
    leaves come from `loaded` (by matching dict keys / list positions);
    None/absent entries fall back to the template's value.

    Substituting a REAL array leaf from the template means the checkpoint
    is missing trained weights (wrong config for this --output_dir,
    truncated file): resuming from such a chimera of trained and random
    weights silently corrupts training, so with strict=True (default)
    that raises; strict=False downgrades it to a one-line warning listing
    the substituted paths."""
    subs: list[str] = []
    dropped: list[str] = []

    def count_leaves(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                count_leaves(v, f"{path}.{k}")
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                count_leaves(v, f"{path}[{i}]")
        elif node is not None:
            dropped.append(path.lstrip("."))

    def go(template, loaded, path):
        if template is None:
            count_leaves(loaded, path)
            return None
        if isinstance(template, dict):
            ld = loaded if isinstance(loaded, dict) else {}
            for k in ld:
                if k not in template:
                    count_leaves(ld[k], f"{path}.{k}")
            return {k: go(v, ld.get(k), f"{path}.{k}")
                    for k, v in template.items()}
        if isinstance(template, (list, tuple)):
            lt = loaded if isinstance(loaded, (list, tuple)) else []
            for i in range(len(template), len(lt)):
                count_leaves(lt[i], f"{path}[{i}]")
            return type(template)(
                [go(v, lt[i] if i < len(lt) else None, f"{path}[{i}]")
                 for i, v in enumerate(template)])
        if loaded is None:
            subs.append(path.lstrip("."))
            return template
        return loaded

    out = go(template, loaded, "")
    problems = []
    if subs:
        head = ", ".join(subs[:5]) + (" …" if len(subs) > 5 else "")
        problems.append(f"missing {len(subs)} weight leaves the live model "
                        f"has ({head})")
    if dropped:
        head = ", ".join(dropped[:5]) + (" …" if len(dropped) > 5 else "")
        problems.append(f"carries {len(dropped)} weight leaves the live "
                        f"model lacks ({head})")
    if problems:
        msg = ("checkpoint " + " and ".join(problems)
               + " — structure mismatch (different model config, or a "
                 "truncated file)")
        if strict:
            raise ValueError(msg)
        print(f"WARNING: {msg}")
    return out
