"""Sequential layer-by-layer quantization pipeline (arch-generic).

TPU-native redesign of the reference's per-arch `X_sequential` drivers
(reference: opt.py:30-228, llama.py:60-160, bloom.py, gemma.py). The torch
version streams layers CPU<->GPU and uses forward hooks; here each layer's
calibration is ONE jitted program: a `lax.scan` over calibration samples
that runs the block forward, captures every linear's input functionally and
folds it into that linear's Hessian on the fly — no activation stash, no
hooks.

true-sequential sub-block ordering (reference: llama.py:97-105) re-captures
Hessians per group after the previous group is quantized — the reference's
mis-indentation bug (llama.py:106-110, only the last subset quantized) is
intentionally NOT replicated.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from gptq_tpu.config import MixedPrecision, QuantConfig
from gptq_tpu.models.common import ArchSpec, block_forward, build_mask, embed_forward
from gptq_tpu.models.registry import get_arch
from gptq_tpu.ops.pack import PackedWeight, pack_bcq, pack_quantized
from gptq_tpu.quant.bcq import quantize_shift
from gptq_tpu.quant.gptq import SolverConfig, gptq_quantize, hessian_init, hessian_update
from gptq_tpu.quant.rtn import bcq_rtn_weight, rtn_quantize_weight


def solver_config_for(cfg: QuantConfig, bits: int, columnwise: bool | None = None) -> SolverConfig:
    """Map the CLI surface onto a SolverConfig (reference dispatch:
    opt.py:111-175 quantizer-selection matrix)."""
    columnwise = cfg.columnwise if columnwise is None else columnwise
    if cfg.non_linear:
        mode = "nonlinear"
    elif columnwise:
        mode = "columnwise"
    elif cfg.lut_eval:
        mode = "lut"
    else:
        mode = "uniform"
    return SolverConfig(
        mode=mode,
        bits=bits,
        blocksize=cfg.blocksize,
        percdamp=cfg.percdamp,
        groupsize=cfg.groupsize,
        actorder=cfg.act_order,
        static_groups=cfg.static_groups,
        sym=cfg.sym,
        trits=cfg.trits,
        mse=cfg.mse,
        bcq_rounds=cfg.bcq_round,
        use_bst=cfg.use_bst,
        apot_nums=cfg.apot_nums,
        hyperbits=cfg.hyperbits if not (cfg.layermix or cfg.linearmix) else bits + 2,
        explore_bits=cfg.exploreBits,
        explore_split=cfg.exploreSplit,
    )


@partial(jax.jit, static_argnames=("spec", "names", "capture"))
def _layer_scan_impl(spec: ArchSpec, bp: dict, inps: jax.Array,
                     positions: jax.Array, mask: jax.Array, names: tuple,
                     capture: bool = True):
    """Scan over calibration samples: returns (outs, hessian states per name).

    inps: (nsamples, T, hidden). Hessians accumulate exactly as the
    reference's add_batch (per-sample rescale, reference: gptq.py:59-65)."""
    arch = get_arch(spec.arch)
    key_of = arch.linears

    def cols_of(name):
        return bp[key_of[name]]["w"].shape[1]

    h0 = {n: hessian_init(cols_of(n)) for n in names}

    def step(hstates, inp):
        out, _, caps = block_forward(
            spec, bp, inp[None], positions=positions, mask=mask, capture=True
        )
        new_h = {n: hessian_update(hstates[n], caps[n]) for n in names}
        return new_h, out[0]

    if capture and names:
        hstates, outs = jax.lax.scan(step, h0, inps)
    else:
        def fwd(inp):
            out, _, _ = block_forward(spec, bp, inp[None], positions=positions, mask=mask)
            return out[0]
        outs = jax.lax.map(fwd, inps)
        hstates = h0
    return outs, hstates


# jit with the layer params as an ARGUMENT, never a closure: closed-over
# multi-GB weight tensors ride inside the compile request, which the
# relayed backend's compile service rejects outright at 7B layer sizes
# (HTTP 413) — and as arguments the program compiles ONCE and is reused
# by every layer (shapes match), instead of re-staging per layer.
_layer_scan = jax.jit(_layer_scan_impl,
                      static_argnames=("spec", "names", "capture"))


@dataclass
class QuantResult:
    quantizers: dict  # module path -> dict of packing params
    losses: dict      # module path -> float proxy loss
    times: dict


def quantize_model(
    spec: ArchSpec,
    params: dict,
    calib_ids: jax.Array,  # (nsamples, seqlen) token ids
    cfg: QuantConfig,
    mixed: MixedPrecision | None = None,
    log: Callable[[str], None] = print,
    resume_dir: str | None = None,
) -> QuantResult:
    """Quantize every per-block linear in place (params mutated).

    Mirrors the reference control flow (reference: opt.py:30-228): embed the
    calibration set once, then per layer: capture -> solve -> write back ->
    replay for next-layer inputs.

    With `resume_dir`, a per-layer journal is written so an interrupted run
    restarts at the first unfinished layer (the reference has no
    mid-quantization resume — SURVEY.md §5); calibration inputs are rebuilt
    by replaying the already-quantized prefix.
    """
    arch = get_arch(spec.arch)
    nsamples, T = calib_ids.shape
    positions = jnp.arange(T)[None]
    mask = build_mask(spec, T, T)

    # embed params pass as an argument (NOT a closure: a closed-over 7B
    # embedding table overflows the relayed compile service's request
    # body — see _layer_scan)
    embed = jax.jit(
        lambda ep, ids: embed_forward(
            spec, {"embed": ep}, ids,
            jnp.broadcast_to(jnp.arange(T), ids.shape))
    )
    inps = jnp.stack([embed(params["embed"], calib_ids[j: j + 1])[0]
                      for j in range(nsamples)])

    if cfg.true_sequential:
        groups = [tuple(g) for g in arch.seq_groups]
    else:
        groups = [tuple(arch.linears.keys())]

    layer_prefix = arch.hf_prefix
    quantizers: dict[str, Any] = {}
    losses: dict[str, float] = {}
    times: dict[str, float] = {}

    start_layer = 0
    if resume_dir is not None:
        start_layer = _resume_load(resume_dir, spec, params, quantizers, losses, log)
        for i in range(start_layer):
            inps, _ = _layer_scan(spec, params["layers"][i], inps, positions,
                                  mask, (), capture=False)

    # host-resident params stream per layer, mirroring the reference's
    # CPU<->GPU layer streaming (reference: opt.py:103-224): leaves that are
    # numpy arrays are staged to device for the layer's work, and quantized
    # weights land back on host.
    def _is_host(bp):
        return isinstance(bp[next(iter(arch.linears.values()))]["w"], np.ndarray)

    for i, host_bp in enumerate(params["layers"]):
        if i < start_layer:
            continue
        offload = _is_host(host_bp)
        bp = jax.tree.map(jnp.asarray, host_bp) if offload else host_bp
        t_layer = time.time()
        for gi, names in enumerate(groups):
            # keep only linears this layer actually has: MoE layers carry
            # router/experts instead of gate/up/down (those serve dense,
            # models/moe.py) — quantize the attention linears around them
            names = tuple(n for n in names if arch.linears[n] in bp)
            if not names:
                continue
            if cfg.nearest or cfg.bcq:
                # Hessian-free paths: no capture needed
                hstates = {}
            else:
                _, hstates = _layer_scan(spec, bp, inps, positions, mask, names)
            for name in names:
                key = arch.linears[name]
                W = bp[key]["w"]
                full_name = f"{layer_prefix}.{i}.{name}"
                bits = cfg.wbits
                columnwise = cfg.columnwise
                if mixed is not None:
                    bits = mixed.bits_for(i, name, bits)
                    columnwise = mixed.columnwise_for(i, name, columnwise)
                t0 = time.time()
                if cfg.nearest:
                    Q = rtn_quantize_weight(W, bits, sym=cfg.sym, mse=cfg.mse,
                                            groupsize=cfg.groupsize)
                    bp[key]["w"] = Q
                    quantizers[full_name] = {"mode": "rtn", "bits": bits}
                elif cfg.bcq:
                    Q = bcq_rtn_weight(W, bits, rounds=cfg.bcq_round,
                                       groupsize=cfg.groupsize,
                                       apot_nums=cfg.apot_nums, use_bst=cfg.use_bst)
                    bp[key]["w"] = Q
                    quantizers[full_name] = {"mode": "bcq_rtn", "bits": bits}
                else:
                    scfg = solver_config_for(cfg, bits, columnwise)
                    H, _, mean_input = hstates[name]
                    out = gptq_quantize(W, H, scfg, mean_input)
                    bp[key]["w"] = out["Q"].astype(W.dtype)
                    loss = float(out["loss"])
                    losses[full_name] = loss
                    q = {"mode": scfg.mode, "bits": bits, "groupsize": cfg.groupsize,
                         "perm": out["perm"] if scfg.actorder else None}
                    if "scale" in out:
                        q["scale"], q["zero"] = out["scale"], out["zero"]
                    if "alpha" in out:
                        q["alpha"] = out["alpha"]
                    quantizers[full_name] = q
                    times[full_name] = time.time() - t0
                    log(f"layer {i} {name}: loss={losses.get(full_name, 0):.1f} "
                        f"t={times[full_name]:.2f}s")
        # replay with quantized weights -> inputs for the next layer
        # (reference: opt.py:216-224)
        inps, _ = _layer_scan(spec, bp, inps, positions, mask, (), capture=False)
        if offload:
            for key in arch.linears.values():
                host_bp[key]["w"] = np.asarray(bp[key]["w"])
            del bp
        log(f"layer {i} done in {time.time() - t_layer:.2f}s")
        if resume_dir is not None:
            _resume_save(resume_dir, i, host_bp, quantizers, losses,
                         layer_prefix, arch)

    return QuantResult(quantizers=quantizers, losses=losses, times=times)


def _resume_save(resume_dir, layer_idx, bp, quantizers, losses, prefix, arch):
    import os
    import pickle

    os.makedirs(resume_dir, exist_ok=True)
    blob = {
        "weights": {k: np.asarray(bp[k]["w"]) for k in arch.linears.values()},
        "quantizers": {k: jax.tree.map(np.asarray, v)
                       for k, v in quantizers.items()
                       if k.startswith(f"{prefix}.{layer_idx}.")},
        "losses": {k: v for k, v in losses.items()
                   if k.startswith(f"{prefix}.{layer_idx}.")},
    }
    tmp = os.path.join(resume_dir, f"layer_{layer_idx}.pkl.tmp")
    with open(tmp, "wb") as f:
        pickle.dump(blob, f)
    os.replace(tmp, os.path.join(resume_dir, f"layer_{layer_idx}.pkl"))


def _resume_load(resume_dir, spec, params, quantizers, losses, log) -> int:
    import os
    import pickle

    arch = get_arch(spec.arch)
    i = 0
    while os.path.exists(os.path.join(resume_dir, f"layer_{i}.pkl")):
        with open(os.path.join(resume_dir, f"layer_{i}.pkl"), "rb") as f:
            blob = pickle.load(f)
        bp = params["layers"][i]
        for k, w in blob["weights"].items():
            bp[k]["w"] = jnp.asarray(w, bp[k]["w"].dtype)
        quantizers.update(blob["quantizers"])
        losses.update(blob["losses"])
        i += 1
    if i:
        log(f"resumed: layers 0..{i-1} already quantized")
    return i


def add_actquant(
    spec: ArchSpec,
    params: dict,
    calib_ids: jax.Array,
    bits: int,
    sym: bool = False,
) -> None:
    """Fit per-input-feature activation quantizers for every block linear
    (reference: add_actquant + Quantizer.find_params(weight=False),
    zeroShot/models/quant.py:143-167). Stores {scale, zero, maxq} under each
    linear's "act_q" key; linear_apply fake-quantizes its input thereafter."""
    from gptq_tpu.quant.uniform import find_params

    arch = get_arch(spec.arch)
    nsamples, T = calib_ids.shape
    positions = jnp.arange(T)[None]
    mask = build_mask(spec, T, T)
    embed = jax.jit(
        lambda ids: embed_forward(spec, params, ids,
                                  jnp.broadcast_to(jnp.arange(T), ids.shape))
    )
    inps = jnp.stack([embed(calib_ids[j : j + 1])[0] for j in range(nsamples)])
    names = tuple(arch.linears.keys())
    maxq = (1 << bits) - 1
    for bp in params["layers"]:
        # capture one representative batch of inputs per linear
        _, _, caps = block_forward(
            spec, bp, inps[:1], positions=positions, mask=mask, capture=True
        )
        for name in names:
            key = arch.linears[name]
            p = find_params(caps[name], bits=bits, perchannel=True, sym=sym,
                            weight=False)
            bp[key]["act_q"] = {"scale": p.scale[0], "zero": p.zero[0],
                                "maxq": maxq}
        inps, _ = _layer_scan(spec, bp, inps, positions, mask, (), capture=False)


def pack_model(spec: ArchSpec, params: dict, quantizers: dict,
               cfg: QuantConfig, tp: int = 1) -> dict:
    """Swap quantized dense linears for PackedWeight serving formats —
    the make_quant3/pack counterpart (reference: opt.py:362-373).

    Uniform grids pack to blocked bit-fields; lut/BCQ packs bitplanes.
    Layers without an entry stay dense. `tp` pads stored dims so the
    shard_map tensor-parallel path can slice them (parallel/tp.py)."""
    arch = get_arch(spec.arch)
    for i, bp in enumerate(params["layers"]):
        for name, key in arch.linears.items():
            full_name = f"{arch.hf_prefix}.{i}.{name}"
            q = quantizers.get(full_name)
            if q is None:
                continue
            W = bp[key]["w"]
            if q["mode"] == "uniform" and q["bits"] in (1, 2, 3, 4, 8):
                pw = pack_quantized(
                    W.astype(jnp.float32), q["scale"], q["zero"], q["bits"],
                    groupsize=q.get("groupsize", -1),
                    perm=q.get("perm"),
                    actorder=q.get("perm") is not None,
                    tp=tp,
                )
                bp[key]["w"] = pw
            elif q["mode"] == "lut":
                from gptq_tpu.quant.bcq import bcq_quantize

                gs = q.get("groupsize", -1)
                _, B = bcq_quantize(W.astype(jnp.float32), q["alpha"], groupsize=gs)
                bp[key]["w"] = pack_bcq(B, q["alpha"], groupsize=gs, tp=tp)
    return params


def quantize_lm_head(spec: ArchSpec, params: dict, bits: int = 8,
                     tp: int = 1) -> bool:
    """Opt-in lm_head quantization (beyond reference: the reference always
    serves the output projection dense). Per-channel RTN — the head has no
    calibration Hessian in the sequential pipeline — then packed for the
    fused kernels. 8-bit is ~lossless; at decode the head matvec is the
    single largest non-layer cost (~0.35 ms/token at llama-7B scale in
    bf16). No-op (returns False) for tied embeddings."""
    from gptq_tpu.quant.uniform import find_params, quantize_uniform

    lm = params.get("lm_head")
    if lm is None or lm.get("w") is None or isinstance(lm["w"], PackedWeight):
        return False
    W = lm["w"].astype(jnp.float32)  # (vocab, hidden)
    p = find_params(W, bits=bits, perchannel=True, weight=True)
    Q = quantize_uniform(W, p.scale, p.zero, (1 << bits) - 1)
    scale = p.scale.reshape(1, -1)  # (1, vocab)
    zero = p.zero.reshape(1, -1)
    lm["w"] = pack_quantized(Q, scale, zero, bits, groupsize=-1, tp=tp)
    return True
