"""Mixture-of-experts FFN (Mixtral-style routed GLU experts) with a
GShard-style static-capacity dispatch, built for expert parallelism.

The reference has no MoE (its four model families are dense); this module
extends the llama-family decoder with the routed-FFN variant those models'
descendants use. The design is TPU-first throughout:

* Static shapes: routing uses the GShard dispatch formulation — every
  expert processes exactly C = ceil(top_k * tokens * capacity_factor / E)
  token slots, so the whole MoE layer is three einsums between two
  one-hot projections and XLA sees fixed-shape MXU work regardless of the
  routing pattern. Tokens past an expert's capacity are dropped for that
  expert (their combine weight is zero), the standard GShard/Switch
  overflow semantics.
* Slot-major priority: all tokens' first choice is placed before any
  token's second choice, so capacity pressure drops k=2 assignments
  before k=1 assignments.
* Sequence parallelism caveat: under parallel/sp.py each sp chunk routes
  its OWN tokens, so per-chunk capacity differs from the flat model's
  whole-sequence capacity; with a dropless spec (capacity factor E/k —
  what converted HF Mixtral checkpoints get) chunked and flat routing
  agree exactly.
* Expert parallelism (parallel/ep.py): activations are replicated (the
  same regime as shard_map TP), experts shard over an "ep" mesh axis.
  Each device computes the full router but dispatches only into its local
  expert slice, then one psum over the axis merges the combined outputs —
  no all_to_all needed in the replicated-activation regime; on a pod the
  psum rides ICI.

Quantization note: the GPTQ pipeline quantizes the attention linears of
MoE layers; expert stacks serve dense by default or int8-RTN via
quantize_experts() (codes + per-row scales, dequant folded into the
expert einsums — 2x less expert HBM than bf16). The reference's
capability surface has no MoE to quantize; per-expert sub-byte packed
serving (ops/pack.py formats) is future work.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def expert_capacity(spec, n_tokens: int) -> int:
    """Static per-expert token slots for a batch of n_tokens rows."""
    c = int(-(-spec.expert_top_k * n_tokens * spec.expert_capacity
              // spec.n_experts))
    return max(1, min(c, n_tokens))


def route(spec, router_w: jax.Array, x: jax.Array):
    """(dispatch, combine, aux) for x of shape (N, D).

    dispatch: (N, E, C) 0/1 — token n occupies slot c of expert e.
    combine: (N, E, C) f32 — dispatch scaled by the (renormalized) top-k
    router probability, zero for dropped assignments.
    aux: scalar Switch-Transformer load-balancing loss
    E * sum_e(f_e * P_e) — f_e the fraction of tokens whose FIRST choice
    is expert e, P_e the mean router probability of e. Equals 1.0 under
    perfectly uniform routing; training adds it scaled by a small weight
    so the router keeps experts balanced instead of collapsing.
    """
    N = x.shape[0]
    E = spec.n_experts
    k = spec.expert_top_k
    C = expert_capacity(spec, N)
    logits = x.astype(jnp.float32) @ router_w.astype(jnp.float32).T  # (N, E)
    probs = jax.nn.softmax(logits, axis=-1)
    topv, topi = jax.lax.top_k(probs, k)  # (N, k)
    # Mixtral convention: the k selected probabilities renormalize to 1
    topv = topv / jnp.sum(topv, axis=-1, keepdims=True)
    onehot = jax.nn.one_hot(topi, E, dtype=jnp.float32)  # (N, k, E)
    # slot-major order: row-major over (k, N) places every token's first
    # choice before any second choice
    flat = onehot.transpose(1, 0, 2).reshape(k * N, E)
    pos = jnp.cumsum(flat, axis=0) - flat  # position within the expert
    kept = flat * (pos < C)
    slot = jax.nn.one_hot(pos.astype(jnp.int32), C, dtype=jnp.float32)
    dc = kept[..., None] * slot  # (kN, E, C)
    dc = dc.reshape(k, N, E, C)
    dispatch = jnp.sum(dc, axis=0)
    combine = jnp.sum(dc * topv.T[..., None, None], axis=0)
    aux = E * jnp.sum(jnp.mean(onehot[:, 0], axis=0)
                      * jnp.mean(probs, axis=0))
    return dispatch, combine, aux


def route_weights(spec, router_w: jax.Array, x: jax.Array):
    """(w, aux) for the DROPLESS path: w (N, E) carries each token's
    renormalized top-k probability for selected experts (0 elsewhere) —
    no (N, E, C) capacity tensors. Same aux as route()."""
    E = spec.n_experts
    k = spec.expert_top_k
    logits = x.astype(jnp.float32) @ router_w.astype(jnp.float32).T
    probs = jax.nn.softmax(logits, axis=-1)
    topv, topi = jax.lax.top_k(probs, k)
    topv = topv / jnp.sum(topv, axis=-1, keepdims=True)
    onehot = jax.nn.one_hot(topi, E, dtype=jnp.float32)  # (N, k, E)
    w = jnp.sum(onehot * topv[..., None], axis=1)  # (N, E)
    aux = E * jnp.sum(jnp.mean(onehot[:, 0], axis=0)
                      * jnp.mean(probs, axis=0))
    return w, aux


def moe_ffn(spec, p: dict, x: jax.Array, ep_axis: str | None = None,
            ep_size: int = 1, activation=None,
            aux_out: list | None = None) -> jax.Array:
    """Routed GLU expert FFN of x (B, T, D) -> (B, T, D).

    p carries {"router": {"w": (E, D)}, "experts": {"gate": (E, F, D),
    "up": (E, F, D), "down": (E, D, F)}}. With `ep_axis` (inside
    shard_map) the expert arrays are the LOCAL (E/ep, ...) slice; the
    router weight stays replicated and the partial outputs psum over the
    axis. `aux_out`, when a list, collects this layer's load-balancing
    loss (trace-time side channel, like the capture machinery).

    Two computation paths, chosen statically from the spec's capacity:
    * capacity-bound (C < N): the GShard dispatch/combine einsums —
      right for training micro-batches, where C bounds per-expert work.
    * dropless (C >= N — what converted HF Mixtral checkpoints get): a
      lax.scan over experts. The GShard dispatch tensors are (N, E, C);
      at C = N that is O(N^2 * E) memory/flops of pure routing overhead
      for a long prefill, so instead each expert's GLU runs on the full
      token set weighted by its (N,) routing column — E/k times the
      routed FFN flops, but linear memory and no giant one-hots.
    """
    B, T, D = x.shape
    N = B * T
    xt = x.reshape(N, D)
    ex = p["experts"]
    f32 = jnp.float32
    cdt = x.dtype
    el = spec.n_experts // ep_size if (
        ep_axis is not None and ep_size > 1) else spec.n_experts
    dropless = expert_capacity(spec, N) >= N

    if dropless:
        w, aux = route_weights(spec, p["router"]["w"], xt)
    else:
        dispatch, combine, aux = route(spec, p["router"]["w"], xt)
    if aux_out is not None:
        aux_out.append(aux)
    if ep_axis is not None and ep_size > 1:
        e0 = jax.lax.axis_index(ep_axis) * el
        if dropless:
            w = jax.lax.dynamic_slice_in_dim(w, e0, el, axis=1)
        else:
            dispatch = jax.lax.dynamic_slice_in_dim(dispatch, e0, el,
                                                    axis=1)
            combine = jax.lax.dynamic_slice_in_dim(combine, e0, el, axis=1)

    from gptq_tpu.ops.pack import PackedExperts

    if isinstance(ex["gate"], PackedExperts):
        # sub-byte packed expert bank (pack_experts): 2-4x less expert
        # HBM than int8/bf16, served through the batched-expert Pallas
        # grid (small N) or per-expert fused kernels (prefill)
        if not dropless:
            raise ValueError(
                "packed expert banks serve the dropless path (C >= N); "
                "capacity-bound GShard routing is a training regime — "
                "keep dense/int8 stacks there")
        y = _packed_expert_ffn(ex, xt, w, activation,
                               top_k=spec.expert_top_k)
        if ep_axis is not None and ep_size > 1:
            y = jax.lax.psum(y, ep_axis)
        return y.reshape(B, T, D).astype(x.dtype)

    # expert matmuls run in the weights' NATIVE dtype (bf16 on the serving
    # path — full-rate MXU, no transient f32 copy of the expert stacks)
    # with f32 accumulation; only router/softmax/combine math stays f32.
    # int8 RTN-quantized stacks (quantize_experts) dequantize inline —
    # XLA fuses the cast+scale into the dot, so the 2-4x HBM saving is
    # realized without a separate materialization.
    int8w = ex["gate"].dtype == jnp.int8

    def deq(codes, scale):
        if int8w:
            return codes.astype(cdt) * scale[..., None].astype(cdt)
        return codes

    if dropless:
        # one expert at a time: (N, F) intermediate instead of (E, N, F)
        xs = (ex["gate"], ex["up"], ex["down"], w.T)
        if int8w:
            xs = xs + (ex["gate_scale"], ex["up_scale"], ex["down_scale"])

        def body(acc, xe):
            gw, uw, dw, wcol = xe[:4]
            gw = deq(gw, xe[4] if int8w else None)
            uw = deq(uw, xe[5] if int8w else None)
            dw = deq(dw, xe[6] if int8w else None)
            g = jnp.einsum("nd,fd->nf", xt, gw, preferred_element_type=f32)
            u = jnp.einsum("nd,fd->nf", xt, uw, preferred_element_type=f32)
            inner = (activation(g) if activation is not None
                     else jax.nn.silu(g)) * u
            ye = jnp.einsum("nf,df->nd", inner.astype(cdt), dw,
                            preferred_element_type=f32)
            return acc + wcol[:, None] * ye, None

        # derive the accumulator from xt so it inherits any shard_map
        # varying-axis annotations (a fresh zeros literal is non-varying
        # and trips the VMA checker under pipeline parallelism)
        y, _ = jax.lax.scan(body, (xt * 0).astype(f32), xs)
    else:
        def ew(name):
            return deq(ex[name], ex.get(name + "_scale"))

        xe = jnp.einsum("nec,nd->ecd", dispatch.astype(cdt), xt,
                        preferred_element_type=f32).astype(cdt)
        g = jnp.einsum("ecd,efd->ecf", xe, ew("gate"),
                       preferred_element_type=f32)
        u = jnp.einsum("ecd,efd->ecf", xe, ew("up"),
                       preferred_element_type=f32)
        inner = (activation(g) if activation is not None
                 else jax.nn.silu(g)) * u
        ye = jnp.einsum("ecf,edf->ecd", inner.astype(cdt), ew("down"),
                        preferred_element_type=f32)
        y = jnp.einsum("nec,ecd->nd", combine, ye)
    if ep_axis is not None and ep_size > 1:
        y = jax.lax.psum(y, ep_axis)
    return y.reshape(B, T, D).astype(x.dtype)


def _packed_expert_ffn(ex: dict, xt: jax.Array, w: jax.Array,
                       activation, top_k: int = 0) -> jax.Array:
    """Dropless routed GLU over a PackedExperts bank.

    xt: (N, D) tokens, w: (N, el) routing weights (this shard's expert
    columns). Three regimes:
    * N == 1 (single-token decode): only top_k routing weights are
      nonzero, so only those experts' weights are READ — dynamic expert
      views (one dynamic-slice on the bank's leading dim per selection)
      cut decode expert HBM to k/el of the bank; zero-weight selections
      (the token's experts live on another ep shard) contribute exact 0.
    * 1 < N <= 32: every projection as ONE batched-expert kernel launch
      (expert = leading grid dim — ops/qmatmul.expert_dequant_matmul).
    * larger N: per-expert fused launches so the (el, N, F)
      intermediates stay one expert wide."""
    from gptq_tpu.ops.qmatmul import dequant_matmul, expert_dequant_matmul

    gate_pe, up_pe, down_pe = ex["gate"], ex["up"], ex["down"]
    el = gate_pe.words[0].shape[0]
    N = xt.shape[0]
    cdt = xt.dtype
    if N == 1 and 0 < top_k < el:
        import os

        from gptq_tpu.ops.qmatmul import expert_dequant_matmul_select

        impl = os.environ.get(
            "GPTQ_TPU_MATMUL_IMPL",
            "pallas" if jax.default_backend() == "tpu" else "xla")
        kernel_sel = impl in ("pallas", "streamed")

        def mm(xx, pe, e):
            if kernel_sel:
                # scalar-prefetch select: the kernel reads the chosen
                # expert's blocks straight from the bank (no slice copy)
                return expert_dequant_matmul_select(xx, pe, e)
            return dequant_matmul(xx, pe.expert(e)).astype(jnp.float32)

        wv, wi = jax.lax.top_k(w[0], top_k)  # local routing weights
        y = jnp.zeros((1, down_pe.N), jnp.float32)
        for j in range(top_k):
            e = wi[j]
            g = mm(xt, gate_pe, e)
            u = mm(xt, up_pe, e)
            inner = (activation(g) if activation is not None
                     else jax.nn.silu(g)) * u
            ye = mm(inner.astype(cdt), down_pe, e)
            y = y + wv[j] * ye.astype(jnp.float32)
        return y
    if N <= 32:
        g = expert_dequant_matmul(xt, gate_pe)  # (el, N, F) f32
        u = expert_dequant_matmul(xt, up_pe)
        inner = (activation(g) if activation is not None
                 else jax.nn.silu(g)) * u
        ye = expert_dequant_matmul(inner.astype(cdt), down_pe)  # (el, N, D)
        return jnp.einsum("ne,end->nd", w, ye,
                          preferred_element_type=jnp.float32)
    y = jnp.zeros((N, down_pe.N), jnp.float32)
    for e in range(el):
        g = dequant_matmul(xt, gate_pe.expert(e)).astype(jnp.float32)
        u = dequant_matmul(xt, up_pe.expert(e)).astype(jnp.float32)
        inner = (activation(g) if activation is not None
                 else jax.nn.silu(g)) * u
        ye = dequant_matmul(inner.astype(cdt), down_pe.expert(e))
        y = y + w[:, e:e + 1] * ye.astype(jnp.float32)
    return y


def _rtn_expert_grids(W: jax.Array, bits: int, groupsize: int = -1):
    """Per-(expert, row[, group]) asymmetric min-max grids for an
    (E, F, D) stack — uniform find_params semantics (range clamped to
    include 0; reference quant.py:37-119). Returns scale/zero (E, ng, F)."""
    E, F, D = W.shape
    g = groupsize if groupsize > 0 else D
    ng = D // g
    maxq = (1 << bits) - 1
    Wg = W.reshape(E, F, ng, g)
    xmin = jnp.minimum(Wg.min(axis=-1), 0.0)
    xmax = jnp.maximum(Wg.max(axis=-1), 0.0)
    scale = (xmax - xmin) / maxq
    scale = jnp.where(scale <= 0, 1.0, scale)
    zero = jnp.round(-xmin / scale)
    return scale.transpose(0, 2, 1), zero.transpose(0, 2, 1)


def pack_experts(params: dict, bits: int = 4, groupsize: int = -1) -> None:
    """In-place sub-byte packing of every MoE layer's expert stacks into
    PackedExperts banks (the byteplane layout of ops/pack.py, stacked on
    a leading expert dim).

    Grids come from the GPTQ pass when gptq_quantize_experts(...,
    keep_grids=True) stashed them at matching bits (exact code recovery,
    like pipeline.pack_model reusing solver grids); otherwise per-row RTN
    min-max grids refit on the (possibly fake-quantized) dense values.
    Expert weight HBM drops to bits/16 of bf16 — the saving the dense
    linears already had, now where MoE weights are largest (E stacks per
    layer). Serving goes through the batched-expert Pallas grid
    (ops/qmatmul.expert_dequant_matmul)."""
    from gptq_tpu.ops.pack import PackedExperts, pack_expert_stack

    if bits not in (2, 3, 4, 8):
        raise ValueError(f"bits={bits} not in (2, 3, 4, 8)")
    for bp in params["layers"]:
        ex = bp.get("experts")
        if ex is None or isinstance(ex.get("gate"), PackedExperts):
            continue
        if ex["gate"].dtype == jnp.int8:
            raise ValueError(
                "expert stacks are already int8-compressed "
                "(quantize_experts); pack_experts needs the dense values "
                "— run it instead of, not after, the int8 compression")
        grids = ex.pop("_grids", None)
        grid_ok = (grids is not None and grids.get("bits") == bits
                   and grids.get("groupsize", -1) == groupsize)
        for name in ("gate", "up", "down"):
            W = jnp.asarray(ex[name], jnp.float32)  # (E, out, in)
            if grid_ok and name in grids:
                s, z = grids[name]["scale"], grids[name]["zero"]
            else:
                s, z = _rtn_expert_grids(W, bits, groupsize)
            ex[name] = pack_expert_stack(W, s, z, bits, groupsize)


def init_moe_params(spec, key: jax.Array, dtype=jnp.float32) -> dict:
    """Router + stacked expert weights for one decoder layer."""
    import numpy as np

    k1, k2, k3, k4 = jax.random.split(key, 4)
    E, D, F = spec.n_experts, spec.hidden, spec.ffn
    s = 0.4 / float(np.sqrt(D))
    sf = 0.4 / float(np.sqrt(F))
    return {
        "router": {"w": jax.random.normal(k1, (E, D), dtype) * s},
        "experts": {
            "gate": jax.random.normal(k2, (E, F, D), dtype) * s,
            "up": jax.random.normal(k3, (E, F, D), dtype) * s,
            "down": jax.random.normal(k4, (E, D, F), dtype) * sf,
        },
    }


def quantize_experts(params: dict, bits: int = 8) -> None:
    """In-place RTN quantization of every MoE layer's expert stacks.

    Each (E, F, D) stack becomes int8 codes + per-(E, F) symmetric
    row scales stored alongside ("gate" -> "gate_scale", ...): expert
    weight HBM drops 2x vs bf16 / 4x vs f32 at 8 bits (bits < 8 narrows
    the grid inside the int8 container for accuracy studies; the packed
    sub-byte formats of ops/pack.py stay with the dense linears — a
    batched-expert Pallas grid is future work). moe_ffn detects the
    codes + scale entries and folds the dequantization into the expert
    einsums, which XLA fuses into the dot. The router (tiny) stays dense.

    Hessian-free by design: experts see only their routed token subset,
    so the reference's GPTQ calibration recipe (reference: gptq.py:38-65
    accumulates over ALL tokens of a linear) does not transfer directly;
    RTN is the standard baseline the reference itself ships (--nearest,
    reference: opt.py:289-300).
    """
    if not 2 <= bits <= 8:
        raise ValueError(f"bits={bits} not in [2, 8]")
    qmax = float(2 ** (bits - 1) - 1)
    for bp in params["layers"]:
        ex = bp.get("experts")
        if ex is None:
            continue
        for name in ("gate", "up", "down"):
            w = ex[name]
            if w.dtype == jnp.int8:
                continue  # already quantized
            wf = jnp.asarray(w, jnp.float32)
            s = jnp.max(jnp.abs(wf), axis=-1) / qmax  # (E, F)
            s = jnp.maximum(s, 1e-12)
            q = jnp.clip(jnp.round(wf / s[..., None]), -qmax, qmax)
            ex[name] = q.astype(jnp.int8)
            ex[name + "_scale"] = s


def gptq_quantize_experts(spec, params: dict, calib_ids, cfg,
                          log=lambda s: None,
                          keep_grids: bool = False) -> dict:
    """Hessian-aware GPTQ quantization of every MoE layer's expert stacks
    (in place, fake-quantized dense values like pipeline.quantize_model).

    The reference's GPTQ recipe accumulates a linear's Hessian over ALL
    calibration tokens (reference: gptq.py:38-65); an expert only ever
    sees its ROUTED token subset, so each expert e gets its own Hessian
    from its dispatched slots: H_gate/up[e] from xe[e] (zero-padded slots
    contribute nothing), H_down[e] from the GLU inner activations
    computed with the ALREADY-QUANTIZED gate/up (the true-sequential
    ordering, reference: llama.py:97-105). Layers run serially with the
    hidden state re-propagated through the quantized layer (reference
    layer streaming: opt.py:30-228). Run AFTER pipeline.quantize_model so
    expert Hessians see the quantized attention activations.

    Returns {layer_prefix.e.proj: loss} for logging. Storage stays dense;
    follow with quantize_experts() for int8 codes + scales if expert HBM
    matters more than the extra rounding.
    """
    from gptq_tpu.models.common import block_forward, build_mask, \
        embed_forward, rope_tables
    from gptq_tpu.pipeline import solver_config_for
    from gptq_tpu.quant.gptq import gptq_quantize, hessian_init, \
        hessian_update

    nsamples, T = calib_ids.shape
    positions = jnp.arange(T)[None]
    mask = build_mask(spec, T, T)
    rope = (rope_tables(spec, jnp.broadcast_to(jnp.arange(T), (1, T)))
            if spec.pos == "rope" else None)
    scfg = solver_config_for(cfg, cfg.wbits)

    embed = jax.jit(lambda ids: embed_forward(
        spec, params, ids, jnp.broadcast_to(jnp.arange(T), ids.shape)))
    inps = jnp.stack([embed(calib_ids[j:j + 1])[0] for j in range(nsamples)])

    @jax.jit
    def layer_pass(bp, inps):
        """Propagate all samples through one layer; also return each
        sample's MoE FFN input (the input itself for dense layers —
        unused there, but keeps the scan output shape uniform)."""
        def body(_, inp):
            out, _, caps = block_forward(
                spec, bp, inp[None], positions=positions, mask=mask,
                rope=rope, capture=True)
            m = caps.get("moe.input")
            return None, (out[0], inp if m is None else m[0])

        _, (outs, ms) = jax.lax.scan(body, None, inps)
        return outs, ms

    @jax.jit
    def expert_hessians(router_w, ms):
        """Per-expert gate/up Hessian states from dispatched slots."""
        E = spec.n_experts

        def fold(states, m):
            dispatch, _, _ = route(spec, router_w, m)
            xe = jnp.einsum("nec,nd->ecd", dispatch, m.astype(jnp.float32))
            return jax.vmap(hessian_update)(states, xe), None

        init = jax.vmap(lambda _: hessian_init(ms.shape[-1]))(jnp.arange(E))
        states, _ = jax.lax.scan(fold, init, ms)
        return states

    from gptq_tpu.models.common import activation as _activation

    @jax.jit
    def down_hessians(router_w, gate, up, ms):
        def fold(states, m):
            dispatch, _, _ = route(spec, router_w, m)
            xe = jnp.einsum("nec,nd->ecd", dispatch, m.astype(jnp.float32))
            g = jnp.einsum("ecd,efd->ecf", xe, gate.astype(jnp.float32))
            u = jnp.einsum("ecd,efd->ecf", xe, up.astype(jnp.float32))
            inner = _activation(spec, g) * u
            return jax.vmap(hessian_update)(states, inner), None

        init = jax.vmap(lambda _: hessian_init(up.shape[1]))(
            jnp.arange(spec.n_experts))
        states, _ = jax.lax.scan(fold, init, ms)
        return states

    # grids stash for pack_experts: only meaningful when the solver grid
    # is positionally stable in the original column order (one group, or
    # no act-order permutation) and the mode produces uniform grids
    stash_grids = keep_grids and scfg.mode == "uniform" and (
        not scfg.actorder or scfg.groupsize <= 0)
    if keep_grids and not stash_grids:
        log("expert grids not stashed (non-uniform mode or act-order "
            "groups); pack_experts will refit RTN grids")

    losses: dict[str, float] = {}
    for li, bp in enumerate(params["layers"]):
        ex = bp.get("experts")
        if ex is None:
            inps, _ = layer_pass(bp, inps)
            continue
        t0 = time.time()
        _, ms = layer_pass(bp, inps)  # (nsamples, T, D) FFN inputs
        ms = ms.reshape(nsamples, -1, ms.shape[-1])
        hg = expert_hessians(bp["router"]["w"], ms)
        E = spec.n_experts
        grids: dict = {"bits": scfg.bits, "groupsize": scfg.groupsize}
        for e in range(E):
            He = (hg[0][e], hg[1][e], hg[2][e])
            for name in ("gate", "up"):
                r = gptq_quantize(jnp.asarray(ex[name][e], jnp.float32),
                                  He[0], scfg, mean_input=He[2])
                ex[name] = jnp.asarray(ex[name]).at[e].set(
                    r["Q"].astype(ex[name].dtype))
                losses[f"layer.{li}.expert{e}.{name}"] = float(r["loss"])
                if stash_grids:
                    g = grids.setdefault(name, {"scale": [], "zero": []})
                    g["scale"].append(r["scale"])
                    g["zero"].append(r["zero"])

        # down's Hessian from the GLU inner computed with the QUANTIZED
        # gate/up (true-sequential ordering)
        hd = down_hessians(bp["router"]["w"], ex["gate"], ex["up"], ms)
        for e in range(E):
            r = gptq_quantize(jnp.asarray(ex["down"][e], jnp.float32),
                              hd[0][e], scfg, mean_input=hd[2][e])
            ex["down"] = jnp.asarray(ex["down"]).at[e].set(
                r["Q"].astype(ex["down"].dtype))
            losses[f"layer.{li}.expert{e}.down"] = float(r["loss"])
            if stash_grids:
                g = grids.setdefault("down", {"scale": [], "zero": []})
                g["scale"].append(r["scale"])
                g["zero"].append(r["zero"])
        if stash_grids:
            ex["_grids"] = {
                k: (v if not isinstance(v, dict) else
                    {"scale": jnp.stack(v["scale"]),
                     "zero": jnp.stack(v["zero"])})
                for k, v in grids.items()}
        # re-propagate through the quantized layer (reference replays
        # forwards after quantizing, opt.py:216-217)
        inps, _ = layer_pass(bp, inps)
        log(f"layer {li}: {3 * E} expert projections quantized in "
            f"{time.time() - t0:.1f}s")
    return losses
