"""Sequence (context) parallelism: long-prompt prefill with the sequence
dimension sharded over an "sp" mesh axis and ring attention over ICI.

The reference has no answer to prompts whose activations exceed one
device's HBM — its multi-GPU path moves whole LAYERS between GPUs
(reference: opt.py:404-438 `opt_multigpu`), which caps sequence length at
what one device can hold. Here each device holds a contiguous 1/sp slice
of the prompt: every positionwise stage (norms, qkv/o projections, FFN —
all weights replicated) runs on the local slice directly, and attention
runs as a ring — each device computes online-softmax partial attention of
its query chunk against the key/value chunk it currently holds, then
passes that chunk to its neighbour with `jax.lax.ppermute`, sp hops total
(Liu et al., "Ring Attention with Blockwise Transformers", 2023). XLA
overlaps each hop's collective with the next partial-attention compute.

Activation memory per device drops by sp (the (H, Tc, T) score blocks
never materialize globally), so max prompt length scales linearly with
devices — the TPU-native capacity story for prefill, complementing
parallel/tp.py (weights) and parallel/pp.py (layers).

Two cache disciplines:
* make_sp_prefill — full logits plus a gathered KVCache any consumer can
  decode from (model_forward, shard_map TP).
* make_sp_cache_prefill + make_sp_decode_step — the SPCache stays sharded
  over sp for the WHOLE serving lifetime (context-parallel decode:
  round-robin appends, exact pmax+psum online-softmax combine, optional
  int8 values+scales), so per-device cache memory is S/sp during decode
  too. make_sp_tp_* variants compose either discipline with tensor
  parallelism on a 2-D (sp, tp) mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gptq_tpu.models.common import (ArchSpec, KVCache, _local_slopes,
                                    alibi_slopes, block_forward,
                                    embed_forward, head_forward, rope_tables)
from gptq_tpu.parallel.pp import _stack_trees


def make_sp_mesh(sp: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if len(devices) < sp:
        raise ValueError(f"need {sp} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:sp]), ("sp",))


def _ring_attention(spec: ArchSpec, q, k, v, my_chunk, sp: int, axis: str,
                    slopes=None):
    """Online-softmax attention of the local query chunk against all sp
    key/value chunks, visited in ring order (device d holds chunk
    (my_chunk - r) mod sp at hop r). Fully-future chunks are computed but
    masked to zero probability — uniform compute keeps the ring in one
    lax.scan. `slopes` carries this shard's alibi slopes (length = local
    head count; required when spec.pos == "alibi"). Returns (B, Tc, H*hd)
    like attention()."""
    B, Tc, H, hd = q.shape
    kvh = k.shape[2]
    rep = H // kvh  # GQA: replicate kv heads INSIDE each hop — the ring
    # carry/ppermute stays at kvh heads, so GQA models move H/kvh times
    # less data over ICI per hop
    qf = q.astype(jnp.float32) * spec.scale
    q_pos = (my_chunk * Tc + jnp.arange(Tc))[:, None]  # (Tc, 1) global
    perm = [(d, (d + 1) % sp) for d in range(sp)]

    def hop(carry, r):
        kc, vc, m, l, acc = carry
        j = (my_chunk - r) % sp  # chunk id currently held
        kr = jnp.repeat(kc, rep, axis=2) if rep > 1 else kc
        vr = jnp.repeat(vc, rep, axis=2) if rep > 1 else vc
        scores = jnp.einsum("bthd,bshd->bhts", qf, kr.astype(jnp.float32))
        k_pos = (j * Tc + jnp.arange(Tc))[None, :]  # (1, Tc) global
        allowed = k_pos <= q_pos  # (Tc, Tc) causal on global positions
        if slopes is not None:  # HF BLOOM convention: slope * (kpos - qpos)
            scores = scores + (slopes[:, None, None]
                               * (k_pos - q_pos).astype(jnp.float32)[None])
        # explicit zeroing of masked probabilities: additive -inf under a
        # running max would let fully-masked chunks contribute exp(0)=1
        scores = jnp.where(allowed[None, None], scores, -jnp.inf)
        m_new = jnp.maximum(m, jnp.max(scores, axis=-1))  # (B, H, Tc)
        # rows with nothing allowed yet keep m = -1e30; shift scores by a
        # FINITE max so exp never sees inf - inf
        shift = jnp.maximum(m_new, -1e30)
        p = jnp.where(allowed[None, None],
                      jnp.exp(scores - shift[..., None]), 0.0)
        alpha = jnp.exp(jnp.maximum(m, -1e30) - shift)  # (B, H, Tc)
        l = l * alpha + jnp.sum(p, axis=-1)
        acc = acc * alpha[..., None] + jnp.einsum("bhts,bshd->bhtd", p,
                                                  vr.astype(jnp.float32))
        if sp > 1:
            kc = jax.lax.ppermute(kc, axis, perm)
            vc = jax.lax.ppermute(vc, axis, perm)
        return (kc, vc, m_new, l, acc), None

    init = (k, v,
            jnp.full((B, H, Tc), -jnp.inf, jnp.float32),
            jnp.zeros((B, H, Tc), jnp.float32),
            jnp.zeros((B, H, Tc, hd), jnp.float32))
    (_, _, _, l, acc), _ = jax.lax.scan(hop, init, jnp.arange(sp))
    out = acc / l[..., None]  # every row has >= 1 allowed key (itself)
    return out.transpose(0, 2, 1, 3).reshape(B, Tc, H * hd).astype(q.dtype)


def _sp_prefill_parts(spec: ArchSpec, params: dict, mesh: Mesh,
                      axis: str = "sp"):
    """(fwd, stacked, hp): the shard_map prefill body, the device_put
    replicated stacked-layer tree, and the head params — shared by the
    gathering (make_sp_prefill) and sharded-cache (make_sp_cache_prefill)
    front-ends so the weights are staged to device exactly once."""
    sp = mesh.shape[axis]
    stacked = _stack_trees(params["layers"])
    hp = {"embed": params["embed"], "final_ln": params.get("final_ln"),
          "lm_head": params.get("lm_head")}
    rep_sh = NamedSharding(mesh, P())

    def shmap_body(layers, embed, final_ln, lm_head, ids_local):
        my_chunk = jax.lax.axis_index(axis)
        B, Tc = ids_local.shape
        positions = (my_chunk * Tc
                     + jnp.broadcast_to(jnp.arange(Tc), (B, Tc)))
        hparams = {"embed": embed, "final_ln": final_ln, "lm_head": lm_head}
        rope = rope_tables(spec, positions) if spec.pos == "rope" else None

        cell = {}
        slopes = (jnp.asarray(alibi_slopes(spec.n_heads), jnp.float32)
                  if spec.pos == "alibi" else None)

        def ring_attn(spec_, q, k, v, mask, plain_causal=False):
            cell["kv"] = (k, v)  # pre-GQA-replication chunk for the cache
            return _ring_attention(spec_, q, k, v, my_chunk, sp, axis,
                                   slopes=slopes)

        h = embed_forward(spec, hparams, ids_local, positions)

        def body(hc, lp):
            out, _, _ = block_forward(spec, lp, hc, positions=positions,
                                      mask=None, rope=rope,
                                      attn_fn=ring_attn)
            return out.astype(hc.dtype), cell.pop("kv")

        h, (ks, vs) = jax.lax.scan(body, h, layers)
        logits = head_forward(spec, hparams, h)
        return logits, ks, vs  # ks/vs: (L, B, Tc, kvh, hd) local chunks

    layer_specs = jax.tree_util.tree_map(
        lambda v: None if v is None else P(), stacked,
        is_leaf=lambda v: v is None)
    rep = jax.tree_util.tree_map(
        lambda v: None if v is None else P(),
        (hp["embed"], hp["final_ln"], hp["lm_head"]),
        is_leaf=lambda v: v is None)
    fwd = shard_map(
        shmap_body, mesh=mesh,
        in_specs=(layer_specs, *rep, P(None, axis)),
        out_specs=(P(None, axis), P(None, None, axis), P(None, None, axis)),
        check_vma=False,
    )
    stacked = jax.tree_util.tree_map(
        lambda v: None if v is None else jax.device_put(v, rep_sh),
        stacked, is_leaf=lambda v: v is None)
    return fwd, stacked, hp


def make_sp_prefill(spec: ArchSpec, params: dict, mesh: Mesh,
                    axis: str = "sp", cache_dtype=jnp.bfloat16,
                    max_len: int | None = None):
    """prefill(ids) -> (logits (B, T, vocab), KVCache filled to length T).

    `ids` is the full (B, T) prompt with T divisible by sp; weights
    replicate, activations shard over `axis` along T. The returned cache's
    planes are (L, B, max_len, kvh, hd); max_len defaults to spec.max_pos
    so the cache always has room for decode appends (an exact-size cache
    would silently clamp the first append's write index). Pass
    max_len == T explicitly for an append-free exact-size cache; pass the
    cache to model_forward (or device_put to parallel.tp.cache_pspec) to
    continue decoding.
    """
    sp = mesh.shape[axis]
    fwd, stacked, hp = _sp_prefill_parts(spec, params, mesh, axis)

    def prefill(ids: jax.Array):
        B, T = ids.shape
        if T % sp:
            raise ValueError(f"prompt length {T} must divide by sp={sp}")
        if T > spec.max_pos:
            raise ValueError(f"prompt length {T} > max_pos={spec.max_pos}")
        logits, ks, vs = fwd(stacked, hp["embed"], hp["final_ln"],
                             hp["lm_head"], ids)
        ks, vs = ks.astype(cache_dtype), vs.astype(cache_dtype)
        ml = spec.max_pos if max_len is None else max_len
        if ml < T:
            raise ValueError(f"max_len={ml} < prompt length {T}")
        if ml > T:  # room for decode appends
            pad = [(0, 0), (0, 0), (0, ml - T), (0, 0), (0, 0)]
            ks, vs = jnp.pad(ks, pad), jnp.pad(vs, pad)
        cache = KVCache(k=ks, v=vs, length=jnp.asarray(T, jnp.int32),
                        k_scale=None, v_scale=None)
        return logits, cache

    return jax.jit(prefill), fwd


def make_sp_tp_mesh(sp: int, tp: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if len(devices) < sp * tp:
        raise ValueError(f"need {sp * tp} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:sp * tp]).reshape(sp, tp), ("sp", "tp"))


def _sp_tp_prefill_parts(spec: ArchSpec, params: dict, mesh: Mesh,
                         sp_axis: str, tp_axis: str,
                         fuse: bool, a8: bool):
    """(fwd, local): the raw sp x tp shard_map prefill body — shared by
    the gathering and sharded-cache front-ends."""
    from gptq_tpu.parallel.tp import tp_local_view

    sp = mesh.shape[sp_axis]
    tp = mesh.shape[tp_axis]
    local, pspecs = tp_local_view(spec, params, tp, tp_axis,
                                  fuse=fuse, a8=a8)

    def shmap_body(p, ids_local):
        my_chunk = jax.lax.axis_index(sp_axis)
        B, Tc = ids_local.shape
        positions = (my_chunk * Tc
                     + jnp.broadcast_to(jnp.arange(Tc), (B, Tc)))
        rope = rope_tables(spec, positions) if spec.pos == "rope" else None
        slopes = (_local_slopes(spec, tp_axis, tp)
                  if spec.pos == "alibi" else None)

        cell = {}

        def ring_attn(spec_, q, k, v, mask, plain_causal=False):
            cell["kv"] = (k, v)  # local kv heads, pre-GQA-replication
            return _ring_attention(spec_, q, k, v, my_chunk, sp, sp_axis,
                                   slopes=slopes)

        h = embed_forward(spec, p, ids_local, positions)
        ks, vs = [], []
        for bp in p["layers"]:
            h, _, _ = block_forward(spec, bp, h, positions=positions,
                                    mask=None, rope=rope, tp_axis=tp_axis,
                                    attn_fn=ring_attn)
            kc, vc = cell.pop("kv")
            ks.append(kc)
            vs.append(vc)
        logits = head_forward(spec, p, h, tp_axis=tp_axis)
        # (L, B, Tc, kvh/tp, hd) local chunks
        return logits, jnp.stack(ks), jnp.stack(vs)

    fwd = shard_map(
        shmap_body, mesh=mesh,
        in_specs=(pspecs, P(None, sp_axis)),
        out_specs=(P(None, sp_axis),
                   P(None, None, sp_axis, tp_axis),
                   P(None, None, sp_axis, tp_axis)),
        check_vma=False,
    )
    return fwd, local


def make_sp_tp_prefill(spec: ArchSpec, params: dict, mesh: Mesh,
                       sp_axis: str = "sp", tp_axis: str = "tp",
                       cache_dtype=jnp.bfloat16, max_len: int | None = None,
                       fuse: bool = False, a8: bool = False):
    """prefill(ids) -> (logits, KVCache) on a 2-D (sp, tp) mesh: the prompt
    shards over `sp_axis` (ring attention between chunks) AND the weights
    shard over `tp_axis` (Megatron column/row shards via
    parallel.tp.tp_local_view, one psum per residual projection) — long
    prompts and weights too large per device compose in one program.
    Activation memory per device drops by sp and weight memory by tp; the
    tp axis rides the inner (fastest) ICI dimension by construction of
    make_sp_tp_mesh. Packed weights, serve-time q/k/v + gate/up fusion
    (fuse=True) and dynamic int8 activations (a8=True) follow the same
    rules as make_tp_decode_step. The returned cache is global (gathered
    over both axes) — device_put it to parallel.tp.cache_pspec to continue
    decoding under shard_map TP."""
    sp = mesh.shape[sp_axis]
    fwd, local = _sp_tp_prefill_parts(spec, params, mesh, sp_axis, tp_axis,
                                      fuse, a8)

    def prefill(ids: jax.Array):
        B, T = ids.shape
        if T % sp:
            raise ValueError(f"prompt length {T} must divide by sp={sp}")
        if T > spec.max_pos:
            raise ValueError(f"prompt length {T} > max_pos={spec.max_pos}")
        logits, ks, vs = fwd(local, ids)
        ks, vs = ks.astype(cache_dtype), vs.astype(cache_dtype)
        ml = spec.max_pos if max_len is None else max_len
        if ml < T:
            raise ValueError(f"max_len={ml} < prompt length {T}")
        if ml > T:  # room for decode appends (see make_sp_prefill)
            pad = [(0, 0), (0, 0), (0, ml - T), (0, 0), (0, 0)]
            ks, vs = jnp.pad(ks, pad), jnp.pad(vs, pad)
        return logits, KVCache(k=ks, v=vs, length=jnp.asarray(T, jnp.int32),
                               k_scale=None, v_scale=None)

    return jax.jit(prefill), local


# ---------------------------------------------------------------------------
# context-parallel decode: the KV cache stays sp-sharded through decode
# ---------------------------------------------------------------------------

from dataclasses import dataclass, field  # noqa: E402

from jax.tree_util import register_dataclass  # noqa: E402


@register_dataclass
@dataclass
class SPCache:
    """KV cache that is NEVER gathered: each device along the sp axis holds
    S/sp slots. Slots are chunk-major — device d's local range is
    [d*ml, (d+1)*ml) of the global axis; its first Tc slots hold prompt
    positions [d*Tc, (d+1)*Tc), the rest is decode headroom filled
    round-robin. `pos` maps every slot to its global position (-1 = empty),
    so attention masks by CONTENT and layout never has to be contiguous.

    k/v: (L, B, sp*ml, kvh, hd), sharded P(None, None, sp).
    pos: (sp*ml,) int32, sharded P(sp).
    length: total tokens written (prompt + decoded), replicated.
    k_scale/v_scale: (L, B, sp*ml, kvh) f32 per-token-head scales when the
    values are int8 (cache_dtype=int8 composes the quantized cache's
    2x byte saving with the sp sharding), sharded like k/v.
    """

    k: jax.Array
    v: jax.Array
    pos: jax.Array
    length: jax.Array
    k_scale: jax.Array | None = None
    v_scale: jax.Array | None = None
    meta: tuple = field(metadata=dict(static=True), default=(0, 0))  # (Tc, ml)


def _sp_attn_impl(int8: bool) -> str | None:
    """Whether the fused partial decode-attention kernel
    (ops/attention.decode_attention_partial) serves SPCache decode:
    'tpu' / 'interpret' / None (inline jnp dequant + einsum). Same env
    gate as the flat cache (GPTQ_TPU_ATTN_IMPL); auto = kernel for int8
    slots on TPU — the kernel is what realizes the int8 cache's bandwidth
    halving per sp shard — and jnp for bf16/f32 (the flat-path chip A/B
    favored XLA's einsum overlap there, DESIGN.md)."""
    import os

    mode = os.environ.get("GPTQ_TPU_ATTN_IMPL", "auto")
    if mode == "kernel":
        return "tpu"
    if mode == "interpret":
        return "interpret"
    if mode == "xla":
        return None
    if mode != "auto":
        raise ValueError(
            f"GPTQ_TPU_ATTN_IMPL={mode!r}: expected auto/kernel/interpret/xla")
    return "tpu" if int8 and jax.default_backend() == "tpu" else None


def _sp_partial(spec: ArchSpec, q, ck, cv, ksc, vsc, pos_local, slopes,
                layer: int):
    """Per-device partial online-softmax attention of one query step
    against the local cache slots of one layer (int8 slots dequantize via
    the ksc/vsc scale planes; None for bf16/f32 slots). Returns (m, l,
    acc) for the fresh-pair merge + cross-device combine:
    out = sum_d exp(m_d - M) acc_d / sum_d exp(m_d - M) l_d.

    The slabs arrive as the WHOLE (L, B, ml, kvh, hd) local stack with a
    STATIC layer index — on the kernel paths the block index_map slices
    the layer, so XLA never materializes a sliced-operand copy before the
    custom call and the cache never relayouts (the two hidden per-step
    costs the flat path killed in round 4, DESIGN.md). The stack is never
    modified mid-step: decode appends are deferred to ONE batched write
    after the layer loop (see make_sp_decode_step).

    On TPU with int8 slots the wide partial-attention Pallas kernel
    consumes the int8 slabs + scale planes directly (hd lane-aligned;
    see _sp_attn_impl), the narrow one covers other head dims; the jnp
    body below is the oracle/CPU path."""
    B, T, H, hd = q.shape  # T == 1
    impl = _sp_attn_impl(ksc is not None)
    S = ck.shape[2]
    kvh = ck.shape[3]
    # compiled mode wants tile-aligned slab blocks; odd capacities (tiny
    # test meshes) keep the jnp path
    if impl is not None and (impl == "interpret" or S % 128 == 0):
        if hd % 128 == 0:
            from gptq_tpu.ops.attention import decode_attention_partial_wide

            return decode_attention_partial_wide(
                q[:, 0], ck, cv, pos_local, spec.scale, k_scale=ksc,
                v_scale=vsc, slopes=slopes, layer=layer,
                interpret=impl == "interpret")
        if slopes is None or H == kvh:  # narrow kernel: alibi needs G=1
            from gptq_tpu.ops.attention import decode_attention_partial

            return decode_attention_partial(
                q[:, 0], ck[layer], cv[layer], pos_local, spec.scale,
                k_scale=None if ksc is None else ksc[layer],
                v_scale=None if vsc is None else vsc[layer],
                slopes=slopes, interpret=impl == "interpret")
    kc, vc = ck[layer], cv[layer]
    rep = H // kvh
    if ksc is not None:
        kc = kc.astype(jnp.float32) * ksc[layer][..., None]
        vc = vc.astype(jnp.float32) * vsc[layer][..., None]
    kr = jnp.repeat(kc, rep, axis=2) if rep > 1 else kc
    vr = jnp.repeat(vc, rep, axis=2) if rep > 1 else vc
    qf = q[:, 0].astype(jnp.float32) * spec.scale  # (B, H, hd)
    scores = jnp.einsum("bhd,bshd->bhs", qf, kr.astype(jnp.float32))
    valid = pos_local >= 0  # (ml,) — everything stored is causal past
    if slopes is not None:  # HF BLOOM: slope * (key_pos - query_pos); the
        # query position cancels in softmax, slope * key_pos suffices
        scores = scores + (slopes[:, None]
                           * pos_local.astype(jnp.float32)[None])
    scores = jnp.where(valid[None, None], scores, -jnp.inf)
    m = jnp.max(scores, axis=-1)  # (B, H); -inf if no valid slot here
    shift = jnp.maximum(m, -1e30)
    p = jnp.where(valid[None, None], jnp.exp(scores - shift[..., None]), 0.0)
    l = jnp.sum(p, axis=-1)
    acc = jnp.einsum("bhs,bshd->bhd", p, vr.astype(jnp.float32))
    return m, l, acc


def _sp_fresh_combine(spec, q, k, v, parts, my_turn, length, slopes,
                      sp_axis):
    """Merge the current token's own (un-written, exact) k/v pair into the
    owning device's partial state, then combine exactly across the sp
    axis. The fresh token never touches the slabs here — the caller
    batches ALL layers' appends into one write after the layer loop (the
    per-layer slab read-modify-write this replaces rewrote the whole
    local cache every step; chip A/B results/r3_sp1_ab_chip.txt).
    Returns attention out (B, 1, H*hd)."""
    m, l, acc = parts  # (B, H), (B, H), (B, H, hd)
    B, T, H, hd = q.shape  # T == 1
    kvh = k.shape[2]
    rep = H // kvh
    qf = q[:, 0].astype(jnp.float32) * spec.scale  # (B, H, hd)
    kf = k[:, 0].astype(jnp.float32)
    vf = v[:, 0].astype(jnp.float32)
    if rep > 1:
        kf = jnp.repeat(kf, rep, axis=1)
        vf = jnp.repeat(vf, rep, axis=1)
    sf = jnp.sum(qf * kf, axis=-1)  # (B, H) score of the fresh pair
    if slopes is not None:  # fresh key position = length (same
        # slope * key_pos convention as the slab path)
        sf = sf + slopes[None, :] * jnp.asarray(length, jnp.float32)
    sf = jnp.where(my_turn, sf, -jnp.inf)  # only the owner attends it
    m2 = jnp.maximum(m, sf)
    shift = jnp.maximum(m2, -1e30)
    a_old = jnp.exp(jnp.maximum(m, -1e30) - shift)
    p_f = jnp.where(my_turn, jnp.exp(sf - shift), 0.0)
    l2 = l * a_old + p_f
    acc2 = acc * a_old[..., None] + p_f[..., None] * vf
    M = jax.lax.pmax(m2, sp_axis)
    w = jnp.exp(jnp.maximum(m2, -1e30) - jnp.maximum(M, -1e30))
    l_g = jax.lax.psum(w * l2, sp_axis)
    acc_g = jax.lax.psum(w[..., None] * acc2, sp_axis)
    out = acc_g / l_g[..., None]
    return out.reshape(B, 1, H * hd).astype(q.dtype)


def _sp_write_fresh(ck, cv, ksc, vsc, fresh, my_turn, slot, int8: bool):
    """ONE batched deferred append for all layers: stack the per-layer
    fresh k/v pairs (quantizing when the slabs are int8) and write them
    at the owning device's slot — non-owners rewrite their existing row
    in place. Replaces L per-layer slab updates per step."""
    fk = jnp.stack([f[0] for f in fresh])  # (L, B, 1, kvh, hd)
    fv = jnp.stack([f[1] for f in fresh])
    if int8:
        from gptq_tpu.models.common import _quantize_kv

        kq, ksn = jax.vmap(_quantize_kv)(fk)
        vq, vsn = jax.vmap(_quantize_kv)(fv)
        old = jax.lax.dynamic_slice_in_dim(ksc, slot, 1, axis=2)
        ksc = jax.lax.dynamic_update_slice_in_dim(
            ksc, jnp.where(my_turn, ksn, old), slot, axis=2)
        old = jax.lax.dynamic_slice_in_dim(vsc, slot, 1, axis=2)
        vsc = jax.lax.dynamic_update_slice_in_dim(
            vsc, jnp.where(my_turn, vsn, old), slot, axis=2)
        fkw, fvw = kq, vq
    else:
        fkw, fvw = fk.astype(ck.dtype), fv.astype(cv.dtype)
    old = jax.lax.dynamic_slice_in_dim(ck, slot, 1, axis=2)
    ck = jax.lax.dynamic_update_slice_in_dim(
        ck, jnp.where(my_turn, fkw, old), slot, axis=2)
    old = jax.lax.dynamic_slice_in_dim(cv, slot, 1, axis=2)
    cv = jax.lax.dynamic_update_slice_in_dim(
        cv, jnp.where(my_turn, fvw, old), slot, axis=2)
    return ck, cv, ksc, vsc


def make_sp_cache_prefill(spec: ArchSpec, params: dict, mesh: Mesh,
                          axis: str = "sp", cache_dtype=jnp.bfloat16,
                          max_len: int | None = None):
    """Like make_sp_prefill but the returned SPCache stays SHARDED over
    `axis` — per-device cache memory is S/sp for the whole serving
    lifetime (prefill AND decode via make_sp_decode_step), the actual
    long-context capacity story; the gathering make_sp_prefill trades
    that away for a cache any consumer can use. cache_dtype=int8 stores
    dynamically-quantized values + per-token-head scales (2x fewer cache
    bytes on top of the sp sharding)."""
    sp = mesh.shape[axis]
    int8 = cache_dtype == jnp.int8
    fwd, stacked, hp = _sp_prefill_parts(spec, params, mesh, axis)
    fwd = jax.jit(fwd)  # per-shape trace cache across prefills

    ml_total = spec.max_pos if max_len is None else max_len
    if ml_total % sp:
        ml_total += sp - ml_total % sp  # round capacity up to shard evenly
    ml = ml_total // sp

    def prefill(ids: jax.Array):
        B, T = ids.shape
        if T % sp:
            raise ValueError(f"prompt length {T} must divide by sp={sp}")
        Tc = T // sp
        if Tc > ml:
            raise ValueError(f"prompt chunk {Tc} > per-device capacity {ml}")
        logits, ks, vs = fwd(stacked, hp["embed"], hp["final_ln"],
                             hp["lm_head"], ids)
        scat = _scatter_one_jit
        ksc = vsc = None
        if int8:
            ks, k_s = _quantize_layers(ks)
            vs, v_s = _quantize_layers(vs)
            ssh = NamedSharding(mesh, P(None, None, axis))
            ksc = jax.device_put(scat(k_s, T, sp, ml), ssh)
            vsc = jax.device_put(scat(v_s, T, sp, ml), ssh)
        else:
            ks, vs = ks.astype(cache_dtype), vs.astype(cache_dtype)
        shard = NamedSharding(mesh, P(None, None, axis))
        cache = SPCache(
            k=jax.device_put(scat(ks, T, sp, ml), shard),
            v=jax.device_put(scat(vs, T, sp, ml), shard),
            pos=jax.device_put(jnp.asarray(_chunk_positions(T, sp, ml)),
                               NamedSharding(mesh, P(axis))),
            length=jnp.asarray(T, jnp.int32),
            k_scale=ksc, v_scale=vsc, meta=(Tc, ml))
        return logits, cache

    return prefill


def make_sp_decode_step(spec: ArchSpec, params: dict, mesh: Mesh,
                        meta: tuple, axis: str = "sp",
                        int8_cache: bool = False,
                        check_capacity: bool = True):
    """step(cache: SPCache, token (B, 1)) -> (last logits, SPCache).

    Single-token decode with the cache sharded over `axis` the whole
    time: every device computes partial online-softmax attention of the
    new query against its local slots, one pmax + two psums combine the
    partials exactly, and the new token's k/v appends round-robin
    (decode step t lands on device t mod sp) so headroom drains evenly.
    int8_cache=True expects an SPCache built with cache_dtype=int8 (scale
    planes present; appends quantize dynamically). Weights are replicated
    (make_sp_tp_decode_step composes with tp).

    The layer loop is a PYTHON loop (static layer indices) so the partial
    attention kernel reads the UNMODIFIED (L, B, ml, kvh, hd) slab stack
    straight from HBM — no sliced-operand copies — and all L fresh k/v
    pairs land in ONE batched deferred write after the loop. The previous
    lax.scan-over-layers carried the slabs through per-layer updates,
    which rewrote the whole local cache every step (chip A/B: 2.88x flat
    decode at sp=1, results/r3_sp1_ab_chip.txt)."""
    sp = mesh.shape[axis]
    Tc, ml = meta
    hp = {"embed": params["embed"], "final_ln": params.get("final_ln"),
          "lm_head": params.get("lm_head")}
    rep_sh = NamedSharding(mesh, P())
    layers_rep = jax.tree_util.tree_map(
        lambda v: None if v is None else jax.device_put(v, rep_sh),
        params["layers"], is_leaf=lambda v: v is None)

    def shmap_body(layers, embed, final_ln, lm_head, ck, cv, ksc, vsc,
                   pos, length, token):
        d = jax.lax.axis_index(axis)
        B, T = token.shape  # T == 1
        t_dec = length - Tc * sp  # decode index
        my_turn = (t_dec % sp) == d
        slot = Tc + t_dec // sp  # local write slot on the owning device
        new_pos = jnp.where(my_turn,
                            jnp.asarray(length, jnp.int32), pos[slot])
        pos_new = pos.at[slot].set(new_pos)
        positions = jnp.broadcast_to(length[None], (B, T))
        hparams = {"embed": embed, "final_ln": final_ln, "lm_head": lm_head}
        rope = rope_tables(spec, positions) if spec.pos == "rope" else None
        slopes = (jnp.asarray(alibi_slopes(spec.n_heads), jnp.float32)
                  if spec.pos == "alibi" else None)

        ksL = ksc if int8_cache else None
        vsL = vsc if int8_cache else None
        fresh = []
        h = embed_forward(spec, hparams, token, positions)
        for i, lp in enumerate(layers):
            def decode_attn(spec_, q, k, v, mask, plain_causal=False, i=i):
                # mask with the OLD pos plane: the fresh token is not in
                # the slabs yet (deferred write) — it enters exactly once
                # via the fresh-pair merge; pos_new only describes the
                # state AFTER this step's write
                parts = _sp_partial(spec_, q, ck, cv, ksL, vsL, pos,
                                    slopes, i)
                fresh.append((k, v))
                return _sp_fresh_combine(spec_, q, k, v, parts, my_turn,
                                         length, slopes, axis)

            out, _, _ = block_forward(spec, lp, h, positions=positions,
                                      mask=None, rope=rope,
                                      attn_fn=decode_attn)
            h = out.astype(h.dtype)
        logits = head_forward(spec, hparams, h)
        ck_n, cv_n, ks_n, vs_n = _sp_write_fresh(
            ck, cv, ksc, vsc, fresh, my_turn, slot, int8_cache)
        return logits[:, -1], ck_n, cv_n, ks_n, vs_n, pos_new

    layer_specs = jax.tree_util.tree_map(
        lambda v: None if v is None else P(), layers_rep,
        is_leaf=lambda v: v is None)
    rep = jax.tree_util.tree_map(
        lambda v: None if v is None else P(),
        (hp["embed"], hp["final_ln"], hp["lm_head"]),
        is_leaf=lambda v: v is None)
    cshard = P(None, None, axis)
    sshard = cshard if int8_cache else P()
    fwd = shard_map(
        shmap_body, mesh=mesh,
        in_specs=(layer_specs, *rep, cshard, cshard, sshard, sshard,
                  P(axis), P(), P()),
        out_specs=(P(), cshard, cshard, sshard, sshard, P(axis)),
        check_vma=False,
    )

    weights = (layers_rep, hp)

    def _inner(weights, cache: SPCache, token: jax.Array):
        # weights is a jit OPERAND, never a closure capture: arrays closed
        # over by a traced fn are embedded in the lowered module as
        # constants, and at 7B scale that ships ~GBs of packed weights to
        # the compiler per program (chip: the remote compile service
        # drops the request after ~25 min; experiments/r3_sp1_ab_chip.py
        # first found this)
        stacked_, hp_ = weights
        dummy = jnp.zeros((), jnp.float32)
        logits, ck, cv, ks, vs, pos = fwd(
            stacked_, hp_["embed"], hp_["final_ln"], hp_["lm_head"],
            cache.k, cache.v,
            cache.k_scale if int8_cache else dummy,
            cache.v_scale if int8_cache else dummy,
            cache.pos, cache.length, token)
        return logits, SPCache(
            k=ck, v=cv, pos=pos, length=cache.length + 1,
            k_scale=ks if int8_cache else None,
            v_scale=vs if int8_cache else None, meta=cache.meta)

    step_jit = jax.jit(_inner)

    def step(cache: SPCache, token: jax.Array):
        # host-side guards (OUTSIDE jit — length is a concrete array here)
        if int8_cache != (cache.k_scale is not None):
            raise ValueError(
                f"int8_cache={int8_cache} but the cache "
                f"{'has' if cache.k_scale is not None else 'lacks'} scale "
                f"planes — build the step with int8_cache matching the "
                f"prefill's cache_dtype (raw int8 codes served without "
                f"dequantization would be silent garbage)")
        if cache.meta != meta:
            raise ValueError(f"cache.meta {cache.meta} != step meta {meta}")
        if check_capacity:
            # the owning device's write slot would clamp at ml-1 and
            # silently overwrite the newest stored token; fail loudly.
            # int(length) syncs with the device — pass
            # check_capacity=False on latency-critical eager loops that
            # track length on the host themselves.
            t_dec = int(cache.length) - Tc * sp
            if t_dec >= (ml - Tc) * sp:
                raise ValueError(
                    f"SPCache full: {int(cache.length)} tokens stored, "
                    f"capacity {Tc * sp + (ml - Tc) * sp} "
                    f"(prompt {Tc * sp} + headroom {(ml - Tc) * sp})")
        return step_jit(weights, cache, token)

    step.inner = _inner  # unguarded (weights, cache, token): for
    # on-device chained loops — pass step.weights THROUGH the outer jit
    # (engine/serving.py lax.scans over it; guards run once on the host)
    step.weights = weights
    step.capacity = lambda cache: (Tc * sp + (ml - Tc) * sp)
    return step


def _scatter_one(x, T: int, sp: int, ml: int):
    """One gathered (L, B, T, ...) plane -> chunk-major padded layout
    (L, B, sp*ml, ...): device d's ml slots start with its Tc-chunk."""
    Tc = T // sp
    L, B = x.shape[:2]
    xr = x.reshape(L, B, sp, Tc, *x.shape[3:])
    pad = [(0, 0)] * xr.ndim
    pad[3] = (0, ml - Tc)
    return jnp.pad(xr, pad).reshape(L, B, sp * ml, *x.shape[3:])


def _chunk_positions(T: int, sp: int, ml: int) -> np.ndarray:
    """Global position of every chunk-major slot; -1 = empty headroom."""
    Tc = T // sp
    pos = np.full((sp, ml), -1, np.int32)
    pos[:, :Tc] = np.arange(T, dtype=np.int32).reshape(sp, Tc)
    return pos.reshape(sp * ml)


# module-scope jits: per-shape traces are cached across prefill calls
# (a fresh jax.jit inside prefill would retrace every prompt)
_scatter_one_jit = jax.jit(_scatter_one, static_argnums=(1, 2, 3))


def _quantize_layers(x):
    from gptq_tpu.models.common import _quantize_kv

    return jax.vmap(_quantize_kv)(x)


_quantize_layers = jax.jit(_quantize_layers)


def make_sp_tp_cache_prefill(spec: ArchSpec, params: dict, mesh: Mesh,
                             sp_axis: str = "sp", tp_axis: str = "tp",
                             cache_dtype=jnp.bfloat16,
                             max_len: int | None = None,
                             fuse: bool = False, a8: bool = False):
    """make_sp_tp_prefill returning a doubly-sharded SPCache: slots over
    sp, kv heads over tp — cache memory per device is S/(sp*tp_kv_share);
    pair with make_sp_tp_decode_step to serve without ever gathering.
    cache_dtype=int8 adds dynamic per-token-head quantization on top."""
    sp = mesh.shape[sp_axis]
    int8 = cache_dtype == jnp.int8
    fwd, local = _sp_tp_prefill_parts(spec, params, mesh, sp_axis, tp_axis,
                                      fuse, a8)
    fwd = jax.jit(fwd)  # per-shape trace cache across prefills
    ml_total = spec.max_pos if max_len is None else max_len
    if ml_total % sp:
        ml_total += sp - ml_total % sp
    ml = ml_total // sp
    kv_shard = NamedSharding(mesh, P(None, None, sp_axis, tp_axis))
    sc_shard = NamedSharding(mesh, P(None, None, sp_axis, tp_axis))

    def prefill(ids: jax.Array):
        B, T = ids.shape
        if T % sp:
            raise ValueError(f"prompt length {T} must divide by sp={sp}")
        if T // sp > ml:
            raise ValueError(f"prompt chunk {T // sp} > capacity {ml}")
        logits, ks, vs = fwd(local, ids)
        if not int8:
            ks, vs = ks.astype(cache_dtype), vs.astype(cache_dtype)
        scat = _scatter_one_jit
        ksc = vsc = None
        if int8:
            ks, k_s = _quantize_layers(ks)
            vs, v_s = _quantize_layers(vs)
            ksc = jax.device_put(scat(k_s, T, sp, ml), sc_shard)
            vsc = jax.device_put(scat(v_s, T, sp, ml), sc_shard)
        return logits, SPCache(
            k=jax.device_put(scat(ks, T, sp, ml), kv_shard),
            v=jax.device_put(scat(vs, T, sp, ml), kv_shard),
            pos=jax.device_put(jnp.asarray(_chunk_positions(T, sp, ml)),
                               NamedSharding(mesh, P(sp_axis))),
            length=jnp.asarray(T, jnp.int32),
            k_scale=ksc, v_scale=vsc, meta=(T // sp, ml))

    return prefill, local


def make_sp_tp_decode_step(spec: ArchSpec, params: dict, mesh: Mesh,
                           meta: tuple, sp_axis: str = "sp",
                           tp_axis: str = "tp", fuse: bool = False,
                           a8: bool = False, int8_cache: bool = False,
                           check_capacity: bool = True):
    """step(local_params, cache: SPCache, token) -> (last logits, SPCache)
    on a 2-D (sp, tp) mesh: the cache stays sharded over BOTH axes (slots
    over sp, kv heads over tp) and the weights shard over tp
    (tp_local_view — packed/fused/a8 serving configs included). The full
    long-context big-model serving composition: per-device memory is
    weights/tp + cache/(sp*tp)."""
    from gptq_tpu.parallel.tp import tp_local_view

    sp = mesh.shape[sp_axis]
    tp = mesh.shape[tp_axis]
    Tc, ml = meta
    local, pspecs = tp_local_view(spec, params, tp, tp_axis,
                                  fuse=fuse, a8=a8)

    def shmap_body(p, ck, cv, ksc, vsc, pos, length, token):
        d = jax.lax.axis_index(sp_axis)
        B, T = token.shape  # T == 1
        t_dec = length - Tc * sp
        my_turn = (t_dec % sp) == d
        slot = Tc + t_dec // sp
        new_pos = jnp.where(my_turn,
                            jnp.asarray(length, jnp.int32), pos[slot])
        pos_new = pos.at[slot].set(new_pos)
        positions = jnp.broadcast_to(length[None], (B, T))
        rope = rope_tables(spec, positions) if spec.pos == "rope" else None
        slopes = (_local_slopes(spec, tp_axis, tp)
                  if spec.pos == "alibi" else None)

        ksL = ksc if int8_cache else None
        vsL = vsc if int8_cache else None
        fresh = []
        h = embed_forward(spec, p, token, positions)
        for i, bp in enumerate(p["layers"]):
            def decode_attn(spec_, q, k, v, mask, plain_causal=False, i=i):
                # OLD pos plane: deferred write — the fresh pair enters
                # exactly once via the merge (see make_sp_decode_step)
                parts = _sp_partial(spec_, q, ck, cv, ksL, vsL, pos,
                                    slopes, i)
                fresh.append((k, v))
                return _sp_fresh_combine(spec_, q, k, v, parts, my_turn,
                                         length, slopes, sp_axis)

            h, _, _ = block_forward(spec, bp, h, positions=positions,
                                    mask=None, rope=rope, tp_axis=tp_axis,
                                    attn_fn=decode_attn)
        logits = head_forward(spec, p, h, tp_axis=tp_axis)
        ck_n, cv_n, ks_n, vs_n = _sp_write_fresh(
            ck, cv, ksc, vsc, fresh, my_turn, slot, int8_cache)
        return logits[:, -1], ck_n, cv_n, ks_n, vs_n, pos_new

    cshard = P(None, None, sp_axis, tp_axis)
    sshard = cshard if int8_cache else P()
    fwd = shard_map(
        shmap_body, mesh=mesh,
        in_specs=(pspecs, cshard, cshard, sshard, sshard,
                  P(sp_axis), P(), P()),
        out_specs=(P(), cshard, cshard, sshard, sshard, P(sp_axis)),
        check_vma=False,
    )

    def _step(local_params, cache: SPCache, token: jax.Array):
        dummy = jnp.zeros((), jnp.float32)
        logits, ckn, cvn, ksn, vsn, pos = fwd(
            local_params, cache.k, cache.v,
            cache.k_scale if int8_cache else dummy,
            cache.v_scale if int8_cache else dummy,
            cache.pos, cache.length, token)
        return logits, SPCache(
            k=ckn, v=cvn, pos=pos, length=cache.length + 1,
            k_scale=ksn if int8_cache else None,
            v_scale=vsn if int8_cache else None, meta=cache.meta)

    step_jit = jax.jit(_step)

    def step(local_params, cache: SPCache, token: jax.Array):
        # host-side guards (OUTSIDE jit — length is a concrete array here)
        if int8_cache != (cache.k_scale is not None):
            raise ValueError(
                f"int8_cache={int8_cache} but the cache "
                f"{'has' if cache.k_scale is not None else 'lacks'} scale "
                f"planes — build the step with int8_cache matching the "
                f"prefill's cache_dtype (raw int8 codes served without "
                f"dequantization would be silent garbage)")
        if cache.meta != meta:
            raise ValueError(f"cache.meta {cache.meta} != step meta {meta}")
        if check_capacity:
            # the owning device's write slot would clamp at ml-1 and
            # silently overwrite the newest stored token; fail loudly.
            # int(length) syncs with the device — pass
            # check_capacity=False on latency-critical eager loops that
            # track length on the host themselves.
            t_dec = int(cache.length) - Tc * sp
            if t_dec >= (ml - Tc) * sp:
                raise ValueError(
                    f"SPCache full: {int(cache.length)} tokens stored, "
                    f"capacity {Tc * sp + (ml - Tc) * sp} "
                    f"(prompt {Tc * sp} + headroom {(ml - Tc) * sp})")
        return step_jit(local_params, cache, token)

    step.inner = _step  # unguarded: for on-device chained loops
    step.capacity = lambda cache: (Tc * sp + (ml - Tc) * sp)
    return local, step
