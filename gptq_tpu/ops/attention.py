"""Single-token decode attention straight off the KV-cache slabs — int8
(fused dequant) or bf16/f32 — with online softmax; no (T, S) score
materialization and no dequantized cache copy.

The int8 cache halves HBM footprint and stream bandwidth, but the win is
only real if attention CONSUMES int8 + scales directly: the previous path
materialized the whole dequantized cache in f32 before the einsum
(models/common.py), so the bytes read were f32 and the cache saving was
thrown away (measured 9.69 vs 9.96 ms/token at a 1536 prefix — noise).

Design (one token, B x Hkv grid row per batch, flash-style over S blocks):

    scores[s, h, g] = sm_scale * ks[s, h] * (q[h, g, :] . k[s, h, :])
    p = online_softmax(scores)  (running max/denominator across S blocks)
    out[h, g, :]  += sum_s (p[s, h, g] * vs[s, h]) * v[s, h, :]

The cache keeps its native (B, S, Hkv, hd) layout — blocks slice S only,
so the trailing (Hkv, hd) dims match the array and the DMA streams whole
token rows. At T=1 the contraction is a batched matvec over heads; it runs
on the VPU as multiply+reduce (the MXU has nothing to chew on at one query
row), converting each int8 slab to f32 exactly once in VMEM. Per-token-head
absmax scales fold into the score/probability epilogues.

No reference counterpart: the reference's serving cache is torch fp16
(SURVEY.md §5 long-context notes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _attn_kernel(sm_scale, G, Sb, n_sb, Hkv, hd, has_scales, has_fresh,
                 len_ref, q_ref, k_ref, v_ref, *rest):
    """One (batch, S-block) program; online softmax across S blocks.

    Everything stays 2-D inside the kernel (Mosaic restriction: >2-D
    gathers are unimplemented): the caller passes caches reshaped to
    (B, S, Hkv*hd) so per-head slabs are static LANE slices, and the
    per-head work is a static loop of (G, hd) x (Sb, hd) MXU dots.
    has_scales: int8 cache with per-token-head scale planes; otherwise
    the slabs are consumed as-is (bf16/f32 cache).
    has_fresh: the current token's own (un-written, exact f32) k/v pair
    merges into the online softmax in the last block's epilogue — the
    deferred-cache-write decode path (models.common) attends slots
    < length from the buffer plus itself from registers, so the buffer
    write can batch once per step instead of once per layer."""
    idx = 0
    if has_fresh:
        fk_ref, fv_ref = rest[:2]
        idx = 2
    if has_scales:
        ks_ref, vs_ref, out_ref, acc_ref, m_ref, l_ref = rest[idx:]
    else:
        out_ref, acc_ref, m_ref, l_ref = rest[idx:]
    sb = pl.program_id(1)
    # lens live in SMEM as the WHOLE (B, 1) array (a (1, 1) block fails
    # Mosaic's block-shape check the moment B > 1); index by batch row
    length = len_ref[pl.program_id(0), 0]

    @pl.when(sb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0].astype(jnp.float32)  # (H, hd)
    k2 = k_ref[0]  # (Sb, Hkv*hd) int8 / bf16
    v2 = v_ref[0]
    if has_scales:
        ks = ks_ref[0]  # (Sb, Hkv) f32
        vs = vs_ref[0]

    pos = sb * Sb + jax.lax.broadcasted_iota(jnp.int32, (G, Sb), 1)
    valid = pos < length  # (G, Sb)

    for h in range(Hkv):
        qh = q[h * G:(h + 1) * G]  # (G, hd)
        # fold the per-token k scale into the slab before the dot (keeps
        # every operand 2-D; a (1, Sb) broadcast would need a relayout)
        kh = k2[:, h * hd:(h + 1) * hd].astype(jnp.float32)
        kh = kh * (ks[:, h:h + 1] * sm_scale) if has_scales \
            else kh * sm_scale  # (Sb, hd)
        sc = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (G, Sb)
        sc = jnp.where(valid, sc, NEG_INF)

        rows = slice(h * G, (h + 1) * G)
        m_old = m_ref[rows, 0:1]  # (G, 1)
        l_old = l_ref[rows, 0:1]
        m_new = jnp.maximum(m_old, jnp.max(sc, axis=1, keepdims=True))
        alpha = jnp.exp(m_old - m_new)
        p = jnp.exp(sc - m_new)
        p = jnp.where(valid, p, 0.0)  # fully-masked blocks -> 0
        l_new = l_old * alpha + jnp.sum(p, axis=1, keepdims=True)

        vh = v2[:, h * hd:(h + 1) * hd].astype(jnp.float32)  # (Sb, hd)
        if has_scales:
            vh = vh * vs[:, h:h + 1]  # v scale folded in
        pv = jax.lax.dot_general(
            p, vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (G, hd)
        acc_ref[rows, :] = acc_ref[rows, :] * alpha + pv
        m_ref[rows, :] = jnp.broadcast_to(m_new, (G, m_ref.shape[1]))
        l_ref[rows, :] = jnp.broadcast_to(l_new, (G, l_ref.shape[1]))

    @pl.when(sb == n_sb - 1)
    def _():
        if has_fresh:
            fk2 = fk_ref[0]  # (1, Hkv*hd) f32
            fv2 = fv_ref[0]
            for h in range(Hkv):
                qh = q[h * G:(h + 1) * G]  # (G, hd)
                kh = fk2[:, h * hd:(h + 1) * hd] * sm_scale  # (1, hd)
                sc = jax.lax.dot_general(
                    qh, kh, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (G, 1)
                rows = slice(h * G, (h + 1) * G)
                m_old = m_ref[rows, 0:1]
                l_old = l_ref[rows, 0:1]
                m_new = jnp.maximum(m_old, sc)
                alpha = jnp.exp(m_old - m_new)
                p = jnp.exp(sc - m_new)  # (G, 1)
                l_new = l_old * alpha + p
                vh = fv2[:, h * hd:(h + 1) * hd]  # (1, hd)
                acc_ref[rows, :] = acc_ref[rows, :] * alpha + p * vh
                m_ref[rows, :] = jnp.broadcast_to(m_new,
                                                  (G, m_ref.shape[1]))
                l_ref[rows, :] = jnp.broadcast_to(l_new,
                                                  (G, l_ref.shape[1]))
        out_ref[0] = acc_ref[:] / l_ref[:, 0:1]


def _pick_sb(S: int, row_bytes: int) -> int:
    """S-block size: largest power-of-two divisor of S whose k+v slabs
    (double-buffered by the pipeline) fit a ~2 MB VMEM budget per slab —
    512 rows for int8 llama-7B shapes, 256 for bf16."""
    prefer = 512
    while prefer > 128 and prefer * row_bytes > 2 * 1024 * 1024:
        prefer //= 2
    sb = min(prefer, S)
    while S % sb:
        sb //= 2
    return max(sb, 1)


@functools.partial(jax.jit, static_argnames=("sm_scale", "interpret"))
def decode_attention(
    q: jax.Array,  # (B, H, hd) queries for ONE token, any float dtype
    k: jax.Array,  # (B, S, Hkv, hd) cache: int8 (with scales) or bf16/f32
    v: jax.Array,
    length: jax.Array,  # scalar or (B,): attend to positions < length
    sm_scale: float,
    k_scale: jax.Array | None = None,  # (B, S, Hkv) f32 per-token-head
    v_scale: jax.Array | None = None,  # scales (int8 cache only)
    fresh_k: jax.Array | None = None,  # (B, Hkv, hd) the current token's
    fresh_v: jax.Array | None = None,  # own k/v, NOT yet in the buffer
    interpret: bool = False,
) -> jax.Array:
    """Single-token flash-style decode attention straight off the cache
    slabs (no (T, S) score materialization, no cache dequant copy).
    With fresh_k/fresh_v, the current token's pair merges into the online
    softmax exactly (deferred-cache-write decode: slots < length come
    from the buffer, the token itself from registers).
    Returns (B, H, hd) f32 attention output."""
    import os

    B, H, hd = q.shape
    S, Hkv = k.shape[1], k.shape[2]
    if hd % 128 == 0 and os.environ.get("GPTQ_TPU_ATTN_WIDE", "1") != "0":
        # all-heads-per-dot variant: 3 wide MXU dots per S block instead
        # of Hkv sequential matvec-shaped dots (chip: the head loop was
        # issue-bound, ~420 us/layer at S=8k vs the ~90 us byte floor)
        return decode_attention_wide(
            q, k, v, length, sm_scale, k_scale=k_scale, v_scale=v_scale,
            fresh_k=fresh_k, fresh_v=fresh_v, interpret=interpret)
    G = H // Hkv
    has_scales = k_scale is not None
    has_fresh = fresh_k is not None
    lens = jnp.broadcast_to(jnp.asarray(length, jnp.int32), (B,)).reshape(B, 1)
    Sb = _pick_sb(S, Hkv * hd * k.dtype.itemsize)
    n_sb = S // Sb

    k2 = k.reshape(B, S, Hkv * hd)  # free reshape: lane-merge of (Hkv, hd)
    v2 = v.reshape(B, S, Hkv * hd)

    slab = [pl.BlockSpec((1, Sb, Hkv * hd), lambda b, s: (b, s, 0),
                         memory_space=pltpu.VMEM)] * 2
    fresh = [pl.BlockSpec((1, 1, Hkv * hd), lambda b, s: (b, 0, 0),
                          memory_space=pltpu.VMEM)] * 2 if has_fresh else []
    scales = [pl.BlockSpec((1, Sb, Hkv), lambda b, s: (b, s, 0),
                           memory_space=pltpu.VMEM)] * 2 if has_scales else []
    operands = ([lens, q.astype(jnp.float32), k2, v2]
                + ([fresh_k.astype(jnp.float32).reshape(B, 1, Hkv * hd),
                    fresh_v.astype(jnp.float32).reshape(B, 1, Hkv * hd)]
                   if has_fresh else [])
                + ([k_scale, v_scale] if has_scales else []))
    grid = (B, n_sb)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, float(sm_scale), G, Sb, n_sb,
                          Hkv, hd, has_scales, has_fresh),
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, 1), lambda b, s: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, H, hd), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + slab + fresh + scales,
        out_specs=pl.BlockSpec((1, H, hd), lambda b, s: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, hd), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((H, hd), jnp.float32),
            pltpu.VMEM((H, 128), jnp.float32),
            pltpu.VMEM((H, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*operands)
    return out


def decode_attention_int8(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    k_scale: jax.Array,
    v_scale: jax.Array,
    length: jax.Array,
    sm_scale: float,
    interpret: bool = False,
) -> jax.Array:
    """int8-cache decode attention (see decode_attention)."""
    return decode_attention(q, k, v, length, sm_scale,
                            k_scale=k_scale, v_scale=v_scale,
                            interpret=interpret)


# ---------------------------------------------------------------------------
# wide decode kernel: every head in one MXU dot per S block
# ---------------------------------------------------------------------------

def _attn_kernel_wide(G, Sb, n_sb, Hkv, hd, H, has_scales, has_fresh,
                      len_ref, qmat_ref, e_ref, ekv_ref, k_ref,
                      v_ref, *rest):
    """One (batch, S-block) program with ALL heads per dot.

    The head-loop kernel above issues Hkv sequential (G, hd) x (Sb, hd)
    matvec-shaped dots per block — VPU/issue-bound, chip-measured ~420
    us/layer at S=8k (worse than the XLA einsum on a dequantized copy).
    This variant restructures the whole block as three wide MXU dots:

      scores (Sb, H) = slab (Sb, Hkv*hd) @ qmat (Hkv*hd, H)
      p_exp (Sb, H*hd) = p (Sb, H) @ E (H, H*hd)
      out (1, H*hd)   = ones (1, Sb) @ (p_exp * v_slab_expanded)

    qmat is the query folded into a block-diagonal matrix (built by the
    caller in XLA: rows kv(h)*hd+d carry q[h, d] * sm_scale, zero
    elsewhere — GQA maps via kv(h) = h // G); E is the block-diagonal
    ones expander. int8 per-token-head scales fold on the SMALL (Sb, H)
    score/probability planes (ks @ ekv), never on the slabs."""
    idx = 0
    if has_fresh:
        fk_ref, fv_ref = rest[:2]
        idx = 2
    if has_scales:
        ks_ref, vs_ref = rest[idx:idx + 2]
        idx += 2
    out_ref, acc_ref, m_ref, l_ref = rest[idx:]
    sb = pl.program_id(1)
    length = len_ref[pl.program_id(0), 0]

    @pl.when(sb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    qmat = qmat_ref[0]  # (Hkv*hd, H) bf16, sm_scale folded
    e = e_ref[:]  # (H, H*hd) bf16 block-diag ones
    # blocks arrive in the cache's native (Sb, Hkv, hd) tiling and merge
    # to (Sb, Hkv*hd) INSIDE VMEM: a caller-side reshape of the carried
    # (L, B, S, Hkv, hd) buffer is a physical relayout XLA re-runs every
    # decode step (~2.7 ms/step at 8k) because the carry changes
    kb = k_ref[0, 0].reshape(Sb, Hkv * hd).astype(jnp.bfloat16)
    vb = v_ref[0, 0].reshape(Sb, Hkv * hd).astype(jnp.bfloat16)
    if G > 1:
        # GQA: the probability plane expands to H*hd lanes but the value
        # slab only has Hkv*hd — replicate each kv head's hd-lane block
        # per query head (static lane slices at hd multiples, a VMEM
        # copy of the slab x G; scores need no expansion, qmat's
        # block-diagonal already maps kv(h) = h // G)
        vb = jnp.concatenate(
            [vb[:, (h // G) * hd:(h // G + 1) * hd] for h in range(H)],
            axis=-1)  # (Sb, H*hd)

    sc = jax.lax.dot_general(kb, qmat, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (Sb, H)
    if has_scales:
        kse = jax.lax.dot_general(
            ks_ref[0, 0], ekv_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (Sb, H)
        sc = sc * kse
    pos = sb * Sb + jax.lax.broadcasted_iota(jnp.int32, (Sb, H), 0)
    valid = pos < length
    sc = jnp.where(valid, sc, NEG_INF)

    m_blk = jnp.max(sc, axis=0, keepdims=True)  # (1, H)
    m_new = jnp.maximum(m_ref[:], m_blk)
    alpha = jnp.exp(m_ref[:] - m_new)  # (1, H)
    p = jnp.exp(sc - m_new)  # (Sb, H)
    p = jnp.where(valid, p, 0.0)
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=0, keepdims=True)
    m_ref[:] = m_new

    if has_scales:
        vse = jax.lax.dot_general(
            vs_ref[0, 0], ekv_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        p = p * vse
    p_exp = jax.lax.dot_general(
        p.astype(jnp.bfloat16), e, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (Sb, H*hd)
    pv = jax.lax.dot_general(
        jnp.ones((1, Sb), jnp.bfloat16),
        (p_exp.astype(jnp.bfloat16) * vb), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (1, H*hd)
    alpha_exp = jax.lax.dot_general(
        alpha.astype(jnp.bfloat16), e, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_ref[:] = acc_ref[:] * alpha_exp + pv

    @pl.when(sb == n_sb - 1)
    def _():
        if has_fresh:
            fk = fk_ref[0].astype(jnp.bfloat16)  # (1, Hkv*hd)
            fv = fv_ref[0].astype(jnp.bfloat16)
            if G > 1:  # GQA value expansion, as for the slab above
                fv = jnp.concatenate(
                    [fv[:, (h // G) * hd:(h // G + 1) * hd]
                     for h in range(H)], axis=-1)  # (1, H*hd)
            scf = jax.lax.dot_general(fk, qmat, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            m_new = jnp.maximum(m_ref[:], scf)  # (1, H)
            alpha = jnp.exp(m_ref[:] - m_new)
            pf = jnp.exp(scf - m_new)  # (1, H)
            l_ref[:] = l_ref[:] * alpha + pf
            pf_exp = jax.lax.dot_general(
                pf.astype(jnp.bfloat16), e, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            alpha_exp = jax.lax.dot_general(
                alpha.astype(jnp.bfloat16), e, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc_ref[:] = acc_ref[:] * alpha_exp + pf_exp * fv
        l_exp = jax.lax.dot_general(
            l_ref[:].astype(jnp.bfloat16), e, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[0] = acc_ref[:] / l_exp


def _wide_operands(q, sm_scale, Hkv, hd):
    """(qmat, e, ekv) for the wide kernel, built in XLA per call:
    qmat (B, Hkv*hd, H) bf16 block-diagonal query (sm_scale folded),
    e (H, H*hd) bf16 block-diagonal ones, ekv (Hkv, H) f32 kv->H map."""
    B, H, hd_ = q.shape
    G = H // Hkv
    qt = jnp.swapaxes(q.astype(jnp.float32) * sm_scale, 1, 2)  # (B, hd, H)
    tiled = jnp.tile(qt, (1, Hkv, 1))  # (B, Hkv*hd, H)
    r = jnp.arange(Hkv * hd)[:, None]
    c = jnp.arange(H)[None, :]
    maskq = (r // hd) == (c // G)
    qmat = jnp.where(maskq[None], tiled, 0.0).astype(jnp.bfloat16)
    j = jnp.arange(H * hd)[None, :]
    h = jnp.arange(H)[:, None]
    e = ((j // hd) == h).astype(jnp.bfloat16)  # (H, H*hd)
    kh = jnp.arange(Hkv)[:, None]
    ekv = ((c // G) == kh).astype(jnp.float32)  # (Hkv, H)
    return qmat, e, ekv


@functools.partial(jax.jit, static_argnames=("sm_scale", "layer",
                                              "interpret"))
def decode_attention_wide(
    q: jax.Array,  # (B, H, hd)
    k: jax.Array,  # (B, S, Hkv, hd) or (L, B, S, Hkv, hd) with `layer`;
    v: jax.Array,  # int8 (with scales) or bf16/f32
    length: jax.Array,
    sm_scale: float,
    k_scale: jax.Array | None = None,  # (B, S, Hkv) / (L, B, S, Hkv)
    v_scale: jax.Array | None = None,
    fresh_k: jax.Array | None = None,
    fresh_v: jax.Array | None = None,
    layer: int | None = None,  # STATIC index into the leading L dim
    interpret: bool = False,
) -> jax.Array:
    """decode_attention through the wide (all-heads-per-dot) kernel.
    Same contract; requires hd and Hkv*hd to be lane-aligned (128).

    `layer`: the cache may pass as the WHOLE (L, B, S, Hkv, hd) stack
    with the layer chosen by a STATIC index in the block index_map. This
    is load-bearing twice over: XLA materializes a COPY of any sliced
    operand feeding a custom call (einsum operands fuse the slice; Pallas
    operands do not), ~70 MB/layer of hidden traffic at S=8k — and a
    DYNAMIC (scalar-prefetch) layer index defeats Mosaic's block
    pipelining (chip: 202 vs 45 us at S=2k). The model's layer loop is a
    Python loop, so the index is static by construction."""
    B, H, hd = q.shape
    stacked = layer is not None
    if not stacked:
        layer = 0
        k = k[None]
        v = v[None]
        if k_scale is not None:
            k_scale, v_scale = k_scale[None], v_scale[None]
    L, _, S, Hkv, _ = k.shape
    li = int(layer)
    G = H // Hkv
    has_scales = k_scale is not None
    has_fresh = fresh_k is not None
    lens = jnp.broadcast_to(jnp.asarray(length, jnp.int32), (B,)).reshape(B, 1)
    # temps are (Sb, H*hd) f32/bf16 — cap the block so three of them stay
    # well under VMEM alongside the double-buffered slabs
    Sb = min(_pick_sb(S, Hkv * hd * k.dtype.itemsize), 256)
    while S % Sb:
        Sb //= 2
    n_sb = S // Sb

    qmat, e, ekv = _wide_operands(q, float(sm_scale), Hkv, hd)

    in_specs = [
        pl.BlockSpec((B, 1), lambda b, s: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, Hkv * hd, H), lambda b, s: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((H, H * hd), lambda b, s: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Hkv, H), lambda b, s: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, Sb, Hkv, hd),
                     lambda b, s: (li, b, s, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, Sb, Hkv, hd),
                     lambda b, s: (li, b, s, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [lens, qmat, e, ekv, k, v]
    if has_fresh:
        in_specs += [pl.BlockSpec((1, 1, Hkv * hd),
                                  lambda b, s: (b, 0, 0),
                                  memory_space=pltpu.VMEM)] * 2
        operands += [fresh_k.astype(jnp.float32).reshape(B, 1, Hkv * hd),
                     fresh_v.astype(jnp.float32).reshape(B, 1, Hkv * hd)]
    if has_scales:
        in_specs += [pl.BlockSpec((1, 1, Sb, Hkv),
                                  lambda b, s: (li, b, s, 0),
                                  memory_space=pltpu.VMEM)] * 2
        operands += [k_scale, v_scale]

    out = pl.pallas_call(
        functools.partial(_attn_kernel_wide, G, Sb, n_sb, Hkv, hd, H,
                          has_scales, has_fresh),
        grid=(B, n_sb),
        in_specs=in_specs,
        # out as (B, 1, H*hd): a (1, H*hd) block over a (B, H*hd) array
        # fails Mosaic's sublane check the moment B > 1 (1 is neither a
        # multiple of 8 nor the full dim); with the explicit singleton
        # the block's last two dims equal the array's
        out_specs=pl.BlockSpec((1, 1, H * hd), lambda b, s: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, H * hd), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, H * hd), jnp.float32),
            pltpu.VMEM((1, H), jnp.float32),
            pltpu.VMEM((1, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*operands)
    return out.reshape(B, H, hd)


# ---------------------------------------------------------------------------
# wide partial (unnormalized) variant for context-parallel decode
# ---------------------------------------------------------------------------

def _attn_partial_wide_kernel(G, Sb, n_sb, Hkv, hd, H, has_scales,
                              has_slopes, *refs):
    """Wide (all-heads-per-MXU-dot) variant of _attn_partial_kernel: one
    (batch, S-block) program emitting UNNORMALIZED online-softmax state
    (m, l, acc) over content-masked slots. Same three-wide-dots block
    structure as _attn_kernel_wide; the slot position plane arrives as an
    (S, 1) column so validity/alibi broadcast over the (Sb, H) score
    plane without any in-kernel transpose."""
    idx = 0
    slopes_ref = None
    if has_slopes:
        slopes_ref = refs[idx]  # (1, H) VMEM
        idx += 1
    pos_ref, qmat_ref, e_ref, ekv_ref, k_ref, v_ref = refs[idx:idx + 6]
    idx += 6
    if has_scales:
        ks_ref, vs_ref = refs[idx:idx + 2]
        idx += 2
    acc_out, m_out, l_out, acc_ref, m_ref, l_ref = refs[idx:idx + 6]
    sb = pl.program_id(1)

    @pl.when(sb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    qmat = qmat_ref[0]  # (Hkv*hd, H) bf16, sm_scale folded
    e = e_ref[:]  # (H, H*hd) bf16 block-diag ones
    kb = k_ref[0, 0].reshape(Sb, Hkv * hd).astype(jnp.bfloat16)
    vb = v_ref[0, 0].reshape(Sb, Hkv * hd).astype(jnp.bfloat16)
    if G > 1:  # GQA value expansion (see _attn_kernel_wide)
        vb = jnp.concatenate(
            [vb[:, (h // G) * hd:(h // G + 1) * hd] for h in range(H)],
            axis=-1)  # (Sb, H*hd)

    sc = jax.lax.dot_general(kb, qmat, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (Sb, H)
    if has_scales:
        kse = jax.lax.dot_general(
            ks_ref[0, 0], ekv_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (Sb, H)
        sc = sc * kse
    pos = pos_ref[:]  # (Sb, 1) int32, -1 = empty
    valid = pos >= 0  # broadcasts over (Sb, H)
    if has_slopes:
        # HF BLOOM: slope * key_pos (the query position cancels in softmax)
        sc = sc + jnp.maximum(pos, 0).astype(jnp.float32) * slopes_ref[:]
    sc = jnp.where(valid, sc, NEG_INF)

    m_blk = jnp.max(sc, axis=0, keepdims=True)  # (1, H)
    m_new = jnp.maximum(m_ref[:], m_blk)
    alpha = jnp.exp(m_ref[:] - m_new)  # (1, H)
    p = jnp.exp(sc - m_new)  # (Sb, H)
    p = jnp.where(valid, p, 0.0)
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=0, keepdims=True)
    m_ref[:] = m_new

    if has_scales:
        vse = jax.lax.dot_general(
            vs_ref[0, 0], ekv_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        p = p * vse
    p_exp = jax.lax.dot_general(
        p.astype(jnp.bfloat16), e, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (Sb, H*hd)
    pv = jax.lax.dot_general(
        jnp.ones((1, Sb), jnp.bfloat16),
        (p_exp.astype(jnp.bfloat16) * vb), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (1, H*hd)
    alpha_exp = jax.lax.dot_general(
        alpha.astype(jnp.bfloat16), e, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_ref[:] = acc_ref[:] * alpha_exp + pv

    @pl.when(sb == n_sb - 1)
    def _():
        acc_out[0] = acc_ref[:]
        m_out[0] = m_ref[:]
        l_out[0] = l_ref[:]


@functools.partial(jax.jit, static_argnames=("sm_scale", "layer",
                                              "interpret"))
def decode_attention_partial_wide(
    q: jax.Array,  # (B, H, hd) queries for ONE token
    k: jax.Array,  # (B, S, Hkv, hd) or (L, B, S, Hkv, hd) with `layer`
    v: jax.Array,
    pos: jax.Array,  # (S,) int32 global position per slot, -1 = empty
    sm_scale: float,
    k_scale: jax.Array | None = None,  # (B, S, Hkv) / (L, B, S, Hkv)
    v_scale: jax.Array | None = None,
    slopes: jax.Array | None = None,  # (H,) alibi slopes
    layer: int | None = None,  # STATIC index into the leading L dim
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """decode_attention_partial through the wide kernel: same (m, l, acc)
    contract, but all heads per MXU dot and the cache consumable as the
    WHOLE (L, B, S, Hkv, hd) stack with a STATIC layer index (avoids
    XLA's sliced-operand copy + caller-side relayout before a custom
    call — the two hidden per-step costs decode_attention_wide killed on
    the flat path, DESIGN.md round 4). Requires hd % 128 == 0. Unlike the
    narrow partial kernel, alibi slopes compose with GQA (the bias is a
    (Sb, 1) x (1, H) outer product on the score plane)."""
    B, H, hd = q.shape
    stacked = layer is not None
    if not stacked:
        layer = 0
        k = k[None]
        v = v[None]
        if k_scale is not None:
            k_scale, v_scale = k_scale[None], v_scale[None]
    L, _, S, Hkv, _ = k.shape
    li = int(layer)
    G = H // Hkv
    has_scales = k_scale is not None
    has_slopes = slopes is not None
    Sb = min(_pick_sb(S, Hkv * hd * k.dtype.itemsize), 256)
    while S % Sb:
        Sb //= 2
    n_sb = S // Sb

    qmat, e, ekv = _wide_operands(q, float(sm_scale), Hkv, hd)
    pos2 = jnp.asarray(pos, jnp.int32).reshape(S, 1)

    in_specs = []
    operands = []
    if has_slopes:
        in_specs.append(pl.BlockSpec((1, H), lambda b, s: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(slopes.astype(jnp.float32).reshape(1, H))
    in_specs += [
        pl.BlockSpec((Sb, 1), lambda b, s: (s, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Hkv * hd, H), lambda b, s: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((H, H * hd), lambda b, s: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Hkv, H), lambda b, s: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, Sb, Hkv, hd), lambda b, s: (li, b, s, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, Sb, Hkv, hd), lambda b, s: (li, b, s, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands += [pos2, qmat, e, ekv, k, v]
    if has_scales:
        in_specs += [pl.BlockSpec((1, 1, Sb, Hkv),
                                  lambda b, s: (li, b, s, 0),
                                  memory_space=pltpu.VMEM)] * 2
        operands += [k_scale, v_scale]

    acc, m, l = pl.pallas_call(
        functools.partial(_attn_partial_wide_kernel, G, Sb, n_sb, Hkv, hd,
                          H, has_scales, has_slopes),
        grid=(B, n_sb),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, H * hd), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, H * hd), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, H), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, H * hd), jnp.float32),
            pltpu.VMEM((1, H), jnp.float32),
            pltpu.VMEM((1, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*operands)
    return m[:, 0], l[:, 0], acc.reshape(B, H, hd)


# ---------------------------------------------------------------------------
# partial (unnormalized) variant for context-parallel decode
# ---------------------------------------------------------------------------

def _attn_partial_kernel(sm_scale, G, Sb, n_sb, Hkv, hd, has_scales,
                         has_slopes, *refs):
    """One (batch, S-block) program emitting UNNORMALIZED online-softmax
    state (m, l, acc) instead of acc/l — the caller combines partials
    exactly across devices (parallel/sp.py SPCache decode). Slots mask by
    CONTENT: a position plane (-1 = empty) replaces the contiguous
    `length` bound of _attn_kernel, because SPCache slots fill round-robin
    and are never contiguous. Optional per-head alibi slopes add
    slope * position to the scores (BLOOM; slopes are scalar per kv head
    — alibi models have no GQA, G == 1)."""
    idx = 0
    slopes_ref = None
    if has_slopes:
        slopes_ref = refs[idx]
        idx += 1
    pos_ref, q_ref, k_ref, v_ref = refs[idx:idx + 4]
    idx += 4
    if has_scales:
        ks_ref, vs_ref = refs[idx:idx + 2]
        idx += 2
    acc_out, m_out, l_out, acc_ref, m_ref, l_ref = refs[idx:idx + 6]
    sb = pl.program_id(1)

    @pl.when(sb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0].astype(jnp.float32)  # (H, hd)
    k2 = k_ref[0]  # (Sb, Hkv*hd)
    v2 = v_ref[0]
    if has_scales:
        ks = ks_ref[0]  # (Sb, Hkv) f32
        vs = vs_ref[0]

    pos = pos_ref[0:1, :]  # (1, Sb) int32 global positions, -1 = empty
    valid = jnp.broadcast_to(pos >= 0, (G, Sb))
    pos_f = jnp.broadcast_to(pos.astype(jnp.float32), (G, Sb))

    for h in range(Hkv):
        qh = q[h * G:(h + 1) * G]  # (G, hd)
        kh = k2[:, h * hd:(h + 1) * hd].astype(jnp.float32)
        kh = kh * (ks[:, h:h + 1] * sm_scale) if has_scales \
            else kh * sm_scale  # (Sb, hd)
        sc = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (G, Sb)
        if has_slopes:
            # HF BLOOM: slope * key_pos (query pos cancels in softmax)
            sc = sc + slopes_ref[0, h] * pos_f
        sc = jnp.where(valid, sc, NEG_INF)

        rows = slice(h * G, (h + 1) * G)
        m_old = m_ref[rows, 0:1]  # (G, 1)
        l_old = l_ref[rows, 0:1]
        m_new = jnp.maximum(m_old, jnp.max(sc, axis=1, keepdims=True))
        alpha = jnp.exp(m_old - m_new)
        p = jnp.exp(sc - m_new)
        p = jnp.where(valid, p, 0.0)  # fully-masked blocks -> 0
        l_new = l_old * alpha + jnp.sum(p, axis=1, keepdims=True)

        vh = v2[:, h * hd:(h + 1) * hd].astype(jnp.float32)
        if has_scales:
            vh = vh * vs[:, h:h + 1]
        pv = jax.lax.dot_general(
            p, vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (G, hd)
        acc_ref[rows, :] = acc_ref[rows, :] * alpha + pv
        m_ref[rows, :] = jnp.broadcast_to(m_new, (G, m_ref.shape[1]))
        l_ref[rows, :] = jnp.broadcast_to(l_new, (G, l_ref.shape[1]))

    @pl.when(sb == n_sb - 1)
    def _():
        acc_out[0] = acc_ref[:]
        m_out[0] = m_ref[:]
        l_out[0] = l_ref[:]


@functools.partial(jax.jit, static_argnames=("sm_scale", "interpret"))
def decode_attention_partial(
    q: jax.Array,  # (B, H, hd) queries for ONE token
    k: jax.Array,  # (B, S, Hkv, hd) local cache slots: int8 or bf16/f32
    v: jax.Array,
    pos: jax.Array,  # (S,) int32 global position per slot, -1 = empty
    sm_scale: float,
    k_scale: jax.Array | None = None,  # (B, S, Hkv) f32 (int8 slots only)
    v_scale: jax.Array | None = None,
    slopes: jax.Array | None = None,  # (H,) alibi slopes (BLOOM; needs G=1)
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Partial flash-style decode attention over content-masked slots.

    Returns UNNORMALIZED online-softmax state per (batch, head):
    m (B, H) running max (NEG_INF where no slot is valid), l (B, H)
    denominator, acc (B, H, hd) weighted value sum with shift m — exactly
    what parallel/sp.py's pmax+psum cross-device combine consumes. The
    fused int8 path reads half the cache bytes of the materialized jnp
    dequant (the same win ops/attention.decode_attention realizes for the
    flat int8 cache, here per sp shard)."""
    B, H, hd = q.shape
    S, Hkv = k.shape[1], k.shape[2]
    G = H // Hkv
    has_scales = k_scale is not None
    has_slopes = slopes is not None
    if has_slopes and G != 1:
        raise ValueError(f"alibi slopes need G=1 (got H={H}, Hkv={Hkv})")
    Sb = _pick_sb(S, Hkv * hd * k.dtype.itemsize)
    n_sb = S // Sb

    k2 = k.reshape(B, S, Hkv * hd)
    v2 = v.reshape(B, S, Hkv * hd)
    pos2 = jnp.broadcast_to(jnp.asarray(pos, jnp.int32), (1, S))

    in_specs = []
    operands = []
    if has_slopes:
        in_specs.append(pl.BlockSpec((1, H), lambda b, s: (0, 0),
                                     memory_space=pltpu.SMEM))
        operands.append(slopes.astype(jnp.float32).reshape(1, H))
    in_specs += [
        pl.BlockSpec((1, Sb), lambda b, s: (0, s), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, H, hd), lambda b, s: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Sb, Hkv * hd), lambda b, s: (b, s, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Sb, Hkv * hd), lambda b, s: (b, s, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands += [pos2, q.astype(jnp.float32), k2, v2]
    if has_scales:
        in_specs += [pl.BlockSpec((1, Sb, Hkv), lambda b, s: (b, s, 0),
                                  memory_space=pltpu.VMEM)] * 2
        operands += [k_scale, v_scale]

    out_spec = [
        pl.BlockSpec((1, H, hd), lambda b, s: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, H, 128), lambda b, s: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, H, 128), lambda b, s: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    acc, m, l = pl.pallas_call(
        functools.partial(_attn_partial_kernel, float(sm_scale), G, Sb,
                          n_sb, Hkv, hd, has_scales, has_slopes),
        grid=(B, n_sb),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, H, hd), jnp.float32),
            jax.ShapeDtypeStruct((B, H, 128), jnp.float32),
            jax.ShapeDtypeStruct((B, H, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((H, hd), jnp.float32),
            pltpu.VMEM((H, 128), jnp.float32),
            pltpu.VMEM((H, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*operands)
    return m[:, :, 0], l[:, :, 0], acc
