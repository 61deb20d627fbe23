"""The whole decoder layer at decode time in ONE Pallas launch.

Fuses, per token (llama-family: pre-norm rmsnorm, rope, GLU MLP, no
biases):

    ln1 -> fused q/k/v dequant-matmul -> rope(q, k)
        -> flash-style attention over the cache slabs
        -> o -> +residual -> ln2 -> gateup -> act -> down -> +residual

On top of ops/ffn.py's streamed matmuls (two launches/layer) this removes
the remaining XLA glue (rope, two dynamic_update_slices, reshapes) and the
inter-launch gaps, and overlaps the attention cache-slab DMAs with the
qkv matmul (slab reads depend on nothing, so they start at kernel entry).

Everything stays in flat lane-sliced form — no relayouts anywhere:
  * q/k per head are static LANE slices of the fused qkv output row,
  * rope is lane-half arithmetic on those slices,
  * per-head attention outputs accumulate into lane slices of a flat
    (1, H*hd) buffer that feeds the o matmul directly.

The fresh token's k/v are handled ANALYTICALLY in the online softmax
(one extra score per head); the kernel emits the roped k/v rows and the
caller's dynamic_update_slice places them (a single dynamic cache row is
not a tile-aligned DMA rectangle, so the write stays in XLA — in-place
under the scan's buffer donation, ~4 us).

No reference counterpart (the reference serves one CUDA matvec per
linear, quant.py:189-203, with torch glue between); this is the terminal
point of the TPU fused-decode-layer design (DESIGN.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gptq_tpu.ops.attention import _pick_sb
from gptq_tpu.ops.pack import PackedWeight
from gptq_tpu.ops.ffn import (_apply_act, _apply_norm, _mm_specs, _n_words,
                              _phase_scratch, _prep_acts, _start_first_dmas,
                              _stream_matmul, _streamable, _take_bufs,
                              ffn_fusable)

NEG_INF = -1e9


def layer_fusable(qkv: PackedWeight, splits, o: PackedWeight,
                  gu: PackedWeight, dn: PackedWeight,
                  hidden: int, n_heads: int, n_kv_heads: int,
                  head_dim: int | None = None) -> bool:
    """Can decode_layer_fused serve this block? Mirrors attn_mlp_fusable
    plus: exact stored widths on every qkv part (rope/cache lane slicing
    needs q at [0:H*hd), k/v contiguous after it), even hd (lane-half
    rope), o reads exactly H*hd and o/dn project back to exactly
    `hidden` stored columns."""
    hd = head_dim or hidden // n_heads
    kvw = n_kv_heads * hd
    if any(ns != nl for ns, nl in splits.parts):
        return False
    if tuple(nl for _, nl in splits.parts) != (n_heads * hd, kvw, kvw):
        return False
    for pw in (qkv, o, gu, dn):
        # uniform only: BCQ serving measures faster on its bitplane grid
        # kernel (models/common._stream_preferred)
        if pw.fmt != "uniform" or not _streamable(pw):
            return False
    if qkv.Kp != qkv.K or o.Np != o.N or dn.Np != dn.N:
        return False
    if o.Kp != o.K or o.K != n_heads * hd or o.Np != hidden:
        return False
    if dn.Np != hidden:
        return False
    if hd % 2:
        return False
    return ffn_fusable(gu, dn, glu=True)


def _rope_inplace(buf, cos, sin, off, n, hd):
    """Rope `n` heads in place on lane slices [off, off + n*hd) of row 0
    of `buf` (rotate_half convention, models/common.apply_rope). Static
    lane-slice reads before writes — no relayout, no concatenate."""
    half = hd // 2
    c1, c2 = cos[:, :half], cos[:, half:]
    s1, s2 = sin[:, :half], sin[:, half:]
    for h in range(n):
        o1 = off + h * hd
        x1 = buf[0:1, o1:o1 + half]
        x2 = buf[0:1, o1 + half:o1 + hd]
        buf[0:1, o1:o1 + half] = x1 * c1 - x2 * s1
        buf[0:1, o1 + half:o1 + hd] = x2 * c2 + x1 * s2


def _layer_kernel(act, norm, eps, sm_scale, a8, H, Hkv, hd, S, Sb,
                  spec_q, spec_o, spec_g, spec_d,
                  len_ref, x_ref, cos_ref, sin_ref, ln1_ref, ln2_ref,
                  q_scale, q_zoff, o_scale, o_zoff, gu_scale, gu_zoff,
                  dn_scale, dn_zoff, k_in, v_in, *rest):
    # outputs: y + the roped fresh k/v rows (cache write happens in XLA)
    nw = [_n_words(s) for s in (spec_q, spec_o, spec_g, spec_d)]
    words_q = rest[:nw[0]]
    words_o = rest[nw[0]:nw[0] + nw[1]]
    words_g = rest[nw[0] + nw[1]:nw[0] + nw[1] + nw[2]]
    words_d = rest[sum(nw[:3]):sum(nw)]
    (y_ref, kf_ref, vf_ref, qkvbuf, attnbuf, obuf, inner_ref,
     m_ref, l_ref, slab_k, slab_v, slab_sem, *bufrefs) = rest[sum(nw):]
    i0 = 0
    q_bufs, i0 = _take_bufs(bufrefs, spec_q, i0)
    o_bufs, i0 = _take_bufs(bufrefs, spec_o, i0)
    g_bufs, i0 = _take_bufs(bufrefs, spec_g, i0)
    d_bufs, i0 = _take_bufs(bufrefs, spec_d, i0)

    length = len_ref[0, 0]
    kvw = Hkv * hd
    n_sb = S // Sb
    n_slab = min(n_sb, 3)
    G = H // Hkv

    def slab_dma(b, slot):
        ck = pltpu.make_async_copy(
            k_in.at[0, pl.ds(b * Sb, Sb), :], slab_k.at[slot],
            slab_sem.at[slot, 0])
        cv = pltpu.make_async_copy(
            v_in.at[0, pl.ds(b * Sb, Sb), :], slab_v.at[slot],
            slab_sem.at[slot, 1])
        return ck, cv

    # cache slabs + every phase's chunk-0 weights: all DMAs that depend on
    # nothing start at kernel entry and overlap the qkv matmul
    for c in slab_dma(0, 0):
        c.start()
    if n_sb > 1:
        for c in slab_dma(1, 1):
            c.start()
    _start_first_dmas(words_q, q_bufs, spec_q)
    _start_first_dmas(words_o, o_bufs, spec_o)
    _start_first_dmas(words_g, g_bufs, spec_g)
    _start_first_dmas(words_d, d_bufs, spec_d)

    # ---- phase 1: ln1 + fused qkv matmul ----
    x = x_ref[:].astype(jnp.float32)
    h1 = _apply_norm(x, ln1_ref, None, norm, eps)
    h8, sx = _prep_acts(h1, a8)
    _stream_matmul(h8, sx, words_q, q_scale, q_zoff, qkvbuf,
                   spec_q, q_bufs, prestarted=True)

    # ---- rope + fresh-row cache write ----
    cos = cos_ref[:].astype(jnp.float32)
    sin = sin_ref[:].astype(jnp.float32)
    _rope_inplace(qkvbuf, cos, sin, 0, H, hd)
    _rope_inplace(qkvbuf, cos, sin, H * hd, Hkv, hd)
    qrow = qkvbuf[0:1, :H * hd] * sm_scale
    krow = qkvbuf[0:1, H * hd:H * hd + kvw]
    vrow = qkvbuf[0:1, H * hd + kvw:H * hd + 2 * kvw]
    kf_ref[:, :] = krow.astype(kf_ref.dtype)
    vf_ref[:, :] = vrow.astype(vf_ref.dtype)

    # ---- phase 2: flash-style attention over the cache slabs ----
    # per-head online softmax with m/l state in hd-wide lane blocks of
    # VMEM refs (every lane of a head's block holds the same scalar), so
    # the S-block loop is a lax.fori_loop — the 32-head body compiles
    # ONCE regardless of S (a statically unrolled blocks x heads product
    # took ~20 min of Mosaic compile at 7B shapes)
    attnbuf[:] = jnp.zeros_like(attnbuf)  # pad rows feed the o matmul
    m_ref[:] = jnp.full_like(m_ref, NEG_INF)
    l_ref[:] = jnp.zeros_like(l_ref)

    slab_dma_dyn = slab_dma  # dynamic b/slot: same .at[...] indexing

    def attn_block(b, _):
        # prefetch distance 2 (slabs 0 and 1 are both in flight at kernel
        # entry) needs THREE slots: slab b+2 must not land in the slot the
        # head loop below is still reading slab b from
        slot = jax.lax.rem(b, n_slab)
        for c in slab_dma_dyn(b, slot):
            c.wait()

        @pl.when(b + 2 < n_sb)
        def _():
            for c in slab_dma_dyn(b + 2, jax.lax.rem(b + 2, n_slab)):
                c.start()

        pos = b * Sb + jax.lax.broadcasted_iota(jnp.int32, (1, Sb), 1)
        valid = pos < length
        for h in range(H):
            hk = h // G
            hs = slice(h * hd, (h + 1) * hd)
            qh = qrow[:, hs]
            kh = slab_k[slot, :, hk * hd:(hk + 1) * hd].astype(jnp.float32)
            sc = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # (1, Sb)
            sc = jnp.where(valid, sc, NEG_INF)
            m_old = m_ref[0:1, hs]  # (1, hd), all lanes equal
            m_new = jnp.maximum(
                m_old, jnp.broadcast_to(jnp.max(sc, axis=1, keepdims=True),
                                        (1, hd)))
            alpha = jnp.exp(m_old - m_new)
            p = jnp.where(valid, jnp.exp(sc - m_new[:, 0:1]), 0.0)
            vh = slab_v[slot, :, hk * hd:(hk + 1) * hd].astype(jnp.float32)
            pv = jax.lax.dot_general(
                p, vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (1, hd)
            l_ref[0:1, hs] = l_ref[0:1, hs] * alpha + jnp.broadcast_to(
                jnp.sum(p, axis=1, keepdims=True), (1, hd))
            attnbuf[0:1, hs] = attnbuf[0:1, hs] * alpha + pv
            m_ref[0:1, hs] = m_new
        return 0

    jax.lax.fori_loop(0, n_sb, attn_block, 0, unroll=False)
    # fresh token (it attends to itself; its k/v never re-read from HBM)
    for h in range(H):
        hk = h // G
        hs = slice(h * hd, (h + 1) * hd)
        qh = qrow[:, hs]
        kf = kf_ref[0:1, hk * hd:(hk + 1) * hd].astype(jnp.float32)
        vf = vf_ref[0:1, hk * hd:(hk + 1) * hd].astype(jnp.float32)
        sc = jnp.broadcast_to(jnp.sum(qh * kf, axis=1, keepdims=True),
                              (1, hd))
        m_old = m_ref[0:1, hs]
        m_new = jnp.maximum(m_old, sc)
        alpha = jnp.exp(m_old - m_new)
        p = jnp.exp(sc - m_new)
        l_new = l_ref[0:1, hs] * alpha + p
        attnbuf[0:1, hs] = (attnbuf[0:1, hs] * alpha + p * vf) / l_new

    # ---- phase 3: o + residual + ln2 + gateup + act + down + residual ----
    a8b, sxo = _prep_acts(attnbuf[:].astype(jnp.float32), a8)
    _stream_matmul(a8b, sxo, words_o, o_scale, o_zoff, obuf,
                   spec_o, o_bufs, prestarted=True)
    r2 = (x + obuf[:]).astype(jnp.bfloat16).astype(jnp.float32)
    m2 = _apply_norm(r2, ln2_ref, None, norm, eps)
    m8, sxg = _prep_acts(m2, a8)
    _stream_matmul(m8, sxg, words_g, gu_scale, gu_zoff, inner_ref,
                   spec_g, g_bufs, prestarted=True)
    half = spec_g.N // 2
    inner = _apply_act(act, inner_ref[:, :half], inner_ref[:, half:])
    i8, sxd = _prep_acts(inner, a8)
    _stream_matmul(i8, sxd, words_d, dn_scale, dn_zoff, y_ref,
                   spec_d, d_bufs, prestarted=True)
    y_ref[:] = y_ref[:] + r2


@functools.partial(
    jax.jit,
    static_argnames=("n_heads", "n_kv_heads", "head_dim", "act", "norm",
                     "eps", "sm_scale", "a8", "interpret"))
def decode_layer_fused(
    x: jax.Array,          # (1, 1, hidden) block input (pre-norm)
    k_cache: jax.Array,    # (1, S, Hkv, hd) bf16/f32 cache
    v_cache: jax.Array,
    length: jax.Array,     # scalar int: tokens already cached
    cos: jax.Array,        # (1, 1, hd) rope tables for THIS position
    sin: jax.Array,
    w_ln1: jax.Array, w_ln2: jax.Array,
    qkv: PackedWeight, o: PackedWeight, gu: PackedWeight, dn: PackedWeight,
    n_heads: int, n_kv_heads: int, head_dim: int | None = None,
    act: str = "silu", norm: str = "rmsnorm", eps: float = 1e-5,
    sm_scale: float = 1.0, a8: bool = True,
    interpret: bool = False,
):
    """Returns (y, k_cache', v_cache') — y (1, 1, hidden); caches aliased
    in place with the fresh roped k/v at row `length`."""
    B, S = k_cache.shape[0], k_cache.shape[1]
    assert B == 1 and x.shape[0] * x.shape[1] == 1
    hidden = x.shape[-1]
    hd = head_dim or hidden // n_heads
    kvw = n_kv_heads * hd
    k2 = k_cache.reshape(1, S, kvw)
    v2 = v_cache.reshape(1, S, kvw)
    Sb = _pick_sb(S, kvw * k_cache.dtype.itemsize)

    spec_q, spec_o = _mm_specs(qkv), _mm_specs(o)
    spec_g, spec_d = _mm_specs(gu), _mm_specs(dn)
    n_words = sum(len(p.words) for p in (qkv, o, gu, dn))
    Mp = 8
    x2 = jnp.pad(x.reshape(1, hidden).astype(jnp.float32),
                 ((0, Mp - 1), (0, 0)))
    lens = jnp.asarray(length, jnp.int32).reshape(1, 1)

    def vec(v):
        return v.astype(jnp.float32).reshape(1, -1)

    grids = []
    for p in (qkv, o, gu, dn):
        grids += [p.scale, p.zoff]

    n_slab_buf = min(S // Sb, 3)
    y, k_fresh, v_fresh = pl.pallas_call(
        functools.partial(
            _layer_kernel, act, norm, float(eps), float(sm_scale), a8,
            n_heads, n_kv_heads, hd, S, Sb, spec_q, spec_o, spec_g, spec_d),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 13
        + [pl.BlockSpec(memory_space=pl.ANY)] * (2 + n_words),
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((Mp, dn.Np), jnp.float32),
                   jax.ShapeDtypeStruct((1, kvw), k2.dtype),
                   jax.ShapeDtypeStruct((1, kvw), v2.dtype)],
        scratch_shapes=[
            pltpu.VMEM((Mp, qkv.Np), jnp.float32),   # qkvbuf
            pltpu.VMEM((Mp, o.Kp), jnp.float32),     # attnbuf
            pltpu.VMEM((Mp, o.Np), jnp.float32),     # obuf
            pltpu.VMEM((Mp, gu.Np), jnp.float32),    # inner
            pltpu.VMEM((1, n_heads * hd), jnp.float32),  # online-softmax m
            pltpu.VMEM((1, n_heads * hd), jnp.float32),  # online-softmax l
            pltpu.VMEM((n_slab_buf, Sb, kvw), k2.dtype),
            pltpu.VMEM((n_slab_buf, Sb, kvw), v2.dtype),
            pltpu.SemaphoreType.DMA((n_slab_buf, 2)),
        ]
        + _phase_scratch(spec_q) + _phase_scratch(spec_o)
        + _phase_scratch(spec_g) + _phase_scratch(spec_d),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(lens, x2, vec(cos), vec(sin), vec(w_ln1), vec(w_ln2),
      *[vec(g) if g.ndim == 1 else g.astype(jnp.float32) for g in grids],
      k2, v2, *qkv.words, *o.words, *gu.words, *dn.words)

    y = y[0:1, :hidden].reshape(1, 1, hidden)
    k_new = jax.lax.dynamic_update_slice(
        k2, k_fresh[None], (0, jnp.asarray(length, jnp.int32), 0))
    v_new = jax.lax.dynamic_update_slice(
        v2, v_fresh[None], (0, jnp.asarray(length, jnp.int32), 0))
    return (y, k_new.reshape(k_cache.shape), v_new.reshape(v_cache.shape))
