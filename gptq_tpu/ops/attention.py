"""Decode attention over the int8 KV cache — fused dequant, no
materialization.

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


def _attn_kernel(sm_scale, G, Sb, n_sb, len_ref, q_ref, k_ref, v_ref,
                 ks_ref, vs_ref, out_ref, acc_ref, m_ref, l_ref):
    """One (batch, S-block) program; online softmax across S blocks."""
    sb = pl.program_id(1)
    length = len_ref[0, 0]
    Hkv = k_ref.shape[2]
    hd = k_ref.shape[3]

    @pl.when(sb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0].reshape(Hkv, G, hd).astype(jnp.float32)  # leading split
    kf = k_ref[0].astype(jnp.float32)  # (Sb, Hkv, hd)
    ks = ks_ref[0]  # (Sb, Hkv)
    vs = vs_ref[0]

    pos = sb * Sb + jax.lax.broadcasted_iota(jnp.int32, (Sb, Hkv), 0)
    valid = pos < length  # (Sb, Hkv)

    m_old = m_ref[:, 0].reshape(Hkv, G)
    l_old = l_ref[:, 0].reshape(Hkv, G)
    acc = acc_ref[:].reshape(Hkv, G, hd)

    # scores + probabilities per query-group row (G is small; static loop)
    scs = []
    for g in range(G):
        raw = jnp.sum(q[None, :, g, :] * kf, axis=-1)  # (Sb, Hkv)
        scs.append(raw * ks * sm_scale)
    sc = jnp.stack(scs, axis=-1)  # (Sb, Hkv, G)
    sc = jnp.where(valid[:, :, None], sc, NEG_INF)

    m_blk = jnp.max(sc, axis=0)  # (Hkv, G)
    m_new = jnp.maximum(m_old, m_blk)
    alpha = jnp.exp(m_old - m_new)
    p = jnp.exp(sc - m_new[None])
    p = jnp.where(valid[:, :, None], p, 0.0)  # fully-masked blocks -> 0
    l_new = l_old * alpha + jnp.sum(p, axis=0)

    vf = v_ref[0].astype(jnp.float32) * vs[:, :, None]  # (Sb, Hkv, hd)
    pvs = []
    for g in range(G):
        pvs.append(jnp.sum(p[:, :, g, None] * vf, axis=0))  # (Hkv, hd)
    pv = jnp.stack(pvs, axis=1)  # (Hkv, G, hd)
    acc = acc * alpha[:, :, None] + pv

    acc_ref[:] = acc.reshape(Hkv * G, hd)
    m_ref[:] = jnp.broadcast_to(m_new.reshape(Hkv * G, 1), m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new.reshape(Hkv * G, 1), l_ref.shape)

    @pl.when(sb == n_sb - 1)
    def _():
        out_ref[0] = acc_ref[:] / l_ref[:, 0][:, None]


def _pick_sb(S: int, prefer: int = 512) -> int:
    sb = min(prefer, S)
    while S % sb:
        sb //= 2
    return max(sb, 1)


@functools.partial(jax.jit, static_argnames=("sm_scale", "interpret"))
def decode_attention_int8(
    q: jax.Array,  # (B, H, hd) queries for ONE token, any float dtype
    k: jax.Array,  # (B, S, Hkv, hd) int8 cache
    v: jax.Array,
    k_scale: jax.Array,  # (B, S, Hkv) f32 per-token-head scales
    v_scale: jax.Array,
    length: jax.Array,  # scalar or (B,): attend to positions < length
    sm_scale: float,
    interpret: bool = False,
) -> jax.Array:
    """Returns (B, H, hd) f32 attention output."""
    B, H, hd = q.shape
    S, Hkv = k.shape[1], k.shape[2]
    G = H // Hkv
    lens = jnp.broadcast_to(jnp.asarray(length, jnp.int32), (B,)).reshape(B, 1)
    Sb = _pick_sb(S)
    n_sb = S // Sb

    grid = (B, n_sb)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, float(sm_scale), G, Sb, n_sb),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda b, s: (b, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, H, hd), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Sb, Hkv, hd), lambda b, s: (b, s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Sb, Hkv, hd), lambda b, s: (b, s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Sb, Hkv), lambda b, s: (b, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Sb, Hkv), lambda b, s: (b, s, 0),
                         memory_space=pltpu.VMEM),
        ],
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
    )(lens, q.astype(jnp.float32), k, v, k_scale, v_scale)
    return out
