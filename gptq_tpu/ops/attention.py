"""Decode attention over the int8 KV cache — fused dequant, no
materialization.

The int8 cache halves HBM footprint and stream bandwidth, but the win is
only real if attention CONSUMES int8 + scales directly: the previous path
materialized the whole dequantized cache in f32 before the einsum
(models/common.py), so the bytes read were f32 and the cache saving was
thrown away (measured 9.69 vs 9.96 ms/token at a 1536 prefix — noise).

This kernel reads the cache slabs once, as int8:

    scores[g, s] = sm_scale * ks[s] * (q[g, :] . k[s, :])     (bf16 x int8 MXU)
    p = softmax(scores + mask)                                 (VPU, f32)
    out[g, :]   = sum_s (p[g, s] * vs[s]) * v[s, :]            (bf16 x int8 MXU)

Per-token-head absmax scales (ks/vs) fold into the score/probability
epilogues, so the MXU contractions run on raw int8 cache values. Grid is
(batch, kv_heads); each program handles one kv head's GQA query group
against its full (max_len, hd) cache slab in VMEM. max_len slabs to 2048
(256 KB int8) fit trivially; longer contexts would block over S with an
online softmax (flash pattern) — not needed at reference scales.

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


def _attn_kernel(sm_scale, G, S, hd, len_ref, q_ref, k_ref, v_ref,
                 ks_ref, vs_ref, out_ref):
    """One (batch, kv_head) program: q group (G, hd) vs cache slab (S, hd)."""
    length = len_ref[0, 0]
    q = q_ref[0, 0]  # (G, hd) bf16
    k = k_ref[0, :, 0, :]  # (S, hd) int8
    v = v_ref[0, :, 0, :]
    ks = ks_ref[0, :, 0]  # (S,) f32
    vs = vs_ref[0, :, 0]

    # scores: contract hd; bf16 x int8 is a native MXU mode
    raw = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (G, S)
    scores = raw * (ks * sm_scale)[None, :]
    s_pos = jax.lax.broadcasted_iota(jnp.int32, (G, S), 1)
    scores = jnp.where(s_pos < length, scores, NEG_INF)
    m = jnp.max(scores, axis=1, keepdims=True)
    e = jnp.exp(scores - m)
    denom = jnp.sum(e, axis=1, keepdims=True)
    # fold the v scales into the probabilities; bf16 probs feed the MXU
    p = (e / denom) * vs[None, :]
    out = jax.lax.dot_general(
        p.astype(jnp.bfloat16), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (G, hd)
    out_ref[0, 0] = out


@functools.partial(jax.jit, static_argnames=("sm_scale", "interpret"))
def decode_attention_int8(
    q: jax.Array,  # (B, H, hd) queries for ONE token, any float dtype
    k: jax.Array,  # (B, S, Hkv, hd) int8 cache
    v: jax.Array,
    k_scale: jax.Array,  # (B, S, Hkv) f32 per-token-head scales
    v_scale: jax.Array,
    length: jax.Array,  # scalar int32: attend to positions < length
    sm_scale: float,
    interpret: bool = False,
) -> jax.Array:
    """Returns (B, H, hd) f32 attention output."""
    B, H, hd = q.shape
    S, Hkv = k.shape[1], k.shape[2]
    G = H // Hkv
    qg = q.reshape(B, Hkv, G, hd).astype(jnp.bfloat16)
    # length: scalar, or (B,) per-slot prefix lengths (continuous batching)
    lens = jnp.broadcast_to(jnp.asarray(length, jnp.int32), (B,)).reshape(B, 1)

    grid = (B, Hkv)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, float(sm_scale), G, S, hd),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda b, h: (b, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, G, hd), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, 1, hd), lambda b, h: (b, 0, h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, 1, hd), lambda b, h: (b, 0, h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, 1), lambda b, h: (b, 0, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, 1), lambda b, h: (b, 0, h),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, G, hd), lambda b, h: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G, hd), jnp.float32),
        interpret=interpret,
    )(lens, qg, k, v, k_scale, v_scale)
    return out.reshape(B, H, hd)
