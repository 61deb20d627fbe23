"""BCQ bitplane matmul — the TPU formulation of LUT-GEMM.

The reference CUDA kernel builds a 256-entry shared-memory lookup table of
all +/- input partial sums per 8-input group and indexes it with weight
bytes (reference: lut_gemm/mv_fp16_bias.hpp:8-141). TPUs have no shared-mem
gather, but the mathematically identical sign-select form

    y[m,n] = sum_g sum_b alpha[g,b,n] * sum_{k in g} (2*bit_b[k,n]-1) x[m,k]

maps onto the VPU (bit unpack + select) and MXU (per-bitplane dot), sharing
the x tile across bitplanes in VMEM — the same input-reuse trick the LUT
exploits, without gathers (SURVEY.md §2.2 N3).

Like qmatmul, an XLA-fusion path doubles as the correctness oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gptq_tpu.ops.pack import PackedWeight, subblock, unpack_field


def _unpack_signs(words: jax.Array, groupsize: int = -1) -> jax.Array:
    """(bits, K//32, N) int32 -> (bits, K, N) f32 in {-1,+1}."""
    bits, Kw, N = words.shape
    K = Kw * 32
    planes = jnp.stack(
        [unpack_field(words[b], 1, K, groupsize) for b in range(bits)])
    return 2.0 * planes.astype(jnp.float32) - 1.0


def bcq_dequant(pw: PackedWeight) -> jax.Array:
    """Materialize (K, N) = sum_b alpha_b * B_b."""
    signs = _unpack_signs(pw.words[0], pw.groupsize)  # (bits, Kp, Np)
    ng = pw.alpha.shape[0]
    g = pw.Kp // ng
    a = jnp.repeat(pw.alpha, g, axis=0).transpose(1, 0, 2)  # (bits, Kp, Np)
    return jnp.sum(signs * a, axis=0)[:pw.K, :pw.N]


def _matmul_xla(x: jax.Array, pw: PackedWeight) -> jax.Array:
    w = bcq_dequant(pw)
    return jnp.dot(x.astype(jnp.float32), w, preferred_element_type=jnp.float32)


def _unpack_plane(w_b, tk, tn, sb):
    """One bitplane's words (tk//32, tn) -> int8 (tk, tn) bits in {0,1}.

    Byteplane order (see ops/pack.py): 8 sub-byte shifts x int8 bitcast,
    concatenated per subblock — ~0.5 VPU ops per code, no relayout."""
    rows_sb = sb // 8  # int8 rows per (subblock, plane): 4 * (sb/32)
    nsb = tk // sb
    planes = []
    for e in range(8):
        v = w_b if e == 0 else jax.lax.shift_right_logical(w_b, e)
        planes.append(pltpu.bitcast(v & 0x01010101, jnp.int8))
    if nsb == 1:
        return jnp.concatenate(planes, axis=0)
    pieces = [planes[e][s * rows_sb:(s + 1) * rows_sb]
              for s in range(nsb) for e in range(8)]
    return jnp.concatenate(pieces, axis=0)


def _bcq_kernel(bits, tk, tn, n_kt, sb, dot_dtype,
                x_ref, alpha_ref, words_ref, out_ref, acc_ref):
    """BCQ bitplane tile.

    Signs never materialize: with B in {0,1}, x @ (2B-1) = 2(x @ B) - sum(x),
    so the MXU consumes raw bitplanes and the per-(group,bit) alpha applies
    on the (M, tn) partial — the TPU form of the LUT's input-reuse."""
    kt = pl.program_id(1)
    ng_tile = alpha_ref.shape[0]
    cs = tk // ng_tile

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]
    if cs >= 128:
        acc = acc_ref[:]
        # stack all bitplanes along lanes -> ONE dot per group chunk
        # instead of bits x ng_tile small dots (each MXU call has fixed
        # pipeline overhead at tiny M)
        planes = [_unpack_plane(words_ref[b], tk, tn, sb)
                  for b in range(bits)]
        stack = planes[0] if bits == 1 else jnp.concatenate(planes, axis=1)
        int8_acts = dot_dtype == jnp.int8
        if dot_dtype not in (jnp.bfloat16, jnp.int8):
            stack = stack.astype(dot_dtype)
        acc_t = jnp.int32 if int8_acts else jnp.float32
        for gi in range(ng_tile):
            xg = x[:, gi * cs:(gi + 1) * cs]
            part = jnp.dot(xg, stack[gi * cs:(gi + 1) * cs],
                           preferred_element_type=acc_t)  # (M, bits*tn)
            xs = jnp.sum(xg.astype(jnp.int32) if int8_acts else
                         xg.astype(jnp.float32), axis=1, keepdims=True
                         ).astype(jnp.float32)
            for b in range(bits):
                pb = part[:, b * tn:(b + 1) * tn].astype(jnp.float32)
                acc = acc + alpha_ref[gi, b] * (2.0 * pb - xs)
        acc_ref[:] = acc
    else:
        # small groups: build the dequantized tile on the VPU
        reps = tk // ng_tile
        w = None
        for b in range(bits):
            sgn = 2.0 * _unpack_plane(words_ref[b], tk, tn, sb).astype(
                jnp.float32) - 1.0
            ab = alpha_ref[:, b, :]  # (ng_tile, tn)
            if reps > 1:
                a = jnp.broadcast_to(
                    ab[:, None, :], (ng_tile, reps, tn)).reshape(tk, tn)
            else:
                a = ab
            contrib = sgn * a
            w = contrib if w is None else w + contrib
        acc_ref[:] += jnp.dot(x.astype(jnp.float32), w,
                              preferred_element_type=jnp.float32)

    @pl.when(kt == n_kt - 1)
    def _():
        out_ref[:] = acc_ref[:]


def _matmul_pallas(x: jax.Array, pw: PackedWeight, tk: int = 0, tn: int = 0,
                   interpret: bool = False) -> jax.Array:
    from gptq_tpu.ops.qmatmul import _pick_tile

    M, K = x.shape
    if not tk or not tn:
        from gptq_tpu.ops.autotune import best_tiles

        tuned = best_tiles(pw.K, pw.N, pw.bits, pw.groupsize, pw.fmt, M)
        if tuned:
            tk, tn = tuned
        else:
            # like qmatmul: big tiles for decode shapes, smaller for large
            # M. bits x (tk, tn) bitplanes expand in VMEM, so stay below
            # qmatmul's defaults by ~bits/2
            tk, tn = (1024, 1024) if M <= 64 else (512, 256)
    N = pw.Np
    assert K == pw.Kp, (K, pw.Kp)
    bits = pw.bits
    sb = subblock(K, pw.groupsize)
    tk = _pick_tile(K, tk) if K % tk else min(tk, K)
    tk = max(tk, sb)
    tn = _pick_tile(N, tn) if N % tn else min(tn, N)
    assert K % tk == 0 and N % tn == 0 and tk % sb == 0
    n_kt, n_nt = K // tk, N // tn
    ng = pw.alpha.shape[0]
    g = K // ng
    if tk % g == 0:
        ng_tile = tk // g
        a_map = lambda nt, kt: (kt, 0, nt)
    else:
        assert g % tk == 0
        ng_tile = 1
        a_map = lambda nt, kt: ((kt * tk) // g, 0, nt)

    if x.dtype == jnp.int8:
        dot_dtype = jnp.int8
    elif x.dtype == jnp.bfloat16:
        dot_dtype = jnp.bfloat16
    else:
        dot_dtype = jnp.float32
    out = pl.pallas_call(
        functools.partial(_bcq_kernel, bits, tk, tn, n_kt, sb, dot_dtype),
        grid=(n_nt, n_kt),
        in_specs=[
            pl.BlockSpec((M, tk), lambda nt, kt: (0, kt), memory_space=pltpu.VMEM),
            pl.BlockSpec((ng_tile, bits, tn), a_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((bits, tk // 32, tn), lambda nt, kt: (0, kt, nt),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, tn), lambda nt, kt: (0, nt),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((M, tn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * K * N * bits,
            bytes_accessed=(K * N * bits) // 8 + M * K * 4 + M * N * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, pw.alpha, pw.words[0])
    return out


def bcq_matmul(x: jax.Array, pw: PackedWeight, impl: str = "auto",
               interpret: bool = False, a8: bool = False) -> jax.Array:
    """y = x @ bcq_dequant(pw) (+ bias). x: (..., K) -> (..., N). a8=True
    quantizes activations to int8 per row first (the kernel is linear in
    x, so the row scale folds in afterwards — same fast path as qmatmul)."""
    orig_dtype = x.dtype
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    if pw.perm is not None:
        x2 = x2[:, pw.perm]
    M = x2.shape[0]
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    sx = None
    if a8:
        from gptq_tpu.ops.qmatmul import quantize_acts_int8

        x2, sx = quantize_acts_int8(x2)
    if impl == "pallas":
        Mp = max(8, ((M + 7) // 8) * 8)
        if Mp != M or pw.Kp != pw.K:
            x2 = jnp.pad(x2, ((0, Mp - M), (0, pw.Kp - pw.K)))
        y = _matmul_pallas(x2, pw, interpret=interpret)[:M, :pw.N]
    else:
        y = _matmul_xla(x2.astype(jnp.float32) if a8 else x2, pw)
    if sx is not None:
        y = y * sx
    if pw.bias is not None:
        y = y + pw.bias
    return y.reshape(*lead, pw.N).astype(orig_dtype)
