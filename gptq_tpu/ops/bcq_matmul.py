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

from gptq_tpu.ops.pack import PackedWeight


def _unpack_signs(words: jax.Array) -> jax.Array:
    """(bits, K//32, N) int32 -> (bits, K, N) f32 in {-1,+1}."""
    bits, Kw, N = words.shape
    wu = words.astype(jnp.uint32)
    shifts = jax.lax.broadcasted_iota(jnp.uint32, (1, 1, 32, 1), 2)
    planes = (wu[:, :, None, :] >> shifts) & 1
    signs = planes.reshape(bits, Kw * 32, N).astype(jnp.float32)
    return 2.0 * signs - 1.0


def bcq_dequant(pw: PackedWeight) -> jax.Array:
    """Materialize (K, N) = sum_b alpha_b * B_b."""
    signs = _unpack_signs(pw.words[0])  # (bits, K, N)
    ng = pw.alpha.shape[0]
    g = pw.K // ng
    a = jnp.repeat(pw.alpha, g, axis=0).transpose(1, 0, 2)  # (bits, K, N)
    return jnp.sum(signs * a, axis=0)


def _matmul_xla(x: jax.Array, pw: PackedWeight) -> jax.Array:
    w = bcq_dequant(pw)
    return jnp.dot(x.astype(jnp.float32), w, preferred_element_type=jnp.float32)


def _bcq_kernel(bits, tk, tn, n_kt, x_ref, alpha_ref, words_ref, out_ref, acc_ref):
    kt = pl.program_id(1)
    x = x_ref[:].astype(jnp.float32)  # (M, tk)

    # unpack each bitplane, scale by its per-group alpha, accumulate weight
    wu = words_ref[:].astype(jnp.uint32)  # (bits, tk//32, tn)
    ng_tile = alpha_ref.shape[0]
    reps = tk // ng_tile
    w = None
    for b in range(bits):
        shifts = jax.lax.broadcasted_iota(jnp.uint32, (1, 32, 1), 1)
        plane = (wu[b][:, None, :] >> shifts) & 1  # (tk//32, 32, tn)
        sgn = 2.0 * plane.reshape(tk, tn).astype(jnp.float32) - 1.0
        ab = alpha_ref[:, b, :]  # (ng_tile, tn)
        if reps > 1:
            a = jnp.broadcast_to(ab[:, None, :], (ng_tile, reps, tn)).reshape(tk, tn)
        else:
            a = ab
        contrib = sgn * a
        w = contrib if w is None else w + contrib

    partial = jnp.dot(x, w, preferred_element_type=jnp.float32)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += partial

    @pl.when(kt == n_kt - 1)
    def _():
        out_ref[:] = acc_ref[:]


def _matmul_pallas(x: jax.Array, pw: PackedWeight, tk: int = 512, tn: int = 256,
                   interpret: bool = False) -> jax.Array:
    from gptq_tpu.ops.qmatmul import _pick_tile

    M, K = x.shape
    N = pw.N
    bits = pw.bits
    tk = _pick_tile(K, tk) if K % tk else min(tk, K)
    tn = _pick_tile(N, tn) if N % tn else min(tn, N)
    assert K % tk == 0 and N % tn == 0
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

    out = pl.pallas_call(
        functools.partial(_bcq_kernel, bits, tk, tn, n_kt),
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
               interpret: bool = False) -> jax.Array:
    """y = x @ bcq_dequant(pw) (+ bias). x: (..., K) -> (..., N)."""
    orig_dtype = x.dtype
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    if pw.perm is not None:
        x2 = x2[:, pw.perm]
    M = x2.shape[0]
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        Mp = max(8, ((M + 7) // 8) * 8)
        if Mp != M:
            x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))
        y = _matmul_pallas(x2, pw, interpret=interpret)[:M]
    else:
        y = _matmul_xla(x2, pw)
    if pw.bias is not None:
        y = y + pw.bias
    return y.reshape(*lead, pw.N).astype(orig_dtype)
