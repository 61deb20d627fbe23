"""Fused dequantize + matmul for uniform-grid packed weights.

TPU-native replacement for the reference CUDA matvec kernels
(reference: quant_cuda_kernel.cu:88-244). Two paths:

  * `dequant_matmul(..., impl="xla")` — pure jnp unpack feeding jnp.dot;
    XLA fuses the shift/mask/scale chain into the dot's operand producer.
    Correctness oracle and CPU fallback.
  * `dequant_matmul(..., impl="pallas")` — explicit Pallas kernel: grid over
    (N tiles, K tiles), packed words + grids staged in VMEM, unpack on the
    VPU, accumulate x @ w tiles on the MXU into a revisited f32 output
    block. No atomics (the CUDA kernel's atomicAdd at
    quant_cuda_kernel.cu:164 becomes output-stationary accumulation).

Both compute y[m,n] = sum_k x[m,k] * (scale[g(k),n] * c[k,n] - zoff[g(k),n]).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gptq_tpu.ops.pack import FIELD_SPLITS, PackedWeight, unpack_codes


# ---------------------------------------------------------------------------
# XLA-fusion path
# ---------------------------------------------------------------------------

def dequant(pw: PackedWeight) -> jax.Array:
    """Materialize the dequantized (K, N) weight (for testing / fallback)."""
    codes = unpack_codes(pw.words, pw.bits).astype(jnp.float32)  # (K, N)
    g = pw.K // pw.scale.shape[0]
    s = jnp.repeat(pw.scale, g, axis=0)
    z = jnp.repeat(pw.zoff, g, axis=0)
    return codes * s - z


def _matmul_xla(x: jax.Array, pw: PackedWeight) -> jax.Array:
    w = dequant(pw)
    return jnp.dot(x.astype(jnp.float32), w, preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------

def _unpack_tile(word_refs, bits: int, tk: int, tn: int) -> jax.Array:
    """Unpack a K-tile of blocked field words into (tk, tn) int32 codes."""
    out = None
    for (fb, sh), ref in zip(FIELD_SPLITS[bits], word_refs):
        P = 32 // fb
        w = ref[:].astype(jnp.uint32)  # (tk // P, tn)
        shifts = (fb * jax.lax.broadcasted_iota(jnp.uint32, (1, P, 1), 1))
        part = (w[:, None, :] >> shifts) & ((1 << fb) - 1)
        part = part.reshape(tk, tn).astype(jnp.int32) << sh
        out = part if out is None else out + part
    return out


def _qmm_kernel(bits, tk, tn, n_kt, x_ref, scale_ref, zoff_ref, *rest):
    word_refs = rest[:-2]
    out_ref = rest[-2]
    acc_ref = rest[-1]
    kt = pl.program_id(1)

    codes = _unpack_tile(word_refs, bits, tk, tn).astype(jnp.float32)
    # scale/zoff refs are (ng_tile, 1, tn): the group axis leads so Mosaic's
    # sublane-divisibility rule applies to the (1, tn) tail
    ng_tile = scale_ref.shape[0]
    reps = tk // ng_tile

    def expand(r):  # (ng_tile, 1, tn) -> (tk, tn), elementwise group repeat
        if reps == 1:
            return r[:].reshape(ng_tile, tn)
        return jnp.broadcast_to(r[:], (ng_tile, reps, tn)).reshape(tk, tn)

    w = codes * expand(scale_ref) - expand(zoff_ref)  # (tk, tn) f32

    partial = jnp.dot(
        x_ref[:].astype(jnp.float32), w, preferred_element_type=jnp.float32
    )

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += partial

    @pl.when(kt == n_kt - 1)
    def _():
        out_ref[:] = acc_ref[:]


def _pick_tile(dim: int, prefer: int, minimum: int = 128) -> int:
    """Largest power-of-two-ish tile <= prefer that divides dim."""
    t = min(prefer, dim)
    while t >= minimum:
        if dim % t == 0:
            return t
        t //= 2
    return dim  # fall back to the whole dimension


def _matmul_pallas(x: jax.Array, pw: PackedWeight, tk: int = 512, tn: int = 256,
                   interpret: bool = False) -> jax.Array:
    M, K = x.shape
    N = pw.N
    assert K == pw.K, (K, pw.K)
    if K % tk:
        tk = _pick_tile(K, tk)
    else:
        tk = min(tk, K)
    if N % tn:
        tn = _pick_tile(N, tn)
    else:
        tn = min(tn, N)
    assert K % tk == 0 and N % tn == 0, (K, tk, N, tn)
    n_kt = K // tk
    n_nt = N // tn
    ng = pw.scale.shape[0]
    g = K // ng
    # groups must tile cleanly: either several groups per K-tile or one
    # group spanning whole tiles. index_map returns BLOCK indices.
    if tk % g == 0:
        ng_tile = tk // g
        scale_map = lambda nt, kt: (kt, 0, nt)
    else:
        assert g % tk == 0, (g, tk)
        ng_tile = 1
        scale_map = lambda nt, kt: ((kt * tk) // g, 0, nt)

    grid = (n_nt, n_kt)
    in_specs = [
        pl.BlockSpec((M, tk), lambda nt, kt: (0, kt), memory_space=pltpu.VMEM),
        pl.BlockSpec((ng_tile, 1, tn), scale_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((ng_tile, 1, tn), scale_map, memory_space=pltpu.VMEM),
    ]
    for (fb, _sh), warr in zip(FIELD_SPLITS[pw.bits], pw.words):
        P = 32 // fb
        in_specs.append(
            pl.BlockSpec((tk // P, tn), lambda nt, kt: (kt, nt),
                         memory_space=pltpu.VMEM)
        )

    kernel = functools.partial(_qmm_kernel, pw.bits, tk, tn, n_kt)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((M, tn), lambda nt, kt: (0, nt),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((M, tn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * K * N,
            bytes_accessed=(K * N * pw.bits) // 8 + M * K * 4 + M * N * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, pw.scale[:, None, :], pw.zoff[:, None, :], *pw.words)
    return out


def dequant_matmul(
    x: jax.Array,
    pw: PackedWeight,
    impl: str = "auto",
    interpret: bool = False,
) -> jax.Array:
    """y = x @ dequant(pw) (+ bias), with act-order permutation applied.

    x: (..., K). Returns (..., N) in x's dtype."""
    orig_dtype = x.dtype
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    if pw.perm is not None:
        x2 = x2[:, pw.perm]
    M = x2.shape[0]
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        # pad rows to the f32 sublane minimum
        Mp = max(8, ((M + 7) // 8) * 8)
        if Mp != M:
            x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))
        y = _matmul_pallas(x2, pw, interpret=interpret)[:M]
    else:
        y = _matmul_xla(x2, pw)
    if pw.bias is not None:
        y = y + pw.bias
    return y.reshape(*lead, pw.N).astype(orig_dtype)
