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

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gptq_tpu.ops.pack import (FIELD_SPLITS, PackedWeight, subblock,
                               unpack_codes)


# ---------------------------------------------------------------------------
# XLA-fusion path
# ---------------------------------------------------------------------------

def dequant(pw: PackedWeight) -> jax.Array:
    """Materialize the dequantized (K, N) weight (for testing / fallback)."""
    codes = unpack_codes(pw.words, pw.bits,
                         pw.groupsize).astype(jnp.float32)  # (Kp, Np)
    g = pw.Kp // pw.scale.shape[0]
    s = jnp.repeat(pw.scale, g, axis=0)
    z = jnp.repeat(pw.zoff, g, axis=0)
    return (codes * s - z)[:pw.K, :pw.N]


def _matmul_xla(x: jax.Array, pw: PackedWeight) -> jax.Array:
    w = dequant(pw)
    return jnp.dot(x.astype(jnp.float32), w, preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------

def _unpack_fields_i8(word_refs, bits: int, tk: int, tn: int, sb: int):
    """Byteplane unpack: -> [(code_shift, code_offset, int8 (tk, tn))].

    For each field: `(words >> fb*e) & byte_mask` isolates sub-byte plane e
    in all 4 bytes at once, `pltpu.bitcast(int8)` expands the sublane dim x4
    in byte order, and the planes concatenate straight into K order (the
    pack layout was chosen to make exactly this sequence land naturally) —
    ~0.5 VPU ops/code and no relayout. The 8-bit field is stored code-128
    (offset returned for the caller's epilogue)."""
    fields = []
    for (fb, sh), ref in zip(FIELD_SPLITS[bits], word_refs):
        P = 32 // fb
        E = 8 // fb
        rows_sb = 4 * (sb // P)  # int8 rows per (subblock, plane)
        nsb = tk // sb
        wu = ref[:]  # int32 (tk//P, tn)
        byte_mask = ((1 << fb) - 1) * 0x01010101
        # the field's code shift applies at the WORD level (Mosaic has no
        # int8 vector shifts); fb + sh <= 8 for every split so bytes
        # cannot overflow into neighbours
        planes = []
        for e in range(E):
            v = wu if e == 0 else jax.lax.shift_right_logical(wu, fb * e)
            if fb != 8:
                v = (v & byte_mask) << sh if sh else v & byte_mask
            planes.append(pltpu.bitcast(v, jnp.int8))  # (4*tk//P, tn)
        if nsb == 1:
            c8 = planes[0] if E == 1 else jnp.concatenate(planes, axis=0)
        else:
            pieces = [planes[e][s * rows_sb:(s + 1) * rows_sb]
                      for s in range(nsb) for e in range(E)]
            c8 = jnp.concatenate(pieces, axis=0)
        fields.append((sh, 128 << sh if fb == 8 else 0, c8))
    return fields


def _tile_update(bits, tk, tn, sb, dot_dtype, x, scale, zoff, words, acc):
    """One (tk, tn) fused dequant-matmul tile update (arrays in, new acc
    out) — shared by the single-weight kernel and the batched-expert
    kernel.

    The dequant scaling never touches the (tk, tn) code tile: with per-group
    grids, y = sum_g [ (x_g @ C_g) * scale_g - (sum_k x_gk) * zoff_g ], so
    the MXU multiplies raw codes (exact in bf16: sub-8-bit codes and bf16
    activations multiply exactly, f32 accumulation) and the grid applies on
    the (M, tn) partial — O(M*tn) VPU work instead of O(tk*tn).

    With int8 activations (dot_dtype int8, the --faster-kernel path) the
    dot runs in the MXU's 2x-rate int8 mode with int32 accumulation; the
    caller folds the per-row activation scale in afterwards. At matvec M
    the kernel is MXU-pass-bound, not HBM-bound, so this nearly halves the
    kernel time.

    scale/zoff: (ng_tile, 1, tn)."""
    fields = _unpack_fields_i8(words, bits, tk, tn, sb)
    code_off = sum(off for _sh, off, _c in fields)
    ng_tile = scale.shape[0]
    cs = tk // ng_tile  # K rows per grid group inside this tile
    int8_acts = dot_dtype == jnp.int8

    if cs >= 128:
        # code-dot path: one MXU dot per (field, group chunk) + (M, tn)
        # epilogue; bf16 x int8 / int8 x int8 are native MXU modes — raw
        # int8 codes, field shifts pre-applied at the word level. (A single
        # combined int8 code tile for 3-bit is not expressible: Mosaic has
        # no int8 vector add/shift; partials add in the accumulator type.)
        cf = [c8 if dot_dtype in (jnp.bfloat16, jnp.int8)
              else c8.astype(dot_dtype) for _sh, _off, c8 in fields]
        acc_t = jnp.int32 if int8_acts else jnp.float32
        for gi in range(ng_tile):
            xg = x[:, gi * cs:(gi + 1) * cs]
            part = None
            for c in cf:
                d = jnp.dot(xg, c[gi * cs:(gi + 1) * cs],
                            preferred_element_type=acc_t)
                part = d if part is None else part + d
            xs = jnp.sum(xg.astype(jnp.int32) if int8_acts else
                         xg.astype(jnp.float32), axis=1, keepdims=True)
            s = scale[gi]
            acc = (acc + part.astype(jnp.float32) * s +
                   xs.astype(jnp.float32) * (code_off * s - zoff[gi]))
        return acc
    # small groups: dequantize in-tile (the group axis leads so the
    # broadcast stays sublane-aligned). field shifts are pre-applied; the
    # 8-bit storage offset is not
    codes = None
    for _sh, off, c8 in fields:
        c = c8.astype(jnp.int32) + off
        codes = c if codes is None else codes + c
    reps = tk // ng_tile

    def expand(r):
        if reps == 1:
            return r[:].reshape(ng_tile, tn)
        return jnp.broadcast_to(r[:], (ng_tile, reps, tn)).reshape(tk, tn)

    w = codes.astype(jnp.float32) * expand(scale) - expand(zoff)
    return acc + jnp.dot(x.astype(jnp.float32), w,
                         preferred_element_type=jnp.float32)


def _qmm_kernel(bits, tk, tn, n_kt, sb, dot_dtype,
                x_ref, scale_ref, zoff_ref, *rest):
    """Fused dequant-matmul tile (see _tile_update)."""
    word_refs = rest[:-2]
    out_ref = rest[-2]
    acc_ref = rest[-1]
    kt = pl.program_id(1)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] = _tile_update(bits, tk, tn, sb, dot_dtype, x_ref[:],
                              scale_ref[:], zoff_ref[:],
                              [w[:] for w in word_refs], acc_ref[:])

    @pl.when(kt == n_kt - 1)
    def _():
        out_ref[:] = acc_ref[:]


def _qmm_expert_kernel(bits, tk, tn, n_kt, sb, dot_dtype, per_x,
                       x_ref, scale_ref, zoff_ref, *rest):
    """Batched-expert fused dequant-matmul: the expert index is the
    LEADING grid dimension over a stacked weight bank (ops/pack.
    PackedExperts) — one launch serves every expert's matmul, amortizing
    launch overhead across the bank and letting the pipeline stream
    expert weights back-to-back. per_x: x carries a per-expert leading
    dim (the down projection consumes per-expert GLU activations);
    otherwise one x is shared by all experts (gate/up)."""
    word_refs = rest[:-2]
    out_ref = rest[-2]
    acc_ref = rest[-1]
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[0] if per_x else x_ref[:]
    acc_ref[:] = _tile_update(bits, tk, tn, sb, dot_dtype, x,
                              scale_ref[0], zoff_ref[0],
                              [w[0] for w in word_refs], acc_ref[:])

    @pl.when(kt == n_kt - 1)
    def _():
        out_ref[0] = acc_ref[:]


def _stream_kernel(fb, sh8_off, tk, tn, n_ck, sb, dot_dtype, ng, g,
                   x_ref, scale_ref, zoff_ref, w_hbm, out_ref):
    """EXPERIMENTAL streamed matvec tile (GPTQ_TPU_MATMUL_IMPL=streamed):
    grid over N tiles only; the kernel loops K chunks itself with
    double-buffered DMA from HBM, removing per-(nt, kt) grid-invocation
    overhead. Measured: no better than the auto-pipelined kernel in the
    full model (7.24 vs 7.0 ms/token llama-7B) — Pallas's automatic
    pipeline already overlaps well; microbench "wins" on small weights
    came from XLA keeping ANY-space arrays VMEM-resident across timing
    iterations, which a real model cannot do. Kept as a tuning surface
    for future shapes."""
    nt = pl.program_id(0)
    P = 32 // fb
    rows_ck = tk // P  # word rows per K chunk
    M = x_ref.shape[0]
    int8_acts = dot_dtype == jnp.int8
    acc_t = jnp.int32 if int8_acts else jnp.float32

    def body(wbuf, acc_ref, sem):
        def get_dma(slot, c):
            return pltpu.make_async_copy(
                w_hbm.at[pl.ds(c * rows_ck, rows_ck),
                         pl.ds(nt * tn, tn)],
                wbuf.at[slot],
                sem.at[slot],
            )

        get_dma(0, 0).start()
        acc_ref[:] = jnp.zeros_like(acc_ref)

        def loop(c, _):
            slot = c % 2

            @pl.when(c + 1 < n_ck)
            def _():
                get_dma((c + 1) % 2, c + 1).start()

            get_dma(slot, c).wait()
            fields = _unpack_fields_i8([wbuf.at[slot]], {1: 1, 2: 2, 4: 4,
                                                         8: 8}[fb], tk, tn,
                                       sb)
            _sh, _off, c8 = fields[0]
            if dot_dtype not in (jnp.bfloat16, jnp.int8):
                c8 = c8.astype(dot_dtype)
            # group chunks inside this K chunk
            ng_ck = max(1, tk // g) if g < tk else 1
            cs = tk // ng_ck
            acc = acc_ref[:]
            for gi in range(ng_ck):
                xg = x_ref[:, pl.ds(c * tk + gi * cs, cs)]
                part = jnp.dot(xg, c8[gi * cs:(gi + 1) * cs],
                               preferred_element_type=acc_t)
                xs = jnp.sum(xg.astype(jnp.int32) if int8_acts else
                             xg.astype(jnp.float32), axis=1, keepdims=True)
                # group index within the full K
                if ng == 1:
                    s = scale_ref[0]
                    z = zoff_ref[0]
                    acc = (acc + part.astype(jnp.float32) * s +
                           xs.astype(jnp.float32) * (sh8_off * s - z))
                else:
                    gidx = (c * tk) // g + gi
                    s = scale_ref[gidx]
                    z = zoff_ref[gidx]
                    acc = (acc + part.astype(jnp.float32) * s +
                           xs.astype(jnp.float32) * (sh8_off * s - z))
            acc_ref[:] = acc
            return 0

        jax.lax.fori_loop(0, n_ck, loop, 0, unroll=False)
        out_ref[:] = acc_ref[:]

    pl.run_scoped(
        body,
        wbuf=pltpu.VMEM((2, rows_ck, tn), jnp.int32),
        acc_ref=pltpu.VMEM((M, tn), jnp.float32),
        sem=pltpu.SemaphoreType.DMA((2,)),
    )


def _matmul_streamed(x: jax.Array, pw: PackedWeight, tk: int = 0,
                     tn: int = 0, interpret: bool = False) -> jax.Array:
    """Streamed variant: only for single-field formats (2/4/8-bit).

    x padded (M, Kp); returns (M, Np)."""
    M, K = x.shape
    N = pw.Np
    assert K == pw.Kp and len(pw.words) == 1
    fb, _sh = FIELD_SPLITS[pw.bits][0]
    sb = subblock(K, pw.groupsize)
    tk = tk or min(2048, K)
    tk = _pick_tile(K, tk) if K % tk else tk
    tk = max(tk, sb)
    tn = tn or min(1024, N)
    tn = _pick_tile(N, tn) if N % tn else tn
    assert K % tk == 0 and N % tn == 0 and tk % sb == 0
    ng = pw.scale.shape[0]
    g = K // ng
    if not (tk % g == 0 or g % tk == 0) or (g < tk and g < 128):
        raise ValueError("streamed kernel needs group-aligned chunks")
    if x.dtype == jnp.int8:
        dot_dtype = jnp.int8
    elif x.dtype == jnp.bfloat16:
        dot_dtype = jnp.bfloat16
    else:
        dot_dtype = jnp.float32
    sh8_off = 128 if pw.bits == 8 else 0

    kernel = functools.partial(_stream_kernel, fb, sh8_off, tk, tn,
                               K // tk, sb, dot_dtype, ng, g)
    out = pl.pallas_call(
        kernel,
        grid=(N // tn,),
        in_specs=[
            pl.BlockSpec((M, K), lambda nt: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ng, 1, tn), lambda nt: (0, 0, nt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ng, 1, tn), lambda nt: (0, 0, nt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # words stay in HBM
        ],
        out_specs=pl.BlockSpec((M, tn), lambda nt: (0, nt),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(x, pw.scale[:, None, :], pw.zoff[:, None, :], pw.words[0])
    return out


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class StagedWeight:
    """Resident native-s4/s8 serving weight: the packed words unpacked and
    re-centered ONCE at load into an XLA-native signed s4 (or s8) array
    that the MXU ingests directly at the int8 dot rate — zero per-call
    unpack work, and XLA schedules/fuses the dots freely (no opaque custom
    calls). Same 4 bits/weight in HBM (XLA stores s4 packed 2-codes/byte).

    The alternative serving mode to the fused Pallas kernels
    (models.common.stage_serving): per-kernel the Pallas stream is
    slightly faster at matvec M (790 vs ~700 GB/s, DESIGN.md round-3),
    but XLA can overlap these plain dots with attention and cache work
    it cannot schedule around a custom call.

    RELAY LIMITATION (round-4 finding): the relayed axon backend cannot
    accept a sub-byte (s4) array as a jit ARGUMENT — `_array_shard_arg`
    enters an infinite device_put relayout loop (RecursionError), for
    eagerly-created AND jit-produced int4 arrays alike. The mode is
    CPU-verified (tests/test_resident.py) and usable on directly-attached
    TPU hosts; on the relay, serve through the fused kernels (default)
    or the threshold-staged path, which keep weights in int32 words
    across jit boundaries and materialize s4 only inside the program.

    codes: (Kp, Np) s4/s8, value = stored_code - 2^(bits-1)
    scale/zoff: (ng, Np) f32 grids (same meaning as PackedWeight)
    """

    codes: jax.Array
    scale: jax.Array
    zoff: jax.Array
    bias: jax.Array | None = None
    perm: jax.Array | None = None
    bits: int = dataclasses.field(default=4, metadata=dict(static=True))
    K: int = dataclasses.field(default=0, metadata=dict(static=True))
    N: int = dataclasses.field(default=0, metadata=dict(static=True))
    groupsize: int = dataclasses.field(default=-1,
                                       metadata=dict(static=True))

    @property
    def Kp(self) -> int:
        return self.codes.shape[0]

    @property
    def Np(self) -> int:
        return self.codes.shape[1]


def stage_weight(pw: PackedWeight) -> StagedWeight:
    """PackedWeight (uniform grids) -> resident StagedWeight (one-time)."""
    if pw.fmt != "uniform":
        raise ValueError(f"stage_weight needs uniform grids, got {pw.fmt!r}")
    codes = unpack_codes(pw.words, pw.bits, pw.groupsize)
    off = 1 << (pw.bits - 1)
    dt = jnp.int4 if pw.bits <= 4 else jnp.int8
    return StagedWeight(codes=(codes - off).astype(dt), scale=pw.scale,
                        zoff=pw.zoff, bias=pw.bias, perm=pw.perm,
                        bits=pw.bits, K=pw.K, N=pw.N,
                        groupsize=pw.groupsize)


def _staged_dot(x: jax.Array, cs4: jax.Array, scale: jax.Array,
                zoff: jax.Array, off: int, N: int) -> jax.Array:
    """The shared native-s4 dot + group-scale epilogue. x: (M, Kp) int8 or
    float (cast to bf16); cs4: (Kp, Np) signed codes. Returns (M, N) f32.

    Math per group g (off = 2^(bits-1), the re-centering shift):
        y = sum_g [ (x_g @ (C_g - off)) * s_g
                    + (sum_k x_gk) * (off*s_g - zoff_g) ]
    Exact for int8 activations (integer dot, int32 accumulation)."""
    M = x.shape[0]
    Kp, Np = cs4.shape
    int_acts = x.dtype == jnp.int8
    acc_t = jnp.int32 if int_acts else jnp.float32
    if not int_acts and x.dtype != jnp.bfloat16:
        x = x.astype(jnp.bfloat16)
    ng = scale.shape[0]
    xs_t = jnp.int32 if int_acts else jnp.float32
    if ng == 1:
        part = jax.lax.dot_general(x, cs4, (((1,), (0,)), ((), ())),
                                   preferred_element_type=acc_t)
        xs = jnp.sum(x.astype(xs_t), axis=1, keepdims=True)  # (M, 1)
        y = (part.astype(jnp.float32) * scale[0]
             + xs.astype(jnp.float32) * (off * scale[0] - zoff[0]))
    else:
        g = Kp // ng
        xg = x.reshape(M, ng, g).transpose(1, 0, 2)  # (ng, M, g)
        cg = cs4.reshape(ng, g, Np)
        part = jax.lax.dot_general(xg, cg, (((2,), (1,)), ((0,), (0,))),
                                   preferred_element_type=acc_t)
        y = jnp.einsum("gmn,gn->mn", part.astype(jnp.float32), scale,
                       preferred_element_type=jnp.float32)
        xs = jnp.sum(x.reshape(M, ng, g).astype(xs_t), axis=2)  # (M, ng)
        y = y + jnp.dot(xs.astype(jnp.float32), off * scale - zoff,
                        preferred_element_type=jnp.float32)
    return y[:, :N]


def resident_matmul(x: jax.Array, sw: StagedWeight,
                    a8: bool = False) -> jax.Array:
    """y = x @ dequant(sw) (+ bias) through the resident s4 codes.

    x: (..., K). Returns (..., N) in x's dtype."""
    orig_dtype = x.dtype
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    if sw.perm is not None:
        x2 = x2[:, sw.perm]
    if sw.Kp != x2.shape[1]:
        x2 = jnp.pad(x2, ((0, 0), (0, sw.Kp - x2.shape[1])))
    sx = None
    if a8:
        x2, sx = quantize_acts_int8(x2)
    y = _staged_dot(x2, sw.codes, sw.scale, sw.zoff,
                    1 << (sw.bits - 1), sw.N)
    if sx is not None:
        y = y * sx
    if sw.bias is not None:
        y = y + sw.bias
    return y.reshape(*lead, sw.N).astype(orig_dtype)


def _matmul_staged_native(x: jax.Array, pw: PackedWeight) -> jax.Array:
    """Large-M (prefill / calibration) path through XLA's NATIVE sub-byte
    dot: unpack the packed words to integer codes, re-center to a signed
    s4 (or s8) array, and run plain dot_generals with the group-scale
    epilogue on the (M, N) partials.

    Why this beats the Pallas unpack kernel at large M: XLA stores s4
    packed (2 codes/byte in HBM — layout T(8,128)(8,1)) and the MXU
    ingests it natively at the int8 dot rate, so the big dot runs at
    ~227 TF/s at llama-7B prefill shapes vs 114 TF/s for the bf16 dense
    dot and ~80 TF/s for the in-kernel byteplane unpack (chip-measured,
    M=2048; see experiments/r3_prefill_mfu.py). The staging pass
    (unpack + re-center + s4 cast, one fused XLA loop writing the packed
    s4 array) is O(K*N) bytes and amortizes to <10% of the dot.

    At decode M the same dot streams at ~700 GB/s of packed bytes —
    slightly UNDER the 790 GB/s the fused Pallas kernels sustain — and
    per-call staging would double the weight traffic, so this path only
    engages above a row threshold (see dequant_matmul).

    Math per group g (off = 2^(bits-1), the re-centering shift):
        y = sum_g [ (x_g @ (C_g - off)) * s_g + (sum_k x_gk) * (off*s_g - zoff_g) ]
    Exact for int8 activations (integer dot, int32 accumulation; the
    epilogue is the same algebra the Pallas kernel applies).

    x: (M, K) int8 or bf16/f32, K logical (perm already applied).
    Returns (M, N) f32."""
    codes = unpack_codes(pw.words, pw.bits, pw.groupsize)  # (Kp, Np) i32
    off = 1 << (pw.bits - 1)
    dt = jnp.int4 if pw.bits <= 4 else jnp.int8
    cs4 = (codes - off).astype(dt)
    if pw.Kp != x.shape[1]:
        x = jnp.pad(x, ((0, 0), (0, pw.Kp - x.shape[1])))
    return _staged_dot(x, cs4, pw.scale, pw.zoff, off, pw.N)


def _stage_threshold() -> int:
    """Row count at which dequant_matmul switches from the Pallas unpack
    kernel to the staged native-s4 dot (GPTQ_TPU_STAGE_M overrides;
    0 disables). Default OFF: the round-3 crossover that favored staging
    at M >= 256 did not survive the round-4/5 kernel and tile
    improvements — end-to-end T=2048 prefill measures 7318 tok/s on the
    Pallas path vs 5749 staged (results/r5_bench_builder_run2.json; the
    per-call unpack_codes materialization now outweighs the native-dot
    advantage). Set GPTQ_TPU_STAGE_M=256 to re-enable."""
    import os

    return int(os.environ.get("GPTQ_TPU_STAGE_M", "0"))


def _pick_tile(dim: int, prefer: int, minimum: int = 128) -> int:
    """Largest power-of-two-ish tile <= prefer that divides dim."""
    t = min(prefer, dim)
    while t >= minimum:
        if dim % t == 0:
            return t
        t //= 2
    return dim  # fall back to the whole dimension


def _matmul_pallas(x: jax.Array, pw: PackedWeight, tk: int = 0, tn: int = 0,
                   interpret: bool = False) -> jax.Array:
    """x must already be padded to (M, pw.Kp); returns (M, pw.Np)."""
    M, K = x.shape
    N = pw.Np
    assert K == pw.Kp, (K, pw.Kp)
    if not tk or not tn:
        from gptq_tpu.ops.autotune import best_tiles

        act = "int8" if x.dtype == jnp.int8 else "bf16"
        tuned = best_tiles(pw.K, pw.N, pw.bits, pw.groupsize, pw.fmt, M, act)
        if tuned and tuned[0] > 0:
            tk, tn = tuned
        else:
            # decode shapes amortize grid overhead with big tiles (tile
            # sweep on the fused llama-7B shapes: 2048x1024 streams
            # ~530-800 GB/s vs ~400 at 1024x512); larger M (calibration/
            # eval) must keep the (M, tk)/(M, tn) VMEM blocks small
            tk, tn = (2048, 1024) if M <= 64 else (512, 256)
    sb = subblock(K, pw.groupsize)
    if K % tk:
        tk = _pick_tile(K, tk)
    else:
        tk = min(tk, K)
    tk = max(tk, sb)  # planar unpack needs whole subblocks per tile
    if N % tn:
        tn = _pick_tile(N, tn)
    else:
        tn = min(tn, N)
    assert K % tk == 0 and N % tn == 0 and tk % sb == 0, (K, tk, N, tn, sb)
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

    if x.dtype == jnp.int8:
        dot_dtype = jnp.int8
    elif x.dtype == jnp.bfloat16:
        dot_dtype = jnp.bfloat16
    else:
        dot_dtype = jnp.float32
    kernel = functools.partial(_qmm_kernel, pw.bits, tk, tn, n_kt, sb,
                               dot_dtype)
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


def _resolve_tiles(K: int, N: int, groupsize: int, M: int,
                   tk: int = 0, tn: int = 0) -> tuple[int, int, int]:
    """(tk, tn, sb) tile sizes for the fused dequant kernels (decode
    shapes get big tiles, large-M keeps the (M, t) VMEM blocks small)."""
    sb = subblock(K, groupsize)
    if not tk or not tn:
        tk, tn = (2048, 1024) if M <= 64 else (512, 256)
    tk = _pick_tile(K, tk) if K % tk else min(tk, K)
    tk = max(tk, sb)
    tn = _pick_tile(N, tn) if N % tn else min(tn, N)
    assert K % tk == 0 and N % tn == 0 and tk % sb == 0, (K, tk, N, tn, sb)
    return tk, tn, sb


def dequant_experts(pe) -> jax.Array:
    """Materialize the dequantized (E, K, N) expert bank (oracle/CPU)."""
    from gptq_tpu.ops.pack import unpack_codes

    def one(words, s, z):
        codes = unpack_codes(words, pe.bits, pe.groupsize).astype(jnp.float32)
        g = pe.Kp // s.shape[0]
        return (codes * jnp.repeat(s, g, axis=0)
                - jnp.repeat(z, g, axis=0))

    w = jax.vmap(one)(pe.words, pe.scale, pe.zoff)  # (E, Kp, Np)
    return w[:, :pe.K, :pe.N]


def expert_dequant_matmul(
    x: jax.Array,
    pe,
    impl: str = "auto",
    interpret: bool = False,
) -> jax.Array:
    """y[e] = x[e] @ dequant(pe.expert(e)) for a whole PackedExperts bank
    in ONE kernel launch (expert = leading grid dim).

    x: (M, K) shared across experts (gate/up consume the same tokens) or
    (E, M, K) per-expert (down consumes per-expert GLU activations).
    Returns (E, M, N) f32. The TPU counterpart of serving each expert
    through its own launch: same bytes, one pipeline."""
    per_x = x.ndim == 3
    E = pe.words[0].shape[0]
    M = x.shape[-2]
    K = x.shape[-1]
    if impl == "auto":
        import os

        impl = os.environ.get(
            "GPTQ_TPU_MATMUL_IMPL",
            "pallas" if jax.default_backend() == "tpu" else "xla")
        if impl == "streamed":
            impl = "pallas"  # no streamed variant for the expert bank
        if impl not in ("pallas", "xla"):
            raise ValueError(f"GPTQ_TPU_MATMUL_IMPL={impl!r}")
    if impl == "xla":
        w = dequant_experts(pe)  # (E, K, N)
        eq = "mk,ekn->emn" if not per_x else "emk,ekn->emn"
        return jnp.einsum(eq, x.astype(jnp.float32), w,
                          preferred_element_type=jnp.float32)

    Mp = max(8, ((M + 7) // 8) * 8)
    if Mp != M or pe.Kp != K:
        pad = [(0, Mp - M), (0, pe.Kp - K)]
        x = jnp.pad(x, ([(0, 0)] if per_x else []) + pad)
    Kp, Np = pe.Kp, pe.Np
    tk, tn, sb = _resolve_tiles(Kp, Np, pe.groupsize, Mp)
    n_kt, n_nt = Kp // tk, Np // tn
    ng = pe.scale.shape[1]
    g = Kp // ng
    if tk % g == 0:
        ng_tile = tk // g
        smap = lambda e, nt, kt: (e, kt, 0, nt)
    else:
        assert g % tk == 0, (g, tk)
        ng_tile = 1
        smap = lambda e, nt, kt: (e, (kt * tk) // g, 0, nt)

    if x.dtype == jnp.int8:
        dot_dtype = jnp.int8
    elif x.dtype == jnp.bfloat16:
        dot_dtype = jnp.bfloat16
    else:
        dot_dtype = jnp.float32

    if per_x:
        x_spec = pl.BlockSpec((1, Mp, tk), lambda e, nt, kt: (e, 0, kt),
                              memory_space=pltpu.VMEM)
    else:
        x_spec = pl.BlockSpec((Mp, tk), lambda e, nt, kt: (0, kt),
                              memory_space=pltpu.VMEM)
    in_specs = [
        x_spec,
        pl.BlockSpec((1, ng_tile, 1, tn), smap, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ng_tile, 1, tn), smap, memory_space=pltpu.VMEM),
    ]
    for (fb, _sh), warr in zip(FIELD_SPLITS[pe.bits], pe.words):
        P = 32 // fb
        in_specs.append(
            pl.BlockSpec((1, tk // P, tn), lambda e, nt, kt: (e, kt, nt),
                         memory_space=pltpu.VMEM))
    kernel = functools.partial(_qmm_expert_kernel, pe.bits, tk, tn, n_kt,
                               sb, dot_dtype, per_x)
    out = pl.pallas_call(
        kernel,
        grid=(E, n_nt, n_kt),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, Mp, tn), lambda e, nt, kt: (e, 0, nt),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((E, Mp, Np), jnp.float32),
        scratch_shapes=[pltpu.VMEM((Mp, tn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * E * Mp * Kp * Np,
            bytes_accessed=(E * Kp * Np * pe.bits) // 8
            + (E if per_x else 1) * Mp * Kp * 4 + E * Mp * Np * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, pe.scale[:, :, None, :], pe.zoff[:, :, None, :], *pe.words)
    return out[:, :M, :pe.N]


def expert_dequant_matmul_select(
    x: jax.Array,
    pe,
    e_idx: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """y = x @ dequant(pe.expert(e_idx)) with the expert chosen INSIDE the
    kernel via scalar prefetch — the index_map reads the selected expert's
    blocks straight from the bank in HBM, so a top-k decode reads exactly
    k/E of the bank with NO dynamic-slice copy (XLA materializes
    `words[e]` as a full expert-sized copy first: measured 2.15x instead
    of the byte-ratio 4x at Mixtral top-2/E=8 shapes; this path removes
    the copy).

    x: (M, K); e_idx: scalar int32. Returns (M, N) f32."""
    M, K = x.shape
    Mp = max(8, ((M + 7) // 8) * 8)
    if Mp != M or pe.Kp != K:
        x = jnp.pad(x, ((0, Mp - M), (0, pe.Kp - K)))
    Kp, Np = pe.Kp, pe.Np
    tk, tn, sb = _resolve_tiles(Kp, Np, pe.groupsize, Mp)
    n_kt, n_nt = Kp // tk, Np // tn
    ng = pe.scale.shape[1]
    g = Kp // ng
    if tk % g == 0:
        ng_tile = tk // g
        smap = lambda nt, kt, idx_ref: (idx_ref[0], kt, 0, nt)
    else:
        assert g % tk == 0, (g, tk)
        ng_tile = 1
        smap = lambda nt, kt, idx_ref: (idx_ref[0], (kt * tk) // g, 0, nt)

    if x.dtype == jnp.int8:
        dot_dtype = jnp.int8
    elif x.dtype == jnp.bfloat16:
        dot_dtype = jnp.bfloat16
    else:
        dot_dtype = jnp.float32

    in_specs = [
        pl.BlockSpec((Mp, tk), lambda nt, kt, idx_ref: (0, kt),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ng_tile, 1, tn), smap, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ng_tile, 1, tn), smap, memory_space=pltpu.VMEM),
    ]
    for (fb, _sh), warr in zip(FIELD_SPLITS[pe.bits], pe.words):
        P = 32 // fb
        in_specs.append(
            pl.BlockSpec((1, tk // P, tn),
                         lambda nt, kt, idx_ref: (idx_ref[0], kt, nt),
                         memory_space=pltpu.VMEM))

    def kernel(idx_ref, x_ref, scale_ref, zoff_ref, *rest):
        word_refs = rest[:-2]
        out_ref, acc_ref = rest[-2:]
        kt = pl.program_id(1)

        @pl.when(kt == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        acc_ref[:] = _tile_update(pe.bits, tk, tn, sb, dot_dtype, x_ref[:],
                                  scale_ref[0], zoff_ref[0],
                                  [w[0] for w in word_refs], acc_ref[:])

        @pl.when(kt == n_kt - 1)
        def _():
            out_ref[:] = acc_ref[:]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_nt, n_kt),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((Mp, tn), lambda nt, kt, idx_ref: (0, nt),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((Mp, tn), jnp.float32)],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Mp, Np), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(jnp.asarray(e_idx, jnp.int32).reshape(1), x,
      pe.scale[:, :, None, :], pe.zoff[:, :, None, :], *pe.words)
    return out[:M, :pe.N]


def quantize_acts_int8(x2: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-row dynamic int8 activation quantization: (xq int8, scale f32).

    The serving fast path (reference --faster-kernel counterpart,
    quant.py:195-200): at matvec M the fused kernel is MXU-pass-bound and
    the int8 MXU mode runs 2x the bf16 rate."""
    xf = x2.astype(jnp.float32)
    sx = jnp.max(jnp.abs(xf), axis=1, keepdims=True) / 127.0 + 1e-12
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    return xq, sx


def dequant_matmul(
    x: jax.Array,
    pw: PackedWeight,
    impl: str = "auto",
    interpret: bool = False,
    a8: bool = False,
) -> jax.Array:
    """y = x @ dequant(pw) (+ bias), with act-order permutation applied.

    x: (..., K). Returns (..., N) in x's dtype. With a8=True activations
    quantize to int8 per row first (fast serving path)."""
    orig_dtype = x.dtype
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    if pw.perm is not None:
        x2 = x2[:, pw.perm]
    M = x2.shape[0]
    auto = impl == "auto"
    if auto:
        import os

        impl = os.environ.get(
            "GPTQ_TPU_MATMUL_IMPL",
            "pallas" if jax.default_backend() == "tpu" else "xla")
    if impl not in ("pallas", "streamed", "staged", "xla"):
        src = "GPTQ_TPU_MATMUL_IMPL" if auto else "impl"
        raise ValueError(f"{src}={impl!r}: "
                         f"expected pallas/streamed/staged/xla")
    staged_forced = False
    if impl == "staged":
        # via the env (a session default) "staged" means the documented
        # threshold route; as a DIRECT argument it is an explicit request
        # and dispatches unconditionally (A/B harnesses rely on this)
        staged_forced = not auto
        if staged_forced and pw.fmt != "uniform":
            raise ValueError(
                f"impl='staged' supports uniform-grid weights only "
                f"(got fmt={pw.fmt!r})")
        impl = "pallas"
    sx = None
    if a8:
        x2, sx = quantize_acts_int8(x2)
    if (impl == "pallas" and pw.fmt == "uniform"
            and (staged_forced
                 or (auto and (t := _stage_threshold()) and M >= t))):
        # large-M (prefill/calibration): stage to a native s4/s8 array and
        # let the MXU ingest it directly (see _matmul_staged_native)
        y = _matmul_staged_native(x2, pw)
        if sx is not None:
            y = y * sx
        if pw.bias is not None:
            y = y + pw.bias
        return y.reshape(*lead, pw.N).astype(orig_dtype)
    if impl in ("pallas", "streamed"):
        # pad rows to the f32 sublane minimum and K to the stored pad
        Mp = max(8, ((M + 7) // 8) * 8)
        if Mp != M or pw.Kp != pw.K:
            x2 = jnp.pad(x2, ((0, Mp - M), (0, pw.Kp - pw.K)))
        if impl == "pallas" and len(pw.words) == 1:
            # the tuner may have crowned the streamed impl for this shape
            # (look up with the PADDED row count — the tuner keys on it)
            from gptq_tpu.ops.autotune import best_tiles

            act = "int8" if x2.dtype == jnp.int8 else "bf16"
            tuned = best_tiles(pw.K, pw.N, pw.bits, pw.groupsize, pw.fmt,
                               x2.shape[0], act)
            if tuned and tuned[0] == -1:
                impl = "streamed"
        if impl == "streamed" and len(pw.words) == 1:
            y = _matmul_streamed(x2, pw, interpret=interpret)[:M, :pw.N]
        else:
            y = _matmul_pallas(x2, pw, interpret=interpret)[:M, :pw.N]
    else:
        if a8:  # oracle: the kernel epilogue is linear in x, so the
            # quantized activations feed the dense path unchanged
            y = _matmul_xla(x2.astype(jnp.float32), pw)
        else:
            y = _matmul_xla(x2, pw)
    if sx is not None:
        y = y * sx  # (M, 1) per-row activation scale
    if pw.bias is not None:
        y = y + pw.bias
    return y.reshape(*lead, pw.N).astype(orig_dtype)
