"""Fused serving kernels: whole phases of a decoder layer in single Pallas
launches.

The decode-time layer is a chain of HBM-bound weight streams with trivial
elementwise glue between them; as separate launches each stream pays its
own pipeline fill/drain and the activations round-trip through HBM. These
kernels stream the packed weight words manually (double-buffered DMA from
ANY/HBM) with CROSS-PHASE PREFETCH — every phase's chunk-0 weight DMA is
issued at kernel entry, because weights never depend on earlier phase
outputs — and keep all intermediates in VMEM:

  norm_qkv_fused: ln1 + fused q/k/v dequant-matmul
  ffn_fused:      gateup -> inner = act(g) * u -> down
  attn_mlp_fused: o + residual + rmsnorm + gateup + act + down + residual

Support envelope: uniform packed weights with per-tensor grids
(groupsize -1), any FIELD_SPLITS bitwidth (2/3/4/8 — multi-field formats
stream one DMA pipeline per field and add int32 dot partials, exactly like
qmatmul's field handling), no act-order perm, no baked biases, dynamic
int8 activations. Callers fall back to the launch-per-matmul path
otherwise. Padding invariants make the fusion seamless: fused gateup
stores [gate_cols | up_cols] with exact-zero pad columns, act(0)*0 == 0
for every supported activation, and down's stored K equals the gateup
stored half width.

No reference counterpart at kernel level (the reference runs one CUDA
matvec per linear, quant.py:189-203); this is the TPU "fused decode
layer" step beyond it. Chip-measured (llama-7B shapes, w4a8): the fused
stack takes batch-1 decode from 6.14 to 5.31 ms/token.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gptq_tpu.ops.pack import FIELD_SPLITS, PackedWeight, subblock


class _MMSpec(NamedTuple):
    """Static description of one streamed dequant-matmul phase."""

    fields: tuple  # ((fb, sh), ...) per packed field; bcq: one (1, 0)/plane
    code_off: int  # stored-code offset folded into the epilogue (8-bit)
    K: int
    N: int
    nc: int  # N-chunk width
    sb: int  # byteplane subblock
    ng: int  # quantization groups along K (1 = per-tensor grids)
    fmt: str = "uniform"  # uniform grids | bcq sign bitplanes


def _mm_specs(pw: PackedWeight) -> _MMSpec:
    if pw.fmt == "bcq":
        fields = tuple((1, 0) for _ in range(pw.bits))
        words_rows = pw.bits * (pw.Kp // 32)
        nc = _pick_chunk(pw.Np, 512 if words_rows * 512 * 4 <= 2_500_000
                         else 256)
        return _MMSpec(fields, 0, pw.Kp, pw.Np, nc,
                       subblock(pw.Kp, pw.groupsize), pw.alpha.shape[0],
                       "bcq")
    fields = tuple(FIELD_SPLITS[pw.bits])
    fb0, sh0 = fields[0]
    off = 128 << sh0 if fb0 == 8 else 0
    # chunk width: keep the per-field double-buffered word blocks small
    words_rows = sum(pw.Kp // (32 // fb) for fb, _ in fields)
    nc = _pick_chunk(pw.Np, 512 if words_rows * 512 * 4 <= 2_500_000
                     else 256)
    return _MMSpec(fields, off, pw.Kp, pw.Np, nc,
                   subblock(pw.Kp, pw.groupsize), pw.scale.shape[0])


def _mm_grids(pw: PackedWeight):
    """(scale-like, zoff-like) VMEM grid arrays for a phase: uniform grids
    or BCQ (ng, bits, N) alphas with a dummy second array."""
    if pw.fmt == "bcq":
        return pw.alpha, jnp.zeros((1, 1), jnp.float32)
    return pw.scale, pw.zoff


def _pick_chunk(N: int, prefer: int) -> int | None:
    """Largest chunk width <= prefer that divides N, lane-aligned (128)."""
    nc = prefer
    while nc >= 128:
        if N % nc == 0:
            return nc
        nc //= 2
    return None


def _prep_acts(x, a8: bool):
    """Activations for a streamed matmul: dynamic int8 (fast path) or
    bf16 (accuracy path; bf16 x int8 codes is also a native MXU mode).
    The a8 branch reuses qmatmul.quantize_acts_int8 (pure jnp, safe in a
    kernel body) so the in-kernel and XLA-path quantizers can't diverge."""
    if a8:
        from gptq_tpu.ops.qmatmul import quantize_acts_int8

        return quantize_acts_int8(x)
    return x.astype(jnp.bfloat16), None


def _unpack_field(w, fb, sh, K, sb):
    """Byteplane unpack of one field chunk (K//P, nc) int32 -> (K, nc) int8
    (mirrors qmatmul._unpack_fields_i8)."""
    P = 32 // fb
    E = 8 // fb
    nsb = K // sb
    rows_sb = 4 * (sb // P)
    planes = []
    for e in range(E):
        v = w if e == 0 else jax.lax.shift_right_logical(w, fb * e)
        if fb != 8:
            bm = ((1 << fb) - 1) * 0x01010101
            v = (v & bm) << sh if sh else v & bm
        planes.append(pltpu.bitcast(v, jnp.int8))
    if nsb == 1:
        return planes[0] if E == 1 else jnp.concatenate(planes, axis=0)
    pieces = [planes[e][s * rows_sb:(s + 1) * rows_sb]
              for s in range(nsb) for e in range(E)]
    return jnp.concatenate(pieces, axis=0)


def _start_first_dmas(whbms, bufs, spec: _MMSpec):
    """Issue every field/plane's chunk-0 DMA (cross-phase prefetch: weights
    never depend on earlier phase outputs, so these start at kernel
    entry)."""
    for fi, (wbuf, sem) in enumerate(bufs):
        if spec.fmt == "bcq":
            src_ref = whbms[0].at[fi, :, pl.ds(0, spec.nc)]
        else:
            src_ref = whbms[fi].at[:, pl.ds(0, spec.nc)]
        pltpu.make_async_copy(src_ref, wbuf.at[0], sem.at[0]).start()


def _stream_matmul(x8, sx, whbms, scale_ref, zoff_ref, out_ref,
                   spec: _MMSpec, bufs, prestarted: bool, bias_ref=None):
    """out[:, :] = dequant-matmul of x8 against the streamed field words.

    x8: (M, K) int8 in VMEM; whbms: one (K//P_f, N) int32 HBM ref per
    field; grids scale/zoff (ng, N) in VMEM; bufs: one (double-buffer,
    sem) pair per field. Streams N in spec.nc chunks; multi-field formats
    run one DMA pipeline per field and ADD the int32 dot partials (field
    shifts are pre-applied at the word level). Grouped grids (ng > 1)
    split each chunk's dot at group boundaries — the MXU ingests the same
    codes either way, the epilogue applies per (group, n)."""
    n_chunks = spec.N // spec.nc
    nc = spec.nc
    ng = spec.ng
    g = spec.K // ng
    bcq = spec.fmt == "bcq"

    int8_acts = x8.dtype == jnp.int8
    acc_t = jnp.int32 if int8_acts else jnp.float32

    def get_dma(fi, slot, c):
        wbuf, sem = bufs[fi]
        if bcq:  # one (bits, K//32, N) array; DMA one plane's chunk
            return pltpu.make_async_copy(
                whbms[0].at[fi, :, pl.ds(c * nc, nc)], wbuf.at[slot],
                sem.at[slot])
        return pltpu.make_async_copy(
            whbms[fi].at[:, pl.ds(c * nc, nc)], wbuf.at[slot], sem.at[slot])

    nplanes = len(spec.fields)
    if not prestarted:
        for fi in range(nplanes):
            get_dma(fi, 0, 0).start()
    # per-group input sums for the zero-offset epilogue (one (M, 1) per
    # group; static loop — ng is 1 or K/128-ish)
    xs_g = [jnp.sum(x8[:, gi * g:(gi + 1) * g].astype(acc_t), axis=1,
                    keepdims=True).astype(jnp.float32) for gi in range(ng)]

    def loop(c, _):
        slot = c % 2

        @pl.when(c + 1 < n_chunks)
        def _():
            for fi in range(nplanes):
                get_dma(fi, (c + 1) % 2, c + 1).start()

        c8s = []
        for fi, (fb, sh) in enumerate(spec.fields):
            get_dma(fi, slot, c).wait()
            c8s.append(_unpack_field(bufs[fi][0][slot], fb, sh, spec.K,
                                     spec.sb))
        y = None
        if bcq:
            # y = sum_g sum_b alpha[g,b] * (2*(x_g @ bits_b) - sum x_g)
            # (the sign-select LUT-GEMM identity; ops/bcq_matmul.py)
            for gi in range(ng):
                t = None
                for b, c8 in enumerate(c8s):
                    d = jax.lax.dot_general(
                        x8[:, gi * g:(gi + 1) * g],
                        c8[gi * g:(gi + 1) * g],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=acc_t)
                    a = scale_ref[gi, b, pl.ds(c * nc, nc)][None, :]
                    tb = a * (2.0 * d.astype(jnp.float32) - xs_g[gi])
                    t = tb if t is None else t + tb
                y = t if y is None else y + t
        else:
            for gi in range(ng):
                part = None
                for c8 in c8s:
                    d = jax.lax.dot_general(
                        x8[:, gi * g:(gi + 1) * g],
                        c8[gi * g:(gi + 1) * g],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=acc_t)  # (M, nc)
                    part = d if part is None else part + d
                s = scale_ref[gi, pl.ds(c * nc, nc)][None, :]
                z = zoff_ref[gi, pl.ds(c * nc, nc)][None, :]
                t = (part.astype(jnp.float32) * s
                     + xs_g[gi] * (spec.code_off * s - z))
                y = t if y is None else y + t
        if sx is not None:
            y = y * sx
        if bias_ref is not None:
            y = y + bias_ref[0, pl.ds(c * nc, nc)][None, :]
        out_ref[:, pl.ds(c * nc, nc)] = y
        return 0

    jax.lax.fori_loop(0, n_chunks, loop, 0, unroll=False)


def _phase_scratch(spec: _MMSpec):
    """Scratch shapes for one phase: per field/plane a (2, rows, nc) buffer
    and a 2-slot DMA semaphore (flattened; _take_bufs regroups)."""
    out = []
    for fb, _sh in spec.fields:
        rows = spec.K // 32 if spec.fmt == "bcq" else spec.K // (32 // fb)
        out.append(pltpu.VMEM((2, rows, spec.nc), jnp.int32))
        out.append(pltpu.SemaphoreType.DMA((2,)))
    return out


def _take_bufs(refs, spec: _MMSpec, i0: int):
    n = len(spec.fields)
    return [(refs[i0 + 2 * f], refs[i0 + 2 * f + 1]) for f in range(n)], \
        i0 + 2 * n


def _n_words(spec: _MMSpec) -> int:
    """Input word arrays per phase: bcq stores all planes in ONE array."""
    return 1 if spec.fmt == "bcq" else len(spec.fields)


def _apply_norm(x, w_ref, b_ref, kind, eps):
    """x (M, K) f32 -> normalized, scaled (and shifted, layernorm) bf16-
    rounded f32; mirrors models.common.norm_apply."""
    w = w_ref[0].astype(jnp.float32)[None, :]
    if kind == "layernorm":
        mu = jnp.mean(x, axis=-1, keepdims=True)
        xc = x - mu
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        y = xc * jax.lax.rsqrt(var + eps) * w
        y = y + b_ref[0].astype(jnp.float32)[None, :]
    else:
        if kind == "rmsnorm1p":
            w = 1.0 + w
        var = jnp.mean(x * x, axis=-1, keepdims=True)
        y = x * jax.lax.rsqrt(var + eps) * w
    return y.astype(jnp.bfloat16).astype(jnp.float32)


def _apply_act(act, g, u):
    if act == "relu":
        a = jnp.maximum(g, 0.0)
    elif act == "gelu":
        a = jax.nn.gelu(g, approximate=False)
    elif act == "gelu_tanh":
        a = jax.nn.gelu(g, approximate=True)
    else:
        a = g * jax.nn.sigmoid(g)  # silu
    if u is not None:
        a = a * u
    return a.astype(jnp.bfloat16).astype(jnp.float32)


def _streamable(pw: PackedWeight) -> bool:
    if (pw.fmt not in ("uniform", "bcq") or pw.perm is not None
            or pw.bias is not None or _pick_chunk(pw.Np, 512) is None):
        return False
    ng = (pw.alpha if pw.fmt == "bcq" else pw.scale).shape[0]
    if ng == 1:
        return True
    # grouped grids: groups must tile K in lane-efficient (>=128) slices
    g = pw.Kp // ng
    return pw.Kp % ng == 0 and g >= 128 and g % 128 == 0


# ---------------------------------------------------------------------------
# ffn_fused: gateup + act + down
# ---------------------------------------------------------------------------

def ffn_fusable(gu: PackedWeight, dn: PackedWeight,
                glu: bool = True) -> bool:
    if not (_streamable(gu) and _streamable(dn)):
        return False
    if glu:  # stored gate half must feed down's stored K
        return gu.Np == 2 * dn.Kp
    return gu.Np == dn.Kp  # OPT-style fc1 -> fc2


def _ffn_kernel(act, a8, spec_g: _MMSpec, spec_d: _MMSpec,
                m_ref, gu_scale, gu_zoff, dn_scale, dn_zoff,
                *rest):
    nw_g = _n_words(spec_g)
    nw_d = _n_words(spec_d)
    gu_words = rest[:nw_g]
    dn_words = rest[nw_g:nw_g + nw_d]
    out_ref = rest[nw_g + nw_d]
    inner_ref = rest[nw_g + nw_d + 1]
    scratch = rest[nw_g + nw_d + 2:]
    gu_bufs, i0 = _take_bufs(scratch, spec_g, 0)
    dn_bufs, _ = _take_bufs(scratch, spec_d, i0)

    _start_first_dmas(gu_words, gu_bufs, spec_g)
    _start_first_dmas(dn_words, dn_bufs, spec_d)
    m8, sx = _prep_acts(m_ref[:].astype(jnp.float32), a8)
    _stream_matmul(m8, sx, gu_words, gu_scale, gu_zoff, inner_ref,
                   spec_g, gu_bufs, prestarted=True)
    half = spec_g.N // 2
    inner = _apply_act(act, inner_ref[:, :half], inner_ref[:, half:])
    i8, sx2 = _prep_acts(inner, a8)
    _stream_matmul(i8, sx2, dn_words, dn_scale, dn_zoff, out_ref,
                   spec_d, dn_bufs, prestarted=True)


@functools.partial(jax.jit, static_argnames=("act", "a8", "interpret"))
def ffn_fused(m: jax.Array, gu: PackedWeight, dn: PackedWeight,
              act: str = "silu", a8: bool = True,
              interpret: bool = False) -> jax.Array:
    """y = down( act(gate(m)) * up(m) ) through one fused kernel.

    m: (..., hidden). gu: fused gate|up PackedWeight; dn: down. Dynamic
    int8 activations on both matmuls (the w4a8 serving path)."""
    lead = m.shape[:-1]
    x2 = m.reshape(-1, m.shape[-1]).astype(jnp.float32)
    M = x2.shape[0]
    Mp = max(8, ((M + 7) // 8) * 8)
    if Mp != M or gu.Kp != gu.K:
        x2 = jnp.pad(x2, ((0, Mp - M), (0, gu.Kp - gu.K)))
    spec_g, spec_d = _mm_specs(gu), _mm_specs(dn)
    n_words = len(gu.words) + len(dn.words)
    out = pl.pallas_call(
        functools.partial(_ffn_kernel, act, a8, spec_g, spec_d),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5
        + [pl.BlockSpec(memory_space=pl.ANY)] * n_words,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, dn.Np), jnp.float32),
        scratch_shapes=[pltpu.VMEM((Mp, gu.Np), jnp.float32)]
        + _phase_scratch(spec_g) + _phase_scratch(spec_d),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x2, *_mm_grids(gu), *_mm_grids(dn), *gu.words, *dn.words)
    return out[:M, :dn.N].reshape(*lead, dn.N).astype(m.dtype)


# ---------------------------------------------------------------------------
# attn_mlp_fused: o + residual + rmsnorm + gateup + act + down + residual
# ---------------------------------------------------------------------------

def attn_mlp_fusable(o: PackedWeight, gu: PackedWeight,
                     dn: PackedWeight, glu: bool = True) -> bool:
    if not _streamable(o) or o.Kp != o.K:
        return False
    # stored == logical widths so the residual/norm lanes line up exactly
    if o.Np != o.N or dn.Np != dn.N or o.Np != gu.Kp or dn.N != o.N:
        return False
    return ffn_fusable(gu, dn, glu=glu)


def _attn_mlp_kernel(act, norm, eps, glu, a8, spec_o, spec_g, spec_d,
                     attn_ref, xres_ref, w2_ref, bln_ref,
                     bo_ref, bg_ref, bd_ref,
                     o_scale, o_zoff, gu_scale, gu_zoff, dn_scale, dn_zoff,
                     *rest):
    counts = [_n_words(s) for s in (spec_o, spec_g, spec_d)]
    o_words = rest[:counts[0]]
    gu_words = rest[counts[0]:counts[0] + counts[1]]
    dn_words = rest[counts[0] + counts[1]:sum(counts)]
    out_ref = rest[sum(counts)]
    obuf_ref = rest[sum(counts) + 1]
    inner_ref = rest[sum(counts) + 2]
    scratch = rest[sum(counts) + 3:]
    o_bufs, i0 = _take_bufs(scratch, spec_o, 0)
    gu_bufs, i0 = _take_bufs(scratch, spec_g, i0)
    dn_bufs, _ = _take_bufs(scratch, spec_d, i0)

    _start_first_dmas(o_words, o_bufs, spec_o)
    _start_first_dmas(gu_words, gu_bufs, spec_g)
    _start_first_dmas(dn_words, dn_bufs, spec_d)

    at0, sx0 = _prep_acts(attn_ref[:].astype(jnp.float32), a8)
    _stream_matmul(at0, sx0, o_words, o_scale, o_zoff, obuf_ref,
                   spec_o, o_bufs, prestarted=True, bias_ref=bo_ref)
    r2 = (xres_ref[:].astype(jnp.float32) + obuf_ref[:]
          ).astype(jnp.bfloat16).astype(jnp.float32)
    m = _apply_norm(r2, w2_ref, bln_ref, norm, eps)

    m8, sx = _prep_acts(m, a8)
    _stream_matmul(m8, sx, gu_words, gu_scale, gu_zoff, inner_ref,
                   spec_g, gu_bufs, prestarted=True, bias_ref=bg_ref)
    if glu:
        half = spec_g.N // 2
        inner = _apply_act(act, inner_ref[:, :half], inner_ref[:, half:])
    else:
        inner = _apply_act(act, inner_ref[:], None)
    i8, sx2 = _prep_acts(inner, a8)
    _stream_matmul(i8, sx2, dn_words, dn_scale, dn_zoff, out_ref,
                   spec_d, dn_bufs, prestarted=True, bias_ref=bd_ref)
    out_ref[:] = out_ref[:] + r2


@functools.partial(jax.jit, static_argnames=("act", "norm", "eps", "glu",
                                             "a8", "interpret"))
def attn_mlp_fused(attn: jax.Array, xres: jax.Array, w2: jax.Array,
                   o: PackedWeight, gu: PackedWeight, dn: PackedWeight,
                   act: str = "silu", norm: str = "rmsnorm",
                   eps: float = 1e-5, glu: bool = True, a8: bool = True,
                   b_ln=None, b_o=None, b_g=None, b_d=None,
                   interpret: bool = False) -> jax.Array:
    """The whole post-attention half of a decoder block in one launch:
    llama-family (glu=True):  y = r2 + down(act(gate(n)) * up(n))
    OPT-family  (glu=False):  y = r2 + fc2(act(fc1(n))) (+ biases)
    with n = norm(r2) (rmsnorm / rmsnorm1p / layernorm), r2 = xres +
    o(attn) (+ b_o). Dynamic int8 activations on all three matmuls."""
    lead = attn.shape[:-1]
    a2 = attn.reshape(-1, attn.shape[-1]).astype(jnp.float32)
    x2 = xres.reshape(-1, xres.shape[-1]).astype(jnp.bfloat16)
    M = a2.shape[0]
    Mp = max(8, ((M + 7) // 8) * 8)
    if Mp != M:
        a2 = jnp.pad(a2, ((0, Mp - M), (0, 0)))
        x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))
    spec_o, spec_g, spec_d = _mm_specs(o), _mm_specs(gu), _mm_specs(dn)
    n_words = len(o.words) + len(gu.words) + len(dn.words)

    def vec(b, n):
        v = jnp.zeros((n,), jnp.float32) if b is None else b
        return v.astype(jnp.float32).reshape(1, -1)

    out = pl.pallas_call(
        functools.partial(_attn_mlp_kernel, act, norm, float(eps), glu, a8,
                          spec_o, spec_g, spec_d),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 13
        + [pl.BlockSpec(memory_space=pl.ANY)] * n_words,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, dn.Np), jnp.float32),
        scratch_shapes=[pltpu.VMEM((Mp, o.Np), jnp.float32),
                        pltpu.VMEM((Mp, gu.Np), jnp.float32)]
        + _phase_scratch(spec_o) + _phase_scratch(spec_g)
        + _phase_scratch(spec_d),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(a2, x2, w2.reshape(1, -1), vec(b_ln, xres.shape[-1]),
      vec(b_o, o.Np), vec(b_g, gu.Np), vec(b_d, dn.Np),
      *_mm_grids(o), *_mm_grids(gu),
      *_mm_grids(dn), *o.words, *gu.words, *dn.words)
    return out[:M, :dn.N].reshape(*lead, dn.N).astype(attn.dtype)


# ---------------------------------------------------------------------------
# norm_qkv_fused: ln1 + fused q/k/v matmul
# ---------------------------------------------------------------------------

def norm_qkv_fusable(pw: PackedWeight) -> bool:
    return _streamable(pw) and pw.Kp == pw.K


def _norm_qkv_kernel(norm, eps, a8, spec: _MMSpec, x_ref, w1_ref, bln_ref,
                     bqkv_ref, scale_ref, zoff_ref, *rest):
    nw = _n_words(spec)
    words = rest[:nw]
    out_ref = rest[nw]
    scratch = rest[nw + 1:]
    bufs, _ = _take_bufs(scratch, spec, 0)

    _start_first_dmas(words, bufs, spec)
    h = _apply_norm(x_ref[:].astype(jnp.float32), w1_ref, bln_ref, norm, eps)
    h8, sx = _prep_acts(h, a8)
    _stream_matmul(h8, sx, words, scale_ref, zoff_ref, out_ref,
                   spec, bufs, prestarted=True, bias_ref=bqkv_ref)


@functools.partial(jax.jit, static_argnames=("norm", "eps", "a8",
                                             "interpret"))
def norm_qkv_fused(x: jax.Array, w1: jax.Array, pw: PackedWeight,
                   norm: str = "rmsnorm", eps: float = 1e-5,
                   a8: bool = True, b_ln=None, b_qkv=None,
                   interpret: bool = False) -> jax.Array:
    """y = norm(x) @ dequant(pw) (+ b_qkv) in one launch (the attention-
    input half: ln1 + fused q/k/v matmul, dynamic int8 activations).
    norm covers rmsnorm / rmsnorm1p / layernorm (with b_ln)."""
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1]).astype(jnp.bfloat16)
    M = x2.shape[0]
    Mp = max(8, ((M + 7) // 8) * 8)
    if Mp != M:
        x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))
    spec = _mm_specs(pw)

    def vec(b, n):
        v = jnp.zeros((n,), jnp.float32) if b is None else b
        return v.astype(jnp.float32).reshape(1, -1)

    out = pl.pallas_call(
        functools.partial(_norm_qkv_kernel, norm, float(eps), a8, spec),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6
        + [pl.BlockSpec(memory_space=pl.ANY)] * len(pw.words),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, pw.Np), jnp.float32),
        scratch_shapes=_phase_scratch(spec),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x2, w1.reshape(1, -1), vec(b_ln, x.shape[-1]), vec(b_qkv, pw.Np),
      *_mm_grids(pw), *pw.words)
    return out[:M].reshape(*lead, pw.Np).astype(x.dtype)
