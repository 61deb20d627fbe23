"""Whole-FFN fused kernel: gate/up matmul + activation + down matmul in ONE
Pallas launch.

The serving FFN is three HBM-bound weight streams with trivial elementwise
glue between them; as separate launches each pays its own pipeline
fill/drain and the (gate, up) -> inner -> down activations round-trip
through HBM. This kernel streams the gateup and down weight words manually
(double-buffered DMA from ANY/HBM) and keeps the (M, ffn) intermediate in
VMEM, so the DMA engine stays saturated across the matmul boundary:

    m -> int8 quantize -> [stream W_gateup] -> inner = act(g) * u
      -> int8 quantize -> [stream W_down]   -> y

v1 scope = the fast serving config: single-field packed weights (2/4/8
bit), per-tensor grids (groupsize -1), no act-order perm, dynamic int8
activations, llama-family gate/up. The caller falls back to the unfused
path otherwise. Padding invariants make the fusion seamless: the fused
gateup weight's stored halves are [gate_cols | up_cols] with exact-zero
pad columns, act(0)*0 == 0 for every supported activation, and the down
weight's stored K equals the gateup stored half width.

No reference counterpart at kernel level (the reference runs one CUDA
matvec per linear, quant.py:189-203); this is the TPU "fused decode layer"
step beyond it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gptq_tpu.ops.pack import FIELD_SPLITS, PackedWeight


def _quant_rows(x):
    """(M, K) f32 -> int8 codes + (M, 1) scale (matches quantize_acts_int8)."""
    sx = jnp.max(jnp.abs(x), axis=1, keepdims=True) / 127.0 + 1e-12
    q = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
    return q, sx


def _unpack_int8(words, fb, sh):
    """Byteplane unpack of one int32 chunk (rows, tn) -> int8 (rows*P, tn).

    Mirrors qmatmul._unpack_fields_i8 for the subblock==tile case: isolate
    sub-byte plane e with a masked word-level shift, bitcast to int8 (x4
    sublane expansion in byte order), concatenate planes."""
    E = 8 // fb
    byte_mask = ((1 << fb) - 1) * 0x01010101
    planes = []
    for e in range(E):
        v = words if e == 0 else jax.lax.shift_right_logical(words, fb * e)
        if fb != 8:
            v = (v & byte_mask) << sh if sh else v & byte_mask
        planes.append(pltpu.bitcast(v, jnp.int8))
    return planes[0] if E == 1 else jnp.concatenate(planes, axis=0)


def _first_dma(w_hbm, wbuf, sem, nc):
    """The chunk-0 DMA of a phase — weights never depend on earlier phase
    outputs, so callers start this at KERNEL ENTRY to hide the phase-
    transition pipeline bubble (cross-phase prefetch)."""
    return pltpu.make_async_copy(
        w_hbm.at[:, pl.ds(0, nc)], wbuf.at[0], sem.at[0])


def _stream_matmul(x8, sx, w_hbm, scale_ref, zoff_ref, out_ref, *,
                   fb, sh, code_off, K, N, nc, sb, dtype,
                   bufs=None, prestarted=False):
    """out[:, :] = dequant-matmul of x8 against the streamed words.

    x8: (M, K) int8 in VMEM; w_hbm: (K//P, N) int32 in HBM; per-tensor
    grids scale/zoff (1, N) in VMEM. Streams N in `nc`-wide chunks with
    double-buffered DMA. sb = byteplane subblock of the packed layout.
    bufs=(wbuf, sem) uses caller-allocated buffers; prestarted=True means
    the chunk-0 DMA was already issued (via _first_dma)."""
    P = 32 // fb
    rows = K // P
    M = x8.shape[0]
    n_chunks = N // nc
    nsb = K // sb
    rows_sb = 4 * (sb // P)
    E = 8 // fb

    def body(wbuf, sem):
        def get_dma(slot, c):
            return pltpu.make_async_copy(
                w_hbm.at[:, pl.ds(c * nc, nc)], wbuf.at[slot], sem.at[slot])

        if not prestarted:
            get_dma(0, 0).start()
        xs = jnp.sum(x8.astype(jnp.int32), axis=1, keepdims=True
                     ).astype(jnp.float32)  # (M, 1)

        def loop(c, _):
            slot = c % 2

            @pl.when(c + 1 < n_chunks)
            def _():
                get_dma((c + 1) % 2, c + 1).start()

            get_dma(slot, c).wait()
            w = wbuf[slot]  # (rows, nc)
            if nsb == 1:
                c8 = _unpack_int8(w, fb, sh)
            else:
                # byteplane-subblock order: planes concatenate per subblock
                planes = []
                for e in range(E):
                    v = w if e == 0 else jax.lax.shift_right_logical(w, fb * e)
                    if fb != 8:
                        bm = ((1 << fb) - 1) * 0x01010101
                        v = (v & bm) << sh if sh else v & bm
                    planes.append(pltpu.bitcast(v, jnp.int8))
                pieces = [planes[e][s * rows_sb:(s + 1) * rows_sb]
                          for s in range(nsb) for e in range(E)]
                c8 = jnp.concatenate(pieces, axis=0)
            part = jax.lax.dot_general(
                x8, c8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)  # (M, nc)
            s = scale_ref[0, pl.ds(c * nc, nc)][None, :]
            z = zoff_ref[0, pl.ds(c * nc, nc)][None, :]
            y = (part.astype(jnp.float32) * s
                 + xs * (code_off * s - z)) * sx
            out_ref[:, pl.ds(c * nc, nc)] = y.astype(dtype)
            return 0

        jax.lax.fori_loop(0, n_chunks, loop, 0, unroll=False)

    if bufs is not None:
        body(*bufs)
    else:
        pl.run_scoped(
            body,
            wbuf=pltpu.VMEM((2, rows, nc), jnp.int32),
            sem=pltpu.SemaphoreType.DMA((2,)),
        )


def _apply_act(act, g, u):
    if act == "relu":
        a = jnp.maximum(g, 0.0)
    elif act == "gelu":
        a = jax.nn.gelu(g, approximate=False)
    elif act == "gelu_tanh":
        a = jax.nn.gelu(g, approximate=True)
    else:
        a = g * jax.nn.sigmoid(g)  # silu
    return (a * u).astype(jnp.bfloat16).astype(jnp.float32)


def _ffn_kernel(act, fb_g, sh_g, off_g, fb_d, sh_d, off_d, Kg, Ngu, Kd, Nd,
                nc_g, nc_d, sb_g, sb_d,
                m_ref, gu_scale, gu_zoff, dn_scale, dn_zoff,
                gu_words, dn_words, out_ref, inner_ref):
    def body(gubuf, gusem, dnbuf, dnsem):
        # cross-phase prefetch: both phases' chunk-0 weight DMAs start
        # immediately (weights don't depend on earlier phase outputs)
        _first_dma(gu_words, gubuf, gusem, nc_g).start()
        _first_dma(dn_words, dnbuf, dnsem, nc_d).start()
        m8, sx = _quant_rows(m_ref[:].astype(jnp.float32))
        _stream_matmul(m8, sx, gu_words, gu_scale, gu_zoff, inner_ref,
                       fb=fb_g, sh=sh_g, code_off=off_g, K=Kg, N=Ngu,
                       nc=nc_g, sb=sb_g, dtype=jnp.float32,
                       bufs=(gubuf, gusem), prestarted=True)
        half = Ngu // 2
        inner = _apply_act(act, inner_ref[:, :half], inner_ref[:, half:])
        i8, sx2 = _quant_rows(inner)
        _stream_matmul(i8, sx2, dn_words, dn_scale, dn_zoff, out_ref,
                       fb=fb_d, sh=sh_d, code_off=off_d, K=Kd, N=Nd,
                       nc=nc_d, sb=sb_d, dtype=jnp.float32,
                       bufs=(dnbuf, dnsem), prestarted=True)

    pl.run_scoped(
        body,
        gubuf=pltpu.VMEM((2, Kg // (32 // fb_g), nc_g), jnp.int32),
        gusem=pltpu.SemaphoreType.DMA((2,)),
        dnbuf=pltpu.VMEM((2, Kd // (32 // fb_d), nc_d), jnp.int32),
        dnsem=pltpu.SemaphoreType.DMA((2,)),
    )


def _pick_chunk(N: int, prefer: int) -> int | None:
    """Largest chunk width <= prefer that divides N, lane-aligned (128)."""
    nc = prefer
    while nc >= 128:
        if N % nc == 0:
            return nc
        nc //= 2
    return None


def ffn_fusable(gu: PackedWeight, dn: PackedWeight) -> bool:
    """v1 support envelope (see module docstring)."""
    for pw in (gu, dn):
        if (pw.fmt != "uniform" or len(pw.words) != 1 or pw.perm is not None
                or pw.scale.shape[0] != 1 or pw.bias is not None):
            return False
    if gu.Np != 2 * dn.Kp:  # stored gate half must feed down's stored K
        return False
    if _pick_chunk(gu.Np, 512) is None or _pick_chunk(dn.Np, 512) is None:
        return False
    return True


@functools.partial(jax.jit, static_argnames=("act", "interpret"))
def ffn_fused(m: jax.Array, gu: PackedWeight, dn: PackedWeight,
              act: str = "silu", interpret: bool = False) -> jax.Array:
    """y = down( act(gate(m)) * up(m) ) through one fused kernel.

    m: (..., hidden). gu: fused gate|up PackedWeight; dn: down. Dynamic
    int8 activations on both matmuls (the w4a8 serving path)."""
    lead = m.shape[:-1]
    x2 = m.reshape(-1, m.shape[-1]).astype(jnp.float32)
    M = x2.shape[0]
    Mp = max(8, ((M + 7) // 8) * 8)
    if Mp != M or gu.Kp != gu.K:
        x2 = jnp.pad(x2, ((0, Mp - M), (0, gu.Kp - gu.K)))
    from gptq_tpu.ops.pack import subblock

    fb_g, sh_g = FIELD_SPLITS[gu.bits][0]
    fb_d, sh_d = FIELD_SPLITS[dn.bits][0]
    off_g = 128 << sh_g if fb_g == 8 else 0
    off_d = 128 << sh_d if fb_d == 8 else 0
    Kg, Ngu, Kd, Nd = gu.Kp, gu.Np, dn.Kp, dn.Np
    # chunk widths: keep double-buffered word blocks ~<=2.5 MB each
    nc_g = _pick_chunk(
        Ngu, 512 if (Kg // (32 // fb_g)) * 512 * 4 <= 2_500_000 else 256)
    nc_d = _pick_chunk(
        Nd, 512 if (Kd // (32 // fb_d)) * 512 * 4 <= 2_500_000 else 256)
    kernel = functools.partial(
        _ffn_kernel, act, fb_g, sh_g, off_g, fb_d, sh_d, off_d,
        Kg, Ngu, Kd, Nd, nc_g, nc_d,
        subblock(Kg, gu.groupsize), subblock(Kd, dn.groupsize))
    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # m
            pl.BlockSpec(memory_space=pltpu.VMEM),  # gu scale
            pl.BlockSpec(memory_space=pltpu.VMEM),  # gu zoff
            pl.BlockSpec(memory_space=pltpu.VMEM),  # dn scale
            pl.BlockSpec(memory_space=pltpu.VMEM),  # dn zoff
            pl.BlockSpec(memory_space=pl.ANY),   # gu words (HBM)
            pl.BlockSpec(memory_space=pl.ANY),   # dn words (HBM)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Nd), jnp.float32),
        scratch_shapes=[pltpu.VMEM((Mp, Ngu), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x2, gu.scale, gu.zoff, dn.scale, dn.zoff, gu.words[0], dn.words[0])
    return out[:M, :dn.N].reshape(*lead, dn.N).astype(m.dtype)


def _attn_mlp_kernel(act, norm, eps, specs_o, specs_g, specs_d,
                     attn_ref, xres_ref, w2_ref,
                     o_scale, o_zoff, gu_scale, gu_zoff, dn_scale, dn_zoff,
                     o_words, gu_words, dn_words, out_ref,
                     obuf_ref, inner_ref):
    """o-projection + residual + rmsnorm + gateup + act + down + residual,
    one launch. specs_* = (fb, sh, code_off, K, N, nc, sb)."""
    fb_o, sh_o, off_o, K_o, N_o, nc_o, sb_o = specs_o
    fb_g, sh_g, off_g, K_g, Ngu, nc_g, sb_g = specs_g
    fb_d, sh_d, off_d, K_d, Nd, nc_d, sb_d = specs_d

    def body(owbuf, osem, gubuf, gusem, dnbuf, dnsem):
        # cross-phase prefetch: all three phases' chunk-0 weight DMAs
        # start at kernel entry (weights don't depend on phase outputs)
        _first_dma(o_words, owbuf, osem, nc_o).start()
        _first_dma(gu_words, gubuf, gusem, nc_g).start()
        _first_dma(dn_words, dnbuf, dnsem, nc_d).start()

        a8, sx0 = _quant_rows(attn_ref[:].astype(jnp.float32))
        _stream_matmul(a8, sx0, o_words, o_scale, o_zoff, obuf_ref,
                       fb=fb_o, sh=sh_o, code_off=off_o, K=K_o, N=N_o,
                       nc=nc_o, sb=sb_o, dtype=jnp.float32,
                       bufs=(owbuf, osem), prestarted=True)
        r2 = (xres_ref[:].astype(jnp.float32) + obuf_ref[:]
              ).astype(jnp.bfloat16).astype(jnp.float32)
        var = jnp.mean(r2 * r2, axis=-1, keepdims=True)
        w2 = w2_ref[0].astype(jnp.float32)[None, :]
        if norm == "rmsnorm1p":
            w2 = 1.0 + w2
        m = ((r2 * jax.lax.rsqrt(var + eps)) * w2
             ).astype(jnp.bfloat16).astype(jnp.float32)

        m8, sx = _quant_rows(m)
        _stream_matmul(m8, sx, gu_words, gu_scale, gu_zoff, inner_ref,
                       fb=fb_g, sh=sh_g, code_off=off_g, K=K_g, N=Ngu,
                       nc=nc_g, sb=sb_g, dtype=jnp.float32,
                       bufs=(gubuf, gusem), prestarted=True)
        half = Ngu // 2
        inner = _apply_act(act, inner_ref[:, :half], inner_ref[:, half:])
        i8, sx2 = _quant_rows(inner)
        _stream_matmul(i8, sx2, dn_words, dn_scale, dn_zoff, out_ref,
                       fb=fb_d, sh=sh_d, code_off=off_d, K=K_d, N=Nd,
                       nc=nc_d, sb=sb_d, dtype=jnp.float32,
                       bufs=(dnbuf, dnsem), prestarted=True)
        out_ref[:] = out_ref[:] + r2

    pl.run_scoped(
        body,
        owbuf=pltpu.VMEM((2, K_o // (32 // fb_o), nc_o), jnp.int32),
        osem=pltpu.SemaphoreType.DMA((2,)),
        gubuf=pltpu.VMEM((2, K_g // (32 // fb_g), nc_g), jnp.int32),
        gusem=pltpu.SemaphoreType.DMA((2,)),
        dnbuf=pltpu.VMEM((2, K_d // (32 // fb_d), nc_d), jnp.int32),
        dnsem=pltpu.SemaphoreType.DMA((2,)),
    )


def _mm_specs(pw: PackedWeight) -> tuple:
    fb, sh = FIELD_SPLITS[pw.bits][0]
    off = 128 << sh if fb == 8 else 0
    from gptq_tpu.ops.pack import subblock

    nc = _pick_chunk(
        pw.Np, 512 if (pw.Kp // (32 // fb)) * 512 * 4 <= 2_500_000 else 256)
    return (fb, sh, off, pw.Kp, pw.Np, nc, subblock(pw.Kp, pw.groupsize))


def attn_mlp_fusable(o: PackedWeight, gu: PackedWeight,
                     dn: PackedWeight) -> bool:
    if (o.fmt != "uniform" or len(o.words) != 1 or o.perm is not None
            or o.scale.shape[0] != 1 or o.bias is not None
            or o.Kp != o.K or _pick_chunk(o.Np, 512) is None):
        return False
    # stored == logical widths so the residual/norm lanes line up exactly
    if o.Np != o.N or dn.Np != dn.N or o.Np != gu.Kp or dn.N != o.N:
        return False
    return ffn_fusable(gu, dn)


@functools.partial(jax.jit, static_argnames=("act", "norm", "eps",
                                             "interpret"))
def attn_mlp_fused(attn: jax.Array, xres: jax.Array, w2: jax.Array,
                   o: PackedWeight, gu: PackedWeight, dn: PackedWeight,
                   act: str = "silu", norm: str = "rmsnorm",
                   eps: float = 1e-5, interpret: bool = False) -> jax.Array:
    """The whole post-attention half of a llama-family decoder block in one
    launch: y = r2 + down(act(gate(n)) * up(n)), n = rmsnorm(r2) * w2,
    r2 = xres + o(attn). Dynamic int8 activations on all three matmuls."""
    lead = attn.shape[:-1]
    a2 = attn.reshape(-1, attn.shape[-1]).astype(jnp.float32)
    x2 = xres.reshape(-1, xres.shape[-1]).astype(jnp.bfloat16)
    M = a2.shape[0]
    Mp = max(8, ((M + 7) // 8) * 8)
    if Mp != M or o.Kp != o.K:
        a2 = jnp.pad(a2, ((0, Mp - M), (0, o.Kp - a2.shape[1])))
        x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))
    kernel = functools.partial(
        _attn_mlp_kernel, act, norm, float(eps),
        _mm_specs(o), _mm_specs(gu), _mm_specs(dn))
    Nd = dn.Np
    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # attn
            pl.BlockSpec(memory_space=pltpu.VMEM),  # xres
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w2 (1, hidden)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # o scale
            pl.BlockSpec(memory_space=pltpu.VMEM),  # o zoff
            pl.BlockSpec(memory_space=pltpu.VMEM),  # gu scale
            pl.BlockSpec(memory_space=pltpu.VMEM),  # gu zoff
            pl.BlockSpec(memory_space=pltpu.VMEM),  # dn scale
            pl.BlockSpec(memory_space=pltpu.VMEM),  # dn zoff
            pl.BlockSpec(memory_space=pl.ANY),      # o words
            pl.BlockSpec(memory_space=pl.ANY),      # gu words
            pl.BlockSpec(memory_space=pl.ANY),      # dn words
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Nd), jnp.float32),
        scratch_shapes=[pltpu.VMEM((Mp, o.Np), jnp.float32),
                        pltpu.VMEM((Mp, gu.Np), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(a2, x2, w2.reshape(1, -1), o.scale, o.zoff, gu.scale, gu.zoff,
      dn.scale, dn.zoff, o.words[0], gu.words[0], dn.words[0])
    return out[:M, :dn.N].reshape(*lead, dn.N).astype(attn.dtype)


def norm_qkv_fusable(pw: PackedWeight) -> bool:
    return (pw.fmt == "uniform" and len(pw.words) == 1 and pw.perm is None
            and pw.scale.shape[0] == 1 and pw.bias is None
            and pw.Kp == pw.K and _pick_chunk(pw.Np, 512) is not None)


def _norm_qkv_kernel(norm, eps, specs, x_ref, w1_ref,
                     scale_ref, zoff_ref, words, out_ref):
    fb, sh, off, K, N, nc, sb = specs

    def body(wbuf, sem):
        _first_dma(words, wbuf, sem, nc).start()
        x = x_ref[:].astype(jnp.float32)
        var = jnp.mean(x * x, axis=-1, keepdims=True)
        w1 = w1_ref[0].astype(jnp.float32)[None, :]
        if norm == "rmsnorm1p":
            w1 = 1.0 + w1
        h = ((x * jax.lax.rsqrt(var + eps)) * w1
             ).astype(jnp.bfloat16).astype(jnp.float32)
        h8, sx = _quant_rows(h)
        _stream_matmul(h8, sx, words, scale_ref, zoff_ref, out_ref,
                       fb=fb, sh=sh, code_off=off, K=K, N=N, nc=nc, sb=sb,
                       dtype=jnp.float32, bufs=(wbuf, sem), prestarted=True)

    pl.run_scoped(
        body,
        wbuf=pltpu.VMEM((2, specs[3] // (32 // specs[0]), specs[5]),
                        jnp.int32),
        sem=pltpu.SemaphoreType.DMA((2,)),
    )


@functools.partial(jax.jit, static_argnames=("norm", "eps", "interpret"))
def norm_qkv_fused(x: jax.Array, w1: jax.Array, pw: PackedWeight,
                   norm: str = "rmsnorm", eps: float = 1e-5,
                   interpret: bool = False) -> jax.Array:
    """y = rmsnorm(x)*w1 @ dequant(pw) in one launch (the attention-input
    half: ln1 + fused q/k/v matmul, dynamic int8 activations)."""
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1]).astype(jnp.bfloat16)
    M = x2.shape[0]
    Mp = max(8, ((M + 7) // 8) * 8)
    if Mp != M:
        x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_norm_qkv_kernel, norm, float(eps), _mm_specs(pw)),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w1 (1, hidden)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # scale
            pl.BlockSpec(memory_space=pltpu.VMEM),  # zoff
            pl.BlockSpec(memory_space=pl.ANY),      # words
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, pw.Np), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x2, w1.reshape(1, -1), pw.scale, pw.zoff, pw.words[0])
    return out[:M].reshape(*lead, pw.Np).astype(x.dtype)
