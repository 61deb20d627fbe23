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


def _stream_matmul(x8, sx, w_hbm, scale_ref, zoff_ref, out_ref, *,
                   fb, sh, code_off, K, N, nc, sb, dtype):
    """out[:, :] = dequant-matmul of x8 against the streamed words.

    x8: (M, K) int8 in VMEM; w_hbm: (K//P, N) int32 in HBM; per-tensor
    grids scale/zoff (1, N) in VMEM. Streams N in `nc`-wide chunks with
    double-buffered DMA. sb = byteplane subblock of the packed layout."""
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

    pl.run_scoped(
        body,
        wbuf=pltpu.VMEM((2, rows, nc), jnp.int32),
        sem=pltpu.SemaphoreType.DMA((2,)),
    )


def _ffn_kernel(act, fb_g, sh_g, off_g, fb_d, sh_d, off_d, Kg, Ngu, Kd, Nd,
                nc_g, nc_d, sb_g, sb_d,
                m_ref, gu_scale, gu_zoff, dn_scale, dn_zoff,
                gu_words, dn_words, out_ref, inner_ref):
    M = m_ref.shape[0]
    m8, sx = _quant_rows(m_ref[:].astype(jnp.float32))
    _stream_matmul(m8, sx, gu_words, gu_scale, gu_zoff, inner_ref,
                   fb=fb_g, sh=sh_g, code_off=off_g, K=Kg, N=Ngu,
                   nc=nc_g, sb=sb_g, dtype=jnp.float32)
    half = Ngu // 2
    g = inner_ref[:, :half]
    u = inner_ref[:, half:]
    if act == "relu":
        a = jnp.maximum(g, 0.0)
    elif act == "gelu":
        a = jax.nn.gelu(g, approximate=False)
    elif act == "gelu_tanh":
        a = jax.nn.gelu(g, approximate=True)
    else:
        a = g * jax.nn.sigmoid(g)  # silu
    inner = (a * u).astype(jnp.bfloat16).astype(jnp.float32)
    i8, sx2 = _quant_rows(inner)
    _stream_matmul(i8, sx2, dn_words, dn_scale, dn_zoff, out_ref,
                   fb=fb_d, sh=sh_d, code_off=off_d, K=Kd, N=Nd,
                   nc=nc_d, sb=sb_d, dtype=jnp.float32)


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
