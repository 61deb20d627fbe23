"""Kernel-variant sweep for the 4-bit dequant matvec on the real TPU.

Variants:
  A: current qmatmul kernel at several tile sizes (f32 dequant)
  D: bf16 dequant + bf16 dot
  E: plane-decomposed: per-plane 2D extract (no 3D reshape), codes matmul
     first, group scales applied at (ng, N) epilogue
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

rng = np.random.default_rng(0)
K, N, bits, g = 4096, 4096, 4, 128
P = 32 // bits
ng = K // g
M = 8

from gptq_tpu.ops.pack import pack_codes, PackedWeight
from gptq_tpu.ops.qmatmul import dequant_matmul

codes = rng.integers(0, 2**bits, size=(K, N), dtype=np.int32)
words4 = pack_codes(jnp.asarray(codes), 4)[0]  # (K/8, N)
scale = jnp.asarray((np.abs(rng.normal(size=(ng, N))) * 0.01 + 0.001).astype(np.float32))
zoff = scale * 8
x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
xb = x.astype(jnp.bfloat16)

ITERS = 50


def timeit(f, *args):
    y = f(*args)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    y = f(*args)
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / ITERS


def scan_wrap(fn):
    def many(x):
        def body(c, _):
            y = fn(c)
            return c + 0.0 * jnp.sum(y).astype(c.dtype), None
        c, _ = jax.lax.scan(body, x, None, length=ITERS)
        return c
    return jax.jit(many)


# --- variant A: library kernel, tile sweep
pw = PackedWeight(words=(words4,), scale=scale, zoff=zoff, bits=4, K=K, N=N,
                  groupsize=g, fmt="uniform")
from gptq_tpu.ops import qmatmul


def runA(tk, tn):
    f = scan_wrap(lambda c: qmatmul._matmul_pallas(c, pw, tk=tk, tn=tn))
    dt = timeit(f, x)
    print(f"A tk={tk} tn={tn}: {dt*1e6:.1f}us", flush=True)


# --- variant D: bf16 dequant in-kernel
def _kernD(tk, tn, n_kt, x_ref, s_ref, z_ref, w_ref, o_ref, acc_ref):
    kt = pl.program_id(1)
    wu = w_ref[:].astype(jnp.uint32)
    shifts = 4 * jax.lax.broadcasted_iota(jnp.uint32, (1, P, 1), 1)
    c = ((wu[:, None, :] >> shifts) & 15).reshape(tk, tn)
    ngt = s_ref.shape[0]
    reps = tk // ngt
    s = jnp.broadcast_to(s_ref[:], (ngt, reps, tn)).reshape(tk, tn)
    z = jnp.broadcast_to(z_ref[:], (ngt, reps, tn)).reshape(tk, tn)
    w = (c.astype(jnp.bfloat16) * s.astype(jnp.bfloat16) - z.astype(jnp.bfloat16))
    part = jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += part

    @pl.when(kt == n_kt - 1)
    def _():
        o_ref[:] = acc_ref[:]


def runD(tk, tn):
    n_kt, n_nt = K // tk, N // tn
    ngt = tk // g

    def call(c):
        return pl.pallas_call(
            functools.partial(_kernD, tk, tn, n_kt),
            grid=(n_nt, n_kt),
            in_specs=[
                pl.BlockSpec((M, tk), lambda nt, kt: (0, kt), memory_space=pltpu.VMEM),
                pl.BlockSpec((ngt, 1, tn), lambda nt, kt: (kt, 0, nt), memory_space=pltpu.VMEM),
                pl.BlockSpec((ngt, 1, tn), lambda nt, kt: (kt, 0, nt), memory_space=pltpu.VMEM),
                pl.BlockSpec((tk // P, tn), lambda nt, kt: (kt, nt), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((M, tn), lambda nt, kt: (0, nt), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
            scratch_shapes=[pltpu.VMEM((M, tn), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
        )(c, scale[:, None, :], zoff[:, None, :], words4)

    f = scan_wrap(call)
    dt = timeit(f, xb)
    print(f"D tk={tk} tn={tn}: {dt*1e6:.1f}us", flush=True)


# --- variant E: plane matmuls, scales in epilogue
# codes matmul per group: y[n] = sum_g s[g,n] * (sum_{k in g} x[k] c[k,n]) - xsum[g] zoff[g,n]
# with blocked packing, word i covers k=[i*P,(i+1)*P); group of word i = i // (g/P)
def _kernE(tk, tn, n_kt, xg_ref, xs_ref, s_ref, z_ref, w_ref, o_ref, acc_ref):
    # xg_ref: (ngt_total... per tile: (ngt, g) x segments for this K tile
    # w_ref: (tk//P, tn) packed
    kt = pl.program_id(1)
    ngt = s_ref.shape[0]
    wu = w_ref[:].astype(jnp.uint32)
    acc = jnp.zeros((xg_ref.shape[0] // 1, tn), jnp.float32)  # placeholder
    # build codes bf16 (tk, tn) via 3D (same as D but no scale mult)
    shifts = 4 * jax.lax.broadcasted_iota(jnp.uint32, (1, P, 1), 1)
    c = ((wu[:, None, :] >> shifts) & 15).reshape(tk, tn).astype(jnp.bfloat16)
    # per-group segmented matmul: reshape (ngt, g, tn) x (ngt, g)
    cg = c.reshape(ngt, g, tn)
    xg = xg_ref[:]  # (ngt, g) bf16
    seg = jax.lax.dot_general(
        xg, cg, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (ngt, tn)
    s = s_ref[:].reshape(ngt, tn)
    z = z_ref[:].reshape(ngt, tn)
    xs = xs_ref[:].reshape(ngt, 1)
    part = jnp.sum(seg * s - xs * z, axis=0, keepdims=True)  # (1, tn)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += part

    @pl.when(kt == n_kt - 1)
    def _():
        o_ref[:] = acc_ref[:]


def runE(tk, tn):
    n_kt, n_nt = K // tk, N // tn
    ngt = tk // g
    xg_full = xb[0].reshape(ng, g)  # (ng, g)
    xsum = jnp.sum(x[0].reshape(ng, g), axis=1)[:, None]  # (ng, 1) f32

    def call(xg):
        return pl.pallas_call(
            functools.partial(_kernE, tk, tn, n_kt),
            grid=(n_nt, n_kt),
            in_specs=[
                pl.BlockSpec((ngt, g), lambda nt, kt: (kt, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((ngt, 1), lambda nt, kt: (kt, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((ngt, 1, tn), lambda nt, kt: (kt, 0, nt), memory_space=pltpu.VMEM),
                pl.BlockSpec((ngt, 1, tn), lambda nt, kt: (kt, 0, nt), memory_space=pltpu.VMEM),
                pl.BlockSpec((tk // P, tn), lambda nt, kt: (kt, nt), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, tn), lambda nt, kt: (0, nt), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
            scratch_shapes=[pltpu.VMEM((1, tn), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
        )(xg, xsum, scale[:, None, :], zoff[:, None, :], words4)

    f = scan_wrap(call)
    dt = timeit(f, xg_full)
    print(f"E tk={tk} tn={tn}: {dt*1e6:.1f}us", flush=True)


if __name__ == "__main__":
    print(f"SOL 4bit = {K*N*bits/8/819e9*1e6:.1f}us, bf16 = {K*N*2/819e9*1e6:.1f}us",
          flush=True)
    runA(512, 256)
    runA(1024, 512)
    runA(2048, 512)
    runD(1024, 512)
    runD(2048, 512)
    runE(1024, 512)
    runE(2048, 1024)
