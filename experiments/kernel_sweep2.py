"""Round-2 kernel sweep with CORRECT timing (forced host sync after an
amortizing scan). Variants for the 4-bit matvec:

  base   : current Pallas kernel
  xla    : current XLA unpack path
  int4   : codes stored as jnp.int4, XLA convert+dot (hardware int4 path?)
  int8   : codes stored as int8, XLA convert+dot (2x bytes, 1 convert/weight)
  segmm  : Pallas, codes->bf16 then per-group segmented matmul, scales in
           the (ng, N) epilogue (3 VPU ops/weight instead of 6)
  dense  : bf16 dense reference
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

from gptq_tpu.ops.pack import pack_codes, PackedWeight
from gptq_tpu.ops.qmatmul import dequant_matmul

K, N, bits, g = 4096, 4096, 4, 128
P = 32 // bits
ng = K // g
M = 8
ITERS = 30

key = jax.random.PRNGKey(0)
codes = jax.random.randint(key, (K, N), 0, 16, jnp.int32)
(words,) = pack_codes(codes, bits)
scale = jnp.abs(jax.random.normal(jax.random.fold_in(key, 1), (ng, N))) * 0.01 + 0.001
zoff = scale * 8
pw = PackedWeight(words=(words,), scale=scale, zoff=zoff, bits=4, K=K, N=N,
                  groupsize=g, fmt="uniform")
x = jax.random.normal(jax.random.fold_in(key, 2), (M, K), jnp.float32)
xb = x.astype(jnp.bfloat16)

codes_i8 = codes.astype(jnp.int8)
try:
    codes_i4 = codes.astype(jnp.int4)
    HAVE_I4 = True
except Exception:
    HAVE_I4 = False

scale_full = jnp.repeat(scale, g, axis=0).astype(jnp.bfloat16)
zoff_full = jnp.repeat(zoff, g, axis=0).astype(jnp.bfloat16)
Wd = jax.random.normal(jax.random.fold_in(key, 3), (K, N), jnp.bfloat16) * 0.01


def timed(fn, inp):
    f = jax.jit(lambda c: jax.lax.scan(
        lambda a, _: (a + 1e-12 * jnp.sum(fn(a)).astype(a.dtype), None),
        c, None, length=ITERS)[0])
    y = f(inp)
    float(np.asarray(y)[0, 0])
    t0 = time.perf_counter()
    y = f(inp)
    float(np.asarray(y)[0, 0])
    return (time.perf_counter() - t0) / ITERS


def report(name, dt, nbytes):
    print(f"{name:8s}: {dt*1e6:7.1f}us  ({nbytes/dt/1e9:6.1f} GB/s eff)", flush=True)


# segmented-matmul pallas kernel
def _seg_kernel(tk, tn, n_kt, xg_ref, xs_ref, s_ref, z_ref, w_ref, o_ref, acc_ref):
    kt = pl.program_id(1)
    ngt = s_ref.shape[0]
    wu = w_ref[:].astype(jnp.uint32)
    shifts = 4 * jax.lax.broadcasted_iota(jnp.uint32, (1, P, 1), 1)
    c = ((wu[:, None, :] >> shifts) & 15).astype(jnp.int32)
    cb = c.reshape(tk, tn).astype(jnp.bfloat16).reshape(ngt, g, tn)
    xg = xg_ref[:]  # (ngt, g) bf16
    seg = jax.lax.dot_general(xg, cb, (((1,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)  # (ngt, tn)
    s = s_ref[:].reshape(ngt, tn)
    z = z_ref[:].reshape(ngt, tn)
    xs = xs_ref[:].reshape(ngt, 1)
    part = jnp.sum(seg * s - xs * z, axis=0, keepdims=True)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
    acc_ref[:] += part

    @pl.when(kt == n_kt - 1)
    def _():
        o_ref[:] = acc_ref[:]


def seg_call(tk, tn):
    n_kt, n_nt = K // tk, N // tn
    ngt = tk // g

    def run(xrow):  # xrow: (1, K) bf16 — reshaped to groups inside
        xg = xrow.reshape(ng, g)
        xs = jnp.sum(xrow.astype(jnp.float32).reshape(ng, g), axis=1)[:, None]
        return pl.pallas_call(
            functools.partial(_seg_kernel, tk, tn, n_kt),
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
        )(xg, xs, scale[:, None, :], zoff[:, None, :], words)
    return run


if __name__ == "__main__":
    nb4 = K * N // 2
    nb16 = K * N * 2

    dt = timed(lambda c: jnp.dot(c, Wd, preferred_element_type=jnp.float32
                                 ).astype(jnp.bfloat16), xb)
    report("dense", dt, nb16)

    dt = timed(lambda c: dequant_matmul(c, pw, impl="pallas").astype(jnp.float32), x)
    report("base", dt, nb4)

    dt = timed(lambda c: dequant_matmul(c, pw, impl="xla"), x)
    report("xla", dt, nb4)

    dt = timed(lambda c: jnp.dot(
        c, codes_i8.astype(jnp.bfloat16) * scale_full - zoff_full,
        preferred_element_type=jnp.float32).astype(jnp.bfloat16), xb)
    report("int8", dt, K * N)

    if HAVE_I4:
        try:
            dt = timed(lambda c: jnp.dot(
                c, codes_i4.astype(jnp.bfloat16) * scale_full - zoff_full,
                preferred_element_type=jnp.float32).astype(jnp.bfloat16), xb)
            report("int4", dt, nb4)
        except Exception as e:
            print("int4 failed:", type(e).__name__, str(e)[:200], flush=True)

    # correctness + timing for segmented kernel
    run = seg_call(1024, 1024)
    y_ref = dequant_matmul(xb[:1].astype(jnp.float32), pw, impl="xla")
    y_seg = run(xb[:1])
    err = float(jnp.max(jnp.abs(y_seg - y_ref)))
    print(f"segmm err {err:.4f}", flush=True)
    dt = timed(lambda c: run(c).astype(jnp.bfloat16), xb[:1])
    report("segmm", dt, nb4)
