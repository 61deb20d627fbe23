"""Bisect where the dequant-matvec time goes on the TPU.

M1: DMA + dot only (no unpack — w = words broadcast nonsense, constant-ish)
M2: unpack only (no dot)
M3: full kernel (unpack + dot)
M4: XLA dense bf16 matvec reference
M5: unpack via per-plane 2D slices into scratch (no 3D broadcast/reshape)
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
K, N, bits = 4096, 4096, 4
P = 32 // bits
M = 8
TK, TN = 1024, 1024

from gptq_tpu.ops.pack import pack_codes

codes = rng.integers(0, 16, size=(K, N), dtype=np.int32)
(words,) = pack_codes(jnp.asarray(codes), 4)
x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
xb = x.astype(jnp.bfloat16)
Wb = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32)).astype(jnp.bfloat16)

ITERS = 50


def scan_wrap(fn, inp):
    def many(x):
        def body(c, _):
            y = fn(c)
            return c + 0.0 * jnp.sum(y).astype(c.dtype), None
        c, _ = jax.lax.scan(body, x, None, length=ITERS)
        return c
    f = jax.jit(many)
    y = f(inp)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    y = f(inp)
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / ITERS


def grid_call(kernel, extra_scratch=None):
    n_kt, n_nt = K // TK, N // TN
    return pl.pallas_call(
        functools.partial(kernel, n_kt),
        grid=(n_nt, n_kt),
        in_specs=[
            pl.BlockSpec((M, TK), lambda nt, kt: (0, kt), memory_space=pltpu.VMEM),
            pl.BlockSpec((TK // P, TN), lambda nt, kt: (kt, nt), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, TN), lambda nt, kt: (0, nt), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((M, TN), jnp.float32)]
        + (extra_scratch or []),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )


def m1_kernel(n_kt, x_ref, w_ref, o_ref, acc_ref):
    kt = pl.program_id(1)
    # touch the words without unpacking: one cheap op, then a dot with a
    # reused (cast) buffer of the right shape
    w0 = w_ref[:].astype(jnp.float32)  # (TK/P, TN)
    wfull = jnp.concatenate([w0] * P, axis=0)  # (TK, TN) — cheap copies
    part = jnp.dot(x_ref[:], wfull * 1e-9, preferred_element_type=jnp.float32)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
    acc_ref[:] += part

    @pl.when(kt == n_kt - 1)
    def _():
        o_ref[:] = acc_ref[:]


def m2_kernel(n_kt, x_ref, w_ref, o_ref, acc_ref):
    kt = pl.program_id(1)
    wu = w_ref[:].astype(jnp.uint32)
    shifts = 4 * jax.lax.broadcasted_iota(jnp.uint32, (1, P, 1), 1)
    c = ((wu[:, None, :] >> shifts) & 15).reshape(TK, TN).astype(jnp.int32)
    part = jnp.sum(c.astype(jnp.float32), axis=0, keepdims=True)
    part = jnp.broadcast_to(part, (M, TN))

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
    acc_ref[:] += part

    @pl.when(kt == n_kt - 1)
    def _():
        o_ref[:] = acc_ref[:]


def m3_kernel(n_kt, x_ref, w_ref, o_ref, acc_ref):
    kt = pl.program_id(1)
    wu = w_ref[:].astype(jnp.uint32)
    shifts = 4 * jax.lax.broadcasted_iota(jnp.uint32, (1, P, 1), 1)
    c = ((wu[:, None, :] >> shifts) & 15).astype(jnp.int32).reshape(TK, TN).astype(jnp.float32)
    part = jnp.dot(x_ref[:], c, preferred_element_type=jnp.float32)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
    acc_ref[:] += part

    @pl.when(kt == n_kt - 1)
    def _():
        o_ref[:] = acc_ref[:]


def m5_kernel(n_kt, x_ref, w_ref, o_ref, acc_ref, cbuf):
    kt = pl.program_id(1)
    wu = w_ref[:].astype(jnp.int32)  # (TK/P, TN)
    for p in range(P):
        plane = (wu >> (4 * p)) & 15  # 2D (TK/P, TN)
        cbuf[p * (TK // P):(p + 1) * (TK // P), :] = plane.astype(jnp.float32)
    part = jnp.dot(x_ref[:], cbuf[:], preferred_element_type=jnp.float32)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
    acc_ref[:] += part

    @pl.when(kt == n_kt - 1)
    def _():
        o_ref[:] = acc_ref[:]


if __name__ == "__main__":
    print(f"tiles ({TK},{TN}) grid {(N//TN, K//TK)}", flush=True)
    t = scan_wrap(lambda c: jnp.dot(c, Wb, preferred_element_type=jnp.float32), xb)
    print(f"M4 dense bf16 XLA: {t*1e6:.1f}us", flush=True)
    t = scan_wrap(lambda c: grid_call(m1_kernel)(c, words), x)
    print(f"M1 dma+dot: {t*1e6:.1f}us", flush=True)
    t = scan_wrap(lambda c: grid_call(m2_kernel)(c, words), x)
    print(f"M2 unpack only: {t*1e6:.1f}us", flush=True)
    t = scan_wrap(lambda c: grid_call(m3_kernel)(c, words), x)
    print(f"M3 unpack+dot: {t*1e6:.1f}us", flush=True)
    t = scan_wrap(
        lambda c: grid_call(m5_kernel,
                            [pltpu.VMEM((TK, TN), jnp.float32)])(c, words), x)
    print(f"M5 per-plane 2D: {t*1e6:.1f}us", flush=True)
