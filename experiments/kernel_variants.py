"""Time 4-bit dequant-matvec kernel variants on the real chip.

All variants stream the same 8MB of packed words for a 4096x4096 4-bit
matmul with M=8. Ordering correctness differs (pack order can absorb any
static permutation); this measures THROUGHPUT only.
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

K = N = 4096
M = 8
ITERS = 100


def total_time(run, x, iters):
    @jax.jit
    def loop(x):
        def body(c, _):
            return run(c)[..., :K].astype(c.dtype) * 1e-6 + c, None
        c, _ = jax.lax.scan(body, x, None, length=iters)
        return c
    out = loop(x)
    float(np.asarray(out).ravel()[0])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = loop(x)
        float(np.asarray(out).ravel()[0])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def report(name, run, x):
    t100 = total_time(run, x, 100)
    t400 = total_time(run, x, 400)
    per = (t400 - t100) / 300
    bw = K * N * 0.5 / per / 1e9
    print(f"{name:36s} {per*1e6:8.1f} us   {bw:7.1f} GB/s")


key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (M, K), jnp.bfloat16)

# K-major words: (K//8, N)
words_k = jax.random.randint(key, (K // 8, N), jnp.iinfo(jnp.int32).min,
                             jnp.iinfo(jnp.int32).max, jnp.int32)
# N-major words: (K, N//8)
words_n = jax.random.randint(key, (K, N // 8), jnp.iinfo(jnp.int32).min,
                             jnp.iinfo(jnp.int32).max, jnp.int32)
scale = jnp.abs(jax.random.normal(key, (1, N))) * 0.002 + 0.01
zoff = scale * 8


def make_call(kernel, grid, in_specs, operands, tn):
    return pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs,
        out_specs=pl.BlockSpec((M, tn), lambda nt, kt: (0, nt),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((M, tn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )


# --- V1: current (iota shift + 4D reshape), code-dot epilogue -------------
def v1_kernel(tk, tn, n_kt, sb, x_ref, s_ref, z_ref, w_ref, out_ref, acc_ref):
    kt = pl.program_id(1)
    J = sb // 8
    wu = w_ref[:].astype(jnp.uint32).reshape(tk // sb, 1, J, tn)
    shifts = 4 * jax.lax.broadcasted_iota(jnp.uint32, (1, 8, 1, 1), 1)
    codes = ((wu >> shifts) & 0xF).reshape(tk, tn).astype(jnp.int32)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    part = jnp.dot(x_ref[:], codes.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
    xs = jnp.sum(x_ref[:].astype(jnp.float32), axis=1, keepdims=True)
    acc_ref[:] += part * s_ref[0] - xs * z_ref[0]

    @pl.when(kt == n_kt - 1)
    def _():
        out_ref[:] = acc_ref[:]


def run_v1(tk=512, tn=256):
    n_kt = K // tk
    grid = (N // tn, n_kt)
    specs = [
        pl.BlockSpec((M, tk), lambda nt, kt: (0, kt), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, tn), lambda nt, kt: (0, 0, nt), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, tn), lambda nt, kt: (0, 0, nt), memory_space=pltpu.VMEM),
        pl.BlockSpec((tk // 8, tn), lambda nt, kt: (kt, nt), memory_space=pltpu.VMEM),
    ]
    call = make_call(functools.partial(v1_kernel, tk, tn, n_kt, 512),
                     grid, specs, None, tn)
    return lambda c: call(c, scale[:, None, :], zoff[:, None, :], words_k)


# --- V2: static per-plane slices + concat (no 4D reshape) -----------------
def v2_kernel(tk, tn, n_kt, x_ref, s_ref, z_ref, w_ref, out_ref, acc_ref):
    kt = pl.program_id(1)
    wu = w_ref[:].astype(jnp.uint32)  # (tk//8, tn)
    pieces = [((wu >> (4 * p)) & 0xF) for p in range(8)]
    codes = jnp.concatenate(pieces, axis=0).astype(jnp.int32)  # (tk, tn)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    part = jnp.dot(x_ref[:], codes.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
    xs = jnp.sum(x_ref[:].astype(jnp.float32), axis=1, keepdims=True)
    acc_ref[:] += part * s_ref[0] - xs * z_ref[0]

    @pl.when(kt == n_kt - 1)
    def _():
        out_ref[:] = acc_ref[:]


def run_v2(tk=512, tn=256):
    n_kt = K // tk
    grid = (N // tn, n_kt)
    specs = [
        pl.BlockSpec((M, tk), lambda nt, kt: (0, kt), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, tn), lambda nt, kt: (0, 0, nt), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, tn), lambda nt, kt: (0, 0, nt), memory_space=pltpu.VMEM),
        pl.BlockSpec((tk // 8, tn), lambda nt, kt: (kt, nt), memory_space=pltpu.VMEM),
    ]
    call = make_call(functools.partial(v2_kernel, tk, tn, n_kt),
                     grid, specs, None, tn)
    return lambda c: call(c, scale[:, None, :], zoff[:, None, :], words_k)


# --- V3: K-major words, nibble mask + bitcast int32->int8 (sublane x4) ----
def v3_kernel(tk, tn, n_kt, x_ref, s_ref, z_ref, w_ref, out_ref, acc_ref):
    kt = pl.program_id(1)
    wu = w_ref[:]  # int32 (tk//8, tn)
    even = wu & 0x0F0F0F0F
    odd = jax.lax.shift_right_logical(wu, 4) & 0x0F0F0F0F
    e8 = pltpu.bitcast(even, jnp.int8)   # (tk//2, tn)
    o8 = pltpu.bitcast(odd, jnp.int8)    # (tk//2, tn)
    codes = jnp.concatenate(
        [e8.astype(jnp.bfloat16), o8.astype(jnp.bfloat16)], axis=0)  # (tk, tn)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    part = jnp.dot(x_ref[:], codes, preferred_element_type=jnp.float32)
    xs = jnp.sum(x_ref[:].astype(jnp.float32), axis=1, keepdims=True)
    acc_ref[:] += part * s_ref[0] - xs * z_ref[0]

    @pl.when(kt == n_kt - 1)
    def _():
        out_ref[:] = acc_ref[:]


def run_v3(tk=512, tn=256):
    n_kt = K // tk
    grid = (N // tn, n_kt)
    specs = [
        pl.BlockSpec((M, tk), lambda nt, kt: (0, kt), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, tn), lambda nt, kt: (0, 0, nt), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, tn), lambda nt, kt: (0, 0, nt), memory_space=pltpu.VMEM),
        pl.BlockSpec((tk // 8, tn), lambda nt, kt: (kt, nt), memory_space=pltpu.VMEM),
    ]
    call = make_call(functools.partial(v3_kernel, tk, tn, n_kt),
                     grid, specs, None, tn)
    return lambda c: call(c, scale[:, None, :], zoff[:, None, :], words_k)


if __name__ == "__main__":
    for name, mk in [
        ("v3 nibble-bitcast tk512 tn256", run_v3),
    ]:
        try:
            report(name, mk(), x)
        except Exception as e:  # noqa: BLE001
            print(f"{name:36s} FAILED: {type(e).__name__}: {str(e)[:120]}")
    # tile sweeps
    for tk, tn in [(512, 512), (1024, 256), (1024, 512), (2048, 256),
                   (512, 1024), (2048, 512), (4096, 256), (1024, 1024)]:
        try:
            report(f"v3 tk{tk} tn{tn}", run_v3(tk, tn), x)
        except Exception as e:  # noqa: BLE001
            print(f"v3 tk{tk} tn{tn}: FAILED {str(e)[:100]}")
    for tk, tn in [(2048, 256), (1024, 512), (2048, 512)]:
        try:
            report(f"v2 tk{tk} tn{tn}", run_v2(tk, tn), x)
        except Exception as e:  # noqa: BLE001
            print(f"v2 tk{tk} tn{tn}: FAILED {str(e)[:100]}")
