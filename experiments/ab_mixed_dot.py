"""A/B: int8 codes fed straight to the MXU vs converted to bf16 first."""
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

M, K, N = 8, 4096, 4096
TK, TN = 1024, 512


def total_time(run, x, iters):
    @jax.jit
    def loop(x):
        def body(c, _):
            return c + (jnp.sum(run(c)) * 1e-9).astype(c.dtype), None
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


def report(name, run, x, nbytes):
    t100 = total_time(run, x, 100)
    t400 = total_time(run, x, 400)
    per = (t400 - t100) / 300
    print(f"{name:30s} {per*1e6:8.1f} us   {nbytes/per/1e9:7.1f} GB/s",
          flush=True)


def kern(convert, x_ref, s_ref, z_ref, w_ref, out_ref, acc_ref):
    kt = pl.program_id(1)
    wu = w_ref[:]
    pieces = []
    for e in range(2):
        v = wu if e == 0 else jax.lax.shift_right_logical(wu, 4)
        pieces.append(pltpu.bitcast(v & 0x0F0F0F0F, jnp.int8))
    nsb = TK // 512
    rows = 512 // 2
    c8 = jnp.concatenate(
        [pieces[e][s * rows:(s + 1) * rows] for s in range(nsb)
         for e in range(2)], axis=0)
    if convert:
        c8 = c8.astype(jnp.bfloat16)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    part = jnp.dot(x_ref[:], c8, preferred_element_type=jnp.float32)
    xs = jnp.sum(x_ref[:].astype(jnp.float32), axis=1, keepdims=True)
    acc_ref[:] += part * s_ref[0] - xs * z_ref[0]

    @pl.when(kt == K // TK - 1)
    def _():
        out_ref[:] = acc_ref[:]


def make(convert):
    specs = [
        pl.BlockSpec((M, TK), lambda nt, kt: (0, kt), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, TN), lambda nt, kt: (0, 0, nt), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, TN), lambda nt, kt: (0, 0, nt), memory_space=pltpu.VMEM),
        pl.BlockSpec((TK // 8, TN), lambda nt, kt: (kt, nt), memory_space=pltpu.VMEM),
    ]
    call = pl.pallas_call(
        functools.partial(kern, convert),
        grid=(N // TN, K // TK),
        in_specs=specs,
        out_specs=pl.BlockSpec((M, TN), lambda nt, kt: (0, nt),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((M, TN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )
    return lambda c: call(c, scale[:, None, :], zoff[:, None, :], words)


key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (M, K), jnp.bfloat16)
words = jax.random.randint(key, (K // 8, N), jnp.iinfo(jnp.int32).min,
                           jnp.iinfo(jnp.int32).max, jnp.int32)
scale = jnp.abs(jax.random.normal(key, (1, N))) * 0.01
zoff = scale * 8

for _ in range(2):  # two rounds to see run-to-run noise
    report("int8 direct dot", make(False), x, K * N // 2)
    report("convert to bf16 first", make(True), x, K * N // 2)
