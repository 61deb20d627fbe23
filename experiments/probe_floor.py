"""Separate fixed call overhead (relay RTT) from true per-iteration time by
timing chains of different lengths and differencing."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def total_time(f, x, ws, iters):
    @jax.jit
    def run(x, *ws):
        def body(c, _):
            return f(c, *ws), None
        c, _ = jax.lax.scan(body, x, None, length=iters)
        return c
    out = run(x, *ws)
    float(np.asarray(out).ravel()[0])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(x, *ws)
        float(np.asarray(out).ravel()[0])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def report(name, f, x, ws=(), nbytes=None):
    t100 = total_time(f, x, ws, 100)
    t400 = total_time(f, x, ws, 400)
    per = (t400 - t100) / 300
    fixed = t100 - 100 * per
    line = f"{name:28s} per-iter {per*1e6:9.1f} us   fixed {fixed*1e3:7.1f} ms"
    if nbytes:
        line += f"   {nbytes/per/1e9:7.1f} GB/s"
    print(line)


key = jax.random.PRNGKey(0)

report("tiny add", lambda c: c + 1.0, jnp.ones((8, 128), jnp.float32))

w = jax.random.normal(key, (4096, 4096), jnp.bfloat16) * 0.01
xv = jax.random.normal(key, (8, 4096), jnp.bfloat16)
report("bf16 4096^2 matvec", lambda c, w: jnp.dot(c, w) * 1e-6 + c,
       xv, (w,), nbytes=4096 * 4096 * 2)

w8 = jax.random.normal(key, (8192, 8192), jnp.bfloat16) * 0.01
x8 = jax.random.normal(key, (8, 8192), jnp.bfloat16)
report("bf16 8192^2 matvec", lambda c, w: jnp.dot(c, w) * 1e-6 + c,
       x8, (w8,), nbytes=8192 * 8192 * 2)

from gptq_tpu.ops.pack import FIELD_SPLITS, PackedWeight
from gptq_tpu.ops.qmatmul import dequant_matmul

K = N = 4096
words = tuple(
    jax.random.randint(jax.random.fold_in(key, i), (K // (32 // fb), N),
                       jnp.iinfo(jnp.int32).min, jnp.iinfo(jnp.int32).max,
                       jnp.int32)
    for i, (fb, _) in enumerate(FIELD_SPLITS[4]))
scale = jnp.abs(jax.random.normal(key, (1, N))) * 0.002 + 0.01
pw = PackedWeight(words=words, scale=scale, zoff=scale * 8, bits=4,
                  K=K, N=N, groupsize=-1, fmt="uniform")
for impl in ("pallas", "xla"):
    report(f"4bit {impl} 4096^2 matvec",
           lambda c: dequant_matmul(c, pw, impl=impl)[..., :K].astype(c.dtype) * 1e-6 + c,
           xv, (), nbytes=K * N // 2)

# groupsize 128
ng = K // 128
scale_g = jnp.abs(jax.random.normal(key, (ng, N))) * 0.002 + 0.01
pw_g = PackedWeight(words=words, scale=scale_g, zoff=scale_g * 8, bits=4,
                    K=K, N=N, groupsize=128, fmt="uniform")
for impl in ("pallas", "xla"):
    report(f"4bit g128 {impl} matvec",
           lambda c: dequant_matmul(c, pw_g, impl=impl)[..., :K].astype(c.dtype) * 1e-6 + c,
           xv, (), nbytes=K * N // 2)

# 3-bit (two fields)
words3 = tuple(
    jax.random.randint(jax.random.fold_in(key, 10 + i), (K // (32 // fb), N),
                       jnp.iinfo(jnp.int32).min, jnp.iinfo(jnp.int32).max,
                       jnp.int32)
    for i, (fb, _) in enumerate(FIELD_SPLITS[3]))
pw3 = PackedWeight(words=words3, scale=scale, zoff=scale * 4, bits=3,
                   K=K, N=N, groupsize=-1, fmt="uniform")
for impl in ("pallas", "xla"):
    report(f"3bit {impl} 4096^2 matvec",
           lambda c: dequant_matmul(c, pw3, impl=impl)[..., :K].astype(c.dtype) * 1e-6 + c,
           xv, (), nbytes=3 * K * N // 8)

# BCQ 3-bit bitplanes
from gptq_tpu.ops.bcq_matmul import bcq_matmul

bits = 3
planes = jax.random.randint(jax.random.fold_in(key, 99), (bits, K // 32, N),
                            jnp.iinfo(jnp.int32).min, jnp.iinfo(jnp.int32).max,
                            jnp.int32)
alpha = jnp.abs(jax.random.normal(key, (1, bits, N))) * 0.01
pwb = PackedWeight(words=(planes,), alpha=alpha, bits=bits, K=K, N=N,
                   groupsize=-1, fmt="bcq")
for impl in ("pallas", "xla"):
    report(f"bcq3 {impl} 4096^2 matvec",
           lambda c: bcq_matmul(c, pwb, impl=impl)[..., :K].astype(c.dtype) * 1e-6 + c,
           xv, (), nbytes=3 * K * N // 8)
