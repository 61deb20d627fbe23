"""Probe on-chip kernel time with dispatch amortized via on-device chaining.

Measures: (a) bf16 matvec bandwidth, (b) 4-bit pallas dequant-matvec,
(c) 4-bit xla path, each as a lax.scan-chained loop so the relay round-trip
is paid once per chunk, not per op.
"""
import time
import sys

import jax
import jax.numpy as jnp
import numpy as np

from gptq_tpu.ops.pack import FIELD_SPLITS, PackedWeight
from gptq_tpu.ops.qmatmul import dequant_matmul

K = N = 4096
ITERS = 100


def timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    float(np.asarray(out).ravel()[0])  # force true round trip
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        float(np.asarray(out).ravel()[0])
        ts.append(time.perf_counter() - t0)
    return min(ts) / ITERS


def chain(f):
    @jax.jit
    def run(x, *ws):
        def body(c, _):
            y = f(c, *ws)
            # feed output back (truncated/padded to x's shape) to serialize
            return y[..., :K] * 1e-6, None
        c, _ = jax.lax.scan(body, x, None, length=ITERS)
        return c
    return run


key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (8, K), jnp.bfloat16)

# bf16 dense
w = jax.random.normal(key, (K, N), jnp.bfloat16) * 0.01
t = timeit(chain(lambda c, w: jnp.dot(c, w)), x, w)
bw = K * N * 2 / t / 1e9
print(f"bf16 dense matvec:   {t*1e6:8.1f} us  -> {bw:7.1f} GB/s weight stream")

# packed 4-bit
words = tuple(
    jax.random.randint(jax.random.fold_in(key, i), (K // (32 // fb), N),
                       jnp.iinfo(jnp.int32).min, jnp.iinfo(jnp.int32).max,
                       jnp.int32)
    for i, (fb, _) in enumerate(FIELD_SPLITS[4]))
scale = jnp.abs(jax.random.normal(key, (1, N))) * 0.002 + 0.01
pw = PackedWeight(words=words, scale=scale, zoff=scale * 8, bits=4,
                  K=K, N=N, groupsize=-1, fmt="uniform")

for impl in ("pallas", "xla"):
    t = timeit(chain(lambda c, *ws: dequant_matmul(c, pw, impl=impl)), x)
    bw = K * N * 0.5 / t / 1e9
    print(f"4bit {impl:6s} matvec: {t*1e6:8.1f} us  -> {bw:7.1f} GB/s weight stream")
