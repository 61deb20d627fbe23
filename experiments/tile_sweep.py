"""Tile sweep on the real fused serving shapes (llama-7B, padded)."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from gptq_tpu.ops.pack import FIELD_SPLITS, PackedWeight, pack_codes
from gptq_tpu.ops.qmatmul import _matmul_pallas


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
    t300 = total_time(run, x, 300)
    per = (t300 - t100) / 200
    print(f"{name:34s} {per*1e6:8.1f} us   {nbytes/per/1e9:7.1f} GB/s",
          flush=True)


key = jax.random.PRNGKey(0)
# serving shapes after fusion + padding: qkv (4096 -> 12288),
# gate/up (4096 -> 22528), down (11264 -> 4096), o (4096 -> 4096)
SHAPES = [("qkv", 4096, 12288), ("gateup", 4096, 22528),
          ("down", 11264, 4096)]
TILES = [(0, 0), (1024, 512), (2048, 512), (1024, 1024), (2048, 1024),
         (512, 2048), (1024, 2048), (4096, 512)]

for name, K, N in SHAPES:
    codes = jax.random.randint(key, (K, N), 0, 16, jnp.int32)
    words = pack_codes(codes, 4)
    scale = jnp.abs(jax.random.normal(key, (1, N))) * 0.01
    pw = PackedWeight(words=words, scale=scale, zoff=scale * 8, bits=4,
                      K=K, N=N, groupsize=-1, fmt="uniform")
    x = jax.random.normal(key, (8, K), jnp.bfloat16)
    for tk, tn in TILES:
        if tk and (K % tk or N % tn):
            continue
        try:
            report(f"{name} {K}x{N} tk{tk or 'def'} tn{tn or 'def'}",
                   lambda c, pw=pw, tk=tk, tn=tn: _matmul_pallas(c, pw, tk, tn),
                   x, K * N // 2)
        except Exception as e:  # noqa: BLE001
            print(f"{name} tk{tk} tn{tn}: FAILED {str(e)[:90]}", flush=True)
