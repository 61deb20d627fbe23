"""Kernel latency microbenchmark harness + seeded test fixtures.

Counterpart of the reference's lutgemm benchmark tooling: the
makeRandom{Input,Weight,Alpha,...} device fixtures
(reference: lut_gemm/lutgemm_cuda.cpp:52-107) and the in-kernel
min/max/avg latency loop (reference: lutgemm_cuda_kernel.cu:14-60,150-176).

Timing chains `chain` kernel invocations on-device per dispatch (lax.scan
feeding each output back into the next input) and divides — one host
round-trip costs ~30 ms on the relayed backend and would otherwise swamp a
~20 us kernel. Stats are over the per-dispatch medians of the chains.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from gptq_tpu.ops.bcq_matmul import bcq_matmul
from gptq_tpu.ops.pack import FIELD_SPLITS, PackedWeight, pack_bcq, pack_codes
from gptq_tpu.ops.qmatmul import dequant_matmul


# --- fixtures (reference: lutgemm_cuda.cpp makeRandom*) -------------------

def make_random_input(key, m: int, k: int, dtype=jnp.float32) -> jax.Array:
    return jax.random.normal(key, (m, k), dtype)


def make_random_packed(key, k: int, n: int, bits: int, groupsize: int = -1
                       ) -> PackedWeight:
    ng = 1 if groupsize <= 0 else k // groupsize
    keys = jax.random.split(key, 3)
    codes = jax.random.randint(keys[0], (k, n), 0, 2**bits, jnp.int32)
    words = pack_codes(codes, bits, groupsize)
    scale = jnp.abs(jax.random.normal(keys[1], (ng, n))) * 0.01 + 0.001
    zoff = scale * (2 ** (bits - 1))
    return PackedWeight(words=words, scale=scale, zoff=zoff, bits=bits,
                        K=k, N=n, groupsize=groupsize, fmt="uniform")


def make_random_bcq(key, k: int, n: int, bits: int, groupsize: int = -1
                    ) -> PackedWeight:
    ng = 1 if groupsize <= 0 else k // groupsize
    g = k if groupsize <= 0 else groupsize
    keys = jax.random.split(key, 2)
    B = jnp.where(jax.random.normal(keys[0], (n, ng, g, bits)) > 0, 1.0, -1.0)
    alpha = jnp.abs(jax.random.normal(keys[1], (n, ng, bits))) * 0.01
    return pack_bcq(B, alpha, groupsize=groupsize)


# --- latency harness ------------------------------------------------------

@dataclass
class LatencyStats:
    min_s: float
    max_s: float
    avg_s: float
    median_s: float
    p90_s: float

    def __str__(self) -> str:
        return (f"min {self.min_s*1e6:.1f}us avg {self.avg_s*1e6:.1f}us "
                f"median {self.median_s*1e6:.1f}us p90 {self.p90_s*1e6:.1f}us "
                f"max {self.max_s*1e6:.1f}us")


def chained_seconds(fn, x, *args, iters: int = 64, reps: int = 3) -> float:
    """Canonical per-op device time: chain `iters` and `3*iters` calls
    on-device (scalar feedback keeps the loop serial and output-shape
    independent), difference the two so the ~30 ms dispatch round-trip
    cancels, min over reps to reject chip noise. Shared by the autotuner;
    time_fn below layers distribution stats on the same protocol."""

    def make(length):
        @jax.jit
        def run(x, *args):
            def body(c, _):
                return c + (jnp.sum(fn(c, *args)) * 1e-9).astype(c.dtype), None
            c, _ = jax.lax.scan(body, x, None, length=length)
            return c
        return run

    short, long = make(iters), make(3 * iters)
    ts = []
    for run in (short, long):
        out = run(x, *args)
        float(np.asarray(out).ravel()[0])
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = run(x, *args)
            float(np.asarray(out).ravel()[0])
            best = min(best, time.perf_counter() - t0)
        ts.append(best)
    return max((ts[1] - ts[0]) / (2 * iters), 1e-9)


def time_fn(fn, x, *args, iters: int = 5, warmup: int = 1,
            chain: int = 64) -> LatencyStats:
    """Per-invocation latency: chain the kernel `chain` and `4*chain` times
    on-device (output feeds the next input, so the loop cannot collapse)
    and difference the two — the ~30 ms dispatch round-trip cancels."""

    def make(length):
        @jax.jit
        def run(x, *args):
            def body(c, _):
                y = fn(c, *args)
                # scalar feedback: output-shape independent (n may be < k)
                return (c + (jnp.sum(y) * 1e-9).astype(c.dtype)), None
            c, _ = jax.lax.scan(body, x, None, length=length)
            return c
        return run

    short, long = make(chain), make(4 * chain)
    samples = []
    for run in (short, long):
        for _ in range(max(1, warmup)):
            y = run(x, *args)
        float(np.asarray(y).ravel()[0])
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            y = run(x, *args)
            float(np.asarray(y).ravel()[0])
            ts.append(time.perf_counter() - t0)
        samples.append(np.asarray(ts))
    per = (samples[1][:, None] - samples[0][None, :]).ravel() / (3 * chain)
    per = np.maximum(per, 0.0)
    return LatencyStats(float(per.min()), float(per.max()), float(per.mean()),
                        float(np.median(per)), float(np.percentile(per, 90)))


def bench_kernels(m: int = 1, k: int = 4096, n: int = 4096,
                  bits_list=(2, 3, 4, 8), groupsize: int = 128,
                  log=print) -> dict:
    """The `--lut_bench` equivalent: latency of every serving kernel at the
    given shape vs the dense bf16 matmul."""
    key = jax.random.PRNGKey(0)
    x = make_random_input(key, m, k)
    results = {}

    Wd = jax.random.normal(key, (k, n), jnp.bfloat16) * 0.01
    st = time_fn(lambda a: jnp.dot(a.astype(jnp.bfloat16), Wd,
                                   preferred_element_type=jnp.float32), x)
    results["dense_bf16"] = st
    log(f"dense bf16       : {st}")

    for bits in bits_list:
        pw = make_random_packed(jax.random.fold_in(key, bits), k, n, bits,
                                groupsize)
        st = time_fn(lambda a, pw=pw: dequant_matmul(a, pw), x)
        results[f"uniform_{bits}bit"] = st
        log(f"uniform {bits}-bit    : {st}")

    for bits in (2, 3):
        pw = make_random_bcq(jax.random.fold_in(key, 100 + bits), k, n, bits,
                             groupsize)
        st = time_fn(lambda a, pw=pw: bcq_matmul(a, pw), x)
        results[f"bcq_{bits}bit"] = st
        log(f"bcq {bits}-bit        : {st}")
    return results


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=1)
    ap.add_argument("--k", type=int, default=4096)
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--groupsize", type=int, default=128)
    args = ap.parse_args()
    bench_kernels(args.m, args.k, args.n, groupsize=args.groupsize)
