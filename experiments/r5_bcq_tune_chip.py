"""Round-5: tune BCQ (LUT-GEMM-parity) serving tiles at llama-7B shapes.
Outcome (2026-08-20): 4096x11008 107.7 -> 65.5 us, 11008x4096 64.2 ->
56.1 us; selections persist in results/autotune.json.

Run: PYTHONPATH=/root/repo:/root/.axon_site /opt/venv/bin/python \
       experiments/r5_bcq_tune_chip.py
"""
import os, sys, json, time
sys.path.insert(0, "/root/repo")
from gptq_tpu.io import enable_compilation_cache
enable_compilation_cache()
import numpy as np
import jax
import jax.numpy as jnp
from gptq_tpu.ops.pack import pack_bcq
from gptq_tpu.ops.autotune import tune_packed
from gptq_tpu.ops.bcq_matmul import bcq_matmul
from gptq_tpu.ops.kernel_bench import chained_seconds

rng = np.random.default_rng(0)
for (K, N) in ((4096, 4096), (4096, 11008), (11008, 4096)):
    # pack_bcq convention: B (N, num_groups, g, bits), alpha (N, ng, bits)
    B = jnp.asarray(rng.integers(0, 2, size=(N, 1, K, 3), dtype=np.int8) * 2 - 1)
    alpha = jnp.asarray(np.abs(rng.normal(size=(N, 1, 3))).astype(np.float32) * 0.01)
    pw = pack_bcq(B, alpha)
    x = jnp.asarray(rng.normal(size=(8, K)).astype(np.float32) * 0.1)
    t_before = chained_seconds(lambda c: bcq_matmul(c, pw), x, iters=64, reps=3)
    tk, tn = tune_packed(pw, M=8, log=lambda s: None, act="bf16",
                         deadline=time.perf_counter() + 240)
    t_after = chained_seconds(lambda c: bcq_matmul(c, pw), x, iters=64, reps=3)
    print(json.dumps({"shape": f"{K}x{N}", "tiles": [tk, tn],
                      "us_before": round(t_before*1e6, 1),
                      "us_after": round(t_after*1e6, 1)}), flush=True)
