"""Prefill MFU investigation (round 3, VERDICT r2 #7): the packed matmul
measured ~70% of the bf16 dense rate at M=2048 in round 1. Candidates:
tile shapes (the M>64 default is conservative), the XLA-fused
unpack+dot, and two-step dequant-to-bf16 staging (materialize W once in
HBM, then a full-rate dense dot — at M=2048 compute dominates, the extra
2 bytes/weight of traffic is ~10% of the dot time).

Run: PYTHONPATH=/root/repo:/root/.axon_site /opt/venv/bin/python experiments/r3_prefill_mfu.py
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp

from gptq_tpu.ops.kernel_bench import chained_seconds
from gptq_tpu.ops.pack import pack_quantized
from gptq_tpu.ops.qmatmul import _matmul_pallas, dequant, dequant_matmul

M = 2048
SHAPES = [(4096, 4096), (4096, 11008)]  # (K, N_logical)

rng = np.random.default_rng(0)
for K, N in SHAPES:
    W = jnp.asarray(rng.normal(size=(N, K)).astype(np.float32) * 0.02)
    scale = jnp.abs(jnp.asarray(rng.normal(size=(1, N)).astype(np.float32))
                    ) * 0.01 + 0.01
    zero = jnp.full((1, N), 8.0, jnp.float32)
    pw = pack_quantized(W, scale, zero, bits=4)
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    xp = jnp.pad(x, ((0, 0), (0, pw.Kp - pw.K)))
    wd = dequant(pw).astype(jnp.bfloat16)  # (K, N) dense bf16
    flops = 2.0 * M * K * N

    def tf(t):
        return flops / t / 1e12

    def dense(c):
        return jnp.dot(c, wd, preferred_element_type=jnp.float32)

    t_dense = chained_seconds(dense, x, iters=16)
    print(f"[{K}x{N}] bf16 dense dot: {t_dense*1e3:.3f} ms "
          f"({tf(t_dense):.1f} TF/s)  <- roofline")

    def xla_path(c):
        return dequant_matmul(c, pw, impl="xla")

    t_xla = chained_seconds(xla_path, x, iters=8)
    print(f"[{K}x{N}] XLA fused unpack+dot: {t_xla*1e3:.3f} ms "
          f"({tf(t_xla):.1f} TF/s)")

    def staged(c):
        w = dequant(pw).astype(jnp.bfloat16)
        return jnp.dot(c, w, preferred_element_type=jnp.float32)

    t_staged = chained_seconds(staged, x, iters=8)
    print(f"[{K}x{N}] dequant->bf16 staged + dense: {t_staged*1e3:.3f} ms "
          f"({tf(t_staged):.1f} TF/s)")

    for tk, tn in [(0, 0), (512, 512), (1024, 512), (512, 1024),
                   (1024, 1024), (2048, 512)]:
        label = f"tiles {tk}x{tn}" if tk else "tiles default"
        try:
            fn = functools.partial(_matmul_pallas, tk=tk, tn=tn)
            t = chained_seconds(lambda c: fn(c, pw), xp, iters=8)
            print(f"[{K}x{N}] pallas {label}: {t*1e3:.3f} ms "
                  f"({tf(t):.1f} TF/s)")
        except Exception as e:  # noqa: BLE001
            print(f"[{K}x{N}] pallas {label}: FAILED "
                  f"{type(e).__name__}: {str(e)[:120]}")
print("DONE")
