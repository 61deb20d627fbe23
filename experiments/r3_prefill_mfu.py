"""Prefill MFU (round 3, VERDICT r2 #7): the packed Pallas matmul measured
~70% of the bf16 dense rate at M=2048 in round 1. Candidates measured here:

  * bf16 dense dot                      — the roofline the VERDICT set
  * Pallas fused unpack kernel          — the incumbent (bf16 / int8 acts)
  * staged NATIVE s4 (ops/qmatmul._matmul_staged_native) — unpack words ->
    re-centered jnp.int4 array (XLA stores s4 PACKED in HBM, layout
    T(8,128)(8,1)) and one plain dot_general: the MXU ingests s4 natively
    at the int8 dot rate, so with int8 activations the dot runs ~2x the
    bf16 dense rate. Measured through dequant_matmul(a8=True) so the
    per-row activation quant + staging pass are included.

Run: PYTHONPATH=/root/repo:/root/.axon_site /opt/venv/bin/python experiments/r3_prefill_mfu.py
"""
import numpy as np
import jax
import jax.numpy as jnp

from gptq_tpu.ops.kernel_bench import chained_seconds
from gptq_tpu.ops.pack import pack_quantized
from gptq_tpu.ops.qmatmul import (_matmul_pallas, _matmul_staged_native,
                                  dequant, dequant_matmul,
                                  quantize_acts_int8)

M = 2048
SHAPES = [(4096, 4096), (4096, 11008)]

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
    xq, _sx = quantize_acts_int8(x)
    xqp = jnp.pad(xq, ((0, 0), (0, pw.Kp - pw.K)))
    wd = dequant(pw).astype(jnp.bfloat16)
    flops = 2.0 * M * K * N

    def leg(label, fn, a, iters=24):
        try:
            t = chained_seconds(fn, a, iters=iters)
            print(f"[{K}x{N}] {label}: {t*1e3:.3f} ms "
                  f"({flops/t/1e12:.1f} TF/s)")
            return t
        except Exception as e:  # noqa: BLE001
            print(f"[{K}x{N}] {label}: FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}")
            return None

    t_dense = leg("bf16 dense dot            ",
                  lambda c: jnp.dot(c, wd,
                                    preferred_element_type=jnp.float32), x)
    leg("pallas kernel, bf16 acts  ", lambda c: _matmul_pallas(c, pw), xp)
    leg("pallas kernel, int8 acts  ", lambda c: _matmul_pallas(c, pw), xqp)
    leg("staged s4, bf16 acts      ",
        lambda c: _matmul_staged_native(c, pw), x)
    t_s4 = leg("staged s4, int8 acts      ",
               lambda c: _matmul_staged_native(c, pw), xq)
    t_e2e = leg("dequant_matmul a8 e2e     ",
                lambda c: dequant_matmul(c, pw, a8=True), x)
    if t_dense and t_e2e:
        print(f"[{K}x{N}] a8 e2e vs bf16-dense roofline: "
              f"{t_dense/t_e2e:.2f}x (VERDICT r2 #7 target was >=0.85x)")
print("DONE")
