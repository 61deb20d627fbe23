"""Round 4 (ADVICE r3 #2): chip A/B of the fused Pallas kernel vs the
staged native-s4 dot at M in 64..1024 on the llama-7B fused serving
shapes, to back GPTQ_TPU_STAGE_M's default with a measured crossover
(the r3 default of 256 was asserted from two shapes at M=2048 only).

Run: PYTHONPATH=/root/repo:/root/.axon_site /opt/venv/bin/python \
       experiments/r4_stage_crossover.py
"""
import sys

sys.path.insert(0, "/root/repo")
from gptq_tpu.io import enable_compilation_cache  # noqa: E402

# cache must be enabled before any module import triggers a compile
enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from gptq_tpu.ops.kernel_bench import chained_seconds, make_random_packed  # noqa: E402
from gptq_tpu.ops.qmatmul import dequant_matmul, quantize_acts_int8  # noqa: E402

SHAPES = [("qkv", 4096, 12288), ("gateup", 4096, 22528),
          ("down", 11264, 4096)]
key = jax.random.PRNGKey(0)

print(f"{'shape':>7} {'M':>5} {'pallas us':>10} {'staged us':>10} win")
for name, K, N in SHAPES:
    pw = make_random_packed(jax.random.fold_in(key, N), K, N, 4, -1)
    for M in (64, 128, 256, 512, 1024):
        x = jax.random.normal(jax.random.fold_in(key, M), (M, K),
                              jnp.float32) * 0.1
        xq, _ = quantize_acts_int8(x.reshape(-1, K))
        it = max(8, 2048 // M)
        t_pal = chained_seconds(
            lambda c: dequant_matmul(c.astype(jnp.float32), pw,
                                     impl="pallas", a8=True
                                     ).astype(jnp.float32),
            x, iters=it)
        t_stg = chained_seconds(
            lambda c: dequant_matmul(c.astype(jnp.float32), pw,
                                     impl="staged", a8=True
                                     ).astype(jnp.float32),
            x, iters=it)
        win = "staged" if t_stg < t_pal else "pallas"
        print(f"{name:>7} {M:>5} {t_pal*1e6:>10.1f} {t_stg*1e6:>10.1f} {win}")
print("DONE")
