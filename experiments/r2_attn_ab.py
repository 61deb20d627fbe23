"""Model-level A/B of the decode-attention kernel vs the XLA einsum path
at bench shapes (S=256) and long context (S=2048), same process. The
standalone microbench says kernel 18 vs einsum 24.5 us at S=256, but
inside the big jitted program XLA fuses the einsum with neighbors, so the
incremental cost may be lower than standalone — adjudicate here."""
import os
import numpy as np
import jax.numpy as jnp

import bench

spec = bench.llama7b_spec()
p = bench.synth_packed_params(spec, bits=4)
from gptq_tpu.pipeline import quantize_lm_head
quantize_lm_head(spec, p, bits=8)

for max_len in (256, 2048):
    for mode in ("xla", "kernel"):
        os.environ["GPTQ_TPU_ATTN_IMPL"] = mode
        t = bench.measure_decode(spec, p, a8=True, max_len=max_len)
        print(f"S={max_len} attn={mode}: {t*1e3:.3f} ms/token "
              f"({1/t:.1f} tok/s)", flush=True)
