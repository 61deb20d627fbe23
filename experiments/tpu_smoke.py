"""End-to-end smoke test on the real TPU: quantize a small synthetic LLaMa,
pack, eval PPL-style loss, decode through the Pallas kernels.

Validates that every stage (Hessian accumulation, Cholesky, the blocked
solver scan, packing, fused dequant kernels, KV-cache decode) compiles and
runs on actual hardware, not just the CPU interpreter.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from gptq_tpu.config import QuantConfig
from gptq_tpu.engine.decode import benchmark_decode
from gptq_tpu.eval.ppl import eval_ppl
from gptq_tpu.models.common import ArchSpec, init_params
from gptq_tpu.pipeline import pack_model, quantize_model

SPEC = ArchSpec(arch="llama", n_layers=2, hidden=256, n_heads=4, n_kv_heads=4,
                ffn=512, vocab=512, max_pos=256, act="silu", pos="rope",
                norm_type="rmsnorm", linear_bias=False, tie_embeddings=False)


def main():
    print("backend:", jax.default_backend(), flush=True)
    params = init_params(SPEC, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    calib = jnp.asarray(rng.integers(0, SPEC.vocab, size=(4, 64)))
    test = rng.integers(0, SPEC.vocab, size=(1, 4 * 64))

    t0 = time.time()
    ppl_fp = eval_ppl(SPEC, params, test, 64, log=lambda s: None)
    print(f"fp32 ppl {ppl_fp:.2f} ({time.time()-t0:.1f}s)", flush=True)

    t0 = time.time()
    cfg = QuantConfig(wbits=4, nsamples=4, groupsize=64, act_order=True,
                      static_groups=True)
    res = quantize_model(SPEC, params, calib, cfg, log=lambda s: None)
    print(f"quantized {len(res.quantizers)} linears in {time.time()-t0:.1f}s",
          flush=True)

    ppl_q = eval_ppl(SPEC, params, test, 64, log=lambda s: None)
    print(f"4-bit ppl {ppl_q:.2f}", flush=True)

    t0 = time.time()
    pack_model(SPEC, params, res.quantizers, cfg)
    print(f"packed in {time.time()-t0:.1f}s", flush=True)

    out = benchmark_decode(SPEC, params, rng.integers(0, 512, size=(1, 16)),
                           check=True, warmup=3, log=print)
    print("smoke OK", flush=True)


if __name__ == "__main__":
    main()
