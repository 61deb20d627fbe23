"""Round-5 A/B: bf16-cache decode attention, XLA einsum (auto) vs the
wide kernel, at 2k/8k contexts. Outcome (2026-08-20): einsum wins 2k
(6.50 vs 6.56 ms), tie at 4k, kernel wins 8k (10.69 vs 11.50) ->
models/common._attn_bf16_impl length-aware routing (S > 4096).

Run: PYTHONPATH=/root/repo:/root/.axon_site /opt/venv/bin/python \
       experiments/r5_bf16_attn_len_ab_chip.py
"""
import os, sys, json
sys.path.insert(0, "/root/repo")
from gptq_tpu.io import enable_compilation_cache
enable_compilation_cache()
import jax.numpy as jnp
from bench import llama7b_spec, measure_decode, synth_packed_params
spec = llama7b_spec()
p = synth_packed_params(spec, bits=4)
out = {}
for S, prefix, n in ((2048, 1900, 64), (8192, 8000, 32)):
    for mode in ("auto", "kernel"):
        os.environ["GPTQ_TPU_ATTN_IMPL"] = mode
        try:
            t = measure_decode(spec, p, a8=True, max_len=S, prefix=prefix,
                               n_tokens=n, reps=2)
            out[f"{S}_{mode}"] = t * 1e3
            print(json.dumps({f"{S}_{mode}_ms": round(t*1e3, 3)}), flush=True)
        except Exception as e:
            print(json.dumps({f"{S}_{mode}": f"{type(e).__name__}: {e}"[:120]}),
                  flush=True)
print(json.dumps(out))
