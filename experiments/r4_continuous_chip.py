"""Round 4 (VERDICT r3 #1): chip smoke + throughput of CONTINUOUS
batching through engine/batching.py with the deferred-write windowed
decode (run(window=16): 16 lock-steps per host round-trip via one
on-device lax.scan).

Small-scale first (correctness on hardware: windowed outputs must equal
the window=1 outputs token-for-token), then the bench-leg protocol at
llama-7B shapes (32 slots, 64 requests, prompt 128, 64 new tokens).

Run: PYTHONPATH=/root/repo:/root/.axon_site /opt/venv/bin/python \
       experiments/r4_continuous_chip.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")
from gptq_tpu.io import enable_compilation_cache  # noqa: E402

# cache must be enabled before any module import triggers a compile
enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from bench import llama7b_spec, measure_continuous, synth_packed_params  # noqa: E402
from gptq_tpu.engine.batching import ContinuousBatcher  # noqa: E402
from gptq_tpu.models.common import ArchSpec, init_params  # noqa: E402

# --- correctness on hardware: tiny model, windowed == stepwise ---
tiny = ArchSpec(arch="llama", n_layers=2, hidden=256, n_heads=2,
                n_kv_heads=2, ffn=512, vocab=256, max_pos=128, act="silu",
                pos="rope", norm_type="rmsnorm", linear_bias=False,
                tie_embeddings=False)
tparams = init_params(tiny, jax.random.PRNGKey(0), dtype=jnp.float32)
rng = np.random.default_rng(0)
prompts = [rng.integers(1, 256, size=(n,)) for n in (4, 6, 5, 7, 3)]


def run_tiny(window):
    cb = ContinuousBatcher(tiny, tparams, batch_slots=2, max_len=64,
                           cache_dtype=jnp.float32, prefill_buckets=(8,))
    for p in prompts:
        cb.submit(p, max_new_tokens=6)
    return [r.output for r in cb.run(window=window)]


w1, w4 = run_tiny(1), run_tiny(4)
assert w1 == w4, f"windowed diverged on chip:\n{w1}\n{w4}"
print("tiny windowed == stepwise on chip: OK")

# --- throughput at llama-7B shapes (the bench-leg protocol) ---
spec = llama7b_spec()
params = synth_packed_params(spec, bits=4)
t0 = time.perf_counter()
toks = measure_continuous(spec, params)
print(f"continuous 32-slot, 64 req x (128 prompt + 64 new), window 16: "
      f"{toks:.0f} generated tok/s (incl prefill; measured in "
      f"{time.perf_counter() - t0:.0f}s incl compiles)")
