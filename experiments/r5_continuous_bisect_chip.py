"""Round-5 bisect: which continuous-batcher program crashes the relay
compile helper — the B=32 window scan or the 32-row batched prefill?
Outcome (2026-08-20): window32 ok, prefill32 crashes (HTTP 500) ->
ContinuousBatcher(prefill_group=16) workaround.

Run: PYTHONPATH=/root/repo:/root/.axon_site /opt/venv/bin/python \
       experiments/r5_continuous_bisect_chip.py
"""
sys.path.insert(0, "/root/repo")
from gptq_tpu.io import enable_compilation_cache
enable_compilation_cache()
import numpy as np
import jax.numpy as jnp
from bench import llama7b_spec, _build_srv
from gptq_tpu.engine.batching import ContinuousBatcher
spec = llama7b_spec()
srv = _build_srv(spec)
cb = ContinuousBatcher(spec, srv, batch_slots=32, max_len=256,
                       cache_dtype=jnp.int8, prefill_buckets=(128,))
# 1) window program at B=32
try:
    r = cb._window(cb.params, cb.kc, cb.vc, cb.ks, cb.vs, cb.tokens,
                   cb.lengths, n=16)
    import jax; jax.block_until_ready(r[5])
    cb.kc, cb.vc, cb.ks, cb.vs = r[0], r[1], r[2], r[3]
    print(json.dumps({"window32": "ok"}), flush=True)
except Exception as e:
    print(json.dumps({"window32": f"{type(e).__name__}: {e}"[:120]}), flush=True)
# 2) prefill program at gp=32
try:
    ids = jnp.asarray(np.ones((32, 128), np.int32))
    out = cb._prefill(cb.params, cb.kc[:, :32], cb.vc[:, :32],
                      cb.ks[:, :32], cb.vs[:, :32], ids)
    import jax; jax.block_until_ready(out[4])
    print(json.dumps({"prefill32": "ok"}), flush=True)
except Exception as e:
    print(json.dumps({"prefill32": f"{type(e).__name__}: {e}"[:120]}), flush=True)
