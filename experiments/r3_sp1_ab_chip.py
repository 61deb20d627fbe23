"""sp=1 A/B on the chip (round 3, VERDICT r2 #2 'Done' criterion): the
SPCache serving path at sp=1 (shard_map body incl. the partial-attention
kernel + streamed packed matmuls) vs the flat single-device int8-KV
decode — the sp machinery must not regress single-device serving.

Uses an 8-layer llama-7B-width slice (full 32 layers through the
per-token SPEngine step would be dominated by per-step dispatch on the
relay; the chained comparison uses the same chain protocol for both).

Run: PYTHONPATH=/root/repo:/root/.axon_site /opt/venv/bin/python experiments/r3_sp1_ab_chip.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from bench import synth_packed_params
from gptq_tpu.io import enable_compilation_cache

# ordering is load-bearing: the cache must be enabled before any module
# import can trigger a jit compile, or those programs miss the cache
enable_compilation_cache()
from gptq_tpu.models.common import ArchSpec, KVCache, fuse_serving, model_forward  # noqa: E402

spec = ArchSpec(arch="llama", n_layers=8, hidden=4096, n_heads=32,
                n_kv_heads=32, ffn=11008, vocab=32000, max_pos=2048,
                act="silu", pos="rope", norm_type="rmsnorm",
                linear_bias=False, tie_embeddings=False)
params = synth_packed_params(spec, bits=4)
fused = fuse_serving(spec, params, a8=True)

N_TOK = 64
PREFIX = 1024


def run_chain(step_state, step_fn, length):
    """Chain `length` decode steps on device from (tok, state). weights
    are a jit OPERAND — closure-captured arrays embed in the lowered
    module as constants (~1.7 GB here), which the remote compile service
    drops after ~25 min (this script found that the hard way)."""
    @jax.jit
    def run(weights, state):
        def body(carry, _):
            tok, st = carry
            logits, st = step_fn(weights, st, tok)
            nxt = jnp.argmax(logits, axis=-1).reshape(1, 1)
            return (nxt, st), None

        (tok, _), _ = jax.lax.scan(body, (jnp.zeros((1, 1), jnp.int32),
                                          state), None, length=length)
        return tok[0, 0]

    return run


def timed(fn, weights, state, reps=3):
    # the relayed compile service occasionally drops a long request
    # (broken pipe); the compilation cache keeps earlier programs, so one
    # retry resumes rather than restarts
    for attempt in range(3):
        try:
            out = fn(weights, state)
            break
        except Exception as e:  # noqa: BLE001
            if attempt == 2:
                raise
            print(f"  [retry] compile/dispatch dropped: {e}"[:200],
                  flush=True)
            time.sleep(10)
    int(np.asarray(out))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(weights, state)
        int(np.asarray(out))
        ts.append(time.perf_counter() - t0)
    return min(ts)


# --- flat path: int8 KV cache, fused a8 serving ---
def flat_step(weights, cache, tok):
    logits, cache = model_forward(spec, weights, tok, cache)
    return logits[:, -1], cache


flat_cache = KVCache.init(spec, 1, 2048, jnp.int8)
flat_cache = flat_cache._replace(length=jnp.asarray(PREFIX, jnp.int32))
t_half = timed(run_chain(flat_cache, flat_step, N_TOK // 2), fused,
               flat_cache)
t_full = timed(run_chain(flat_cache, flat_step, N_TOK), fused, flat_cache)
flat_tok = (t_full - t_half) / (N_TOK - N_TOK // 2)
print(f"flat int8-KV decode: {flat_tok*1e3:.3f} ms/token @ prefix {PREFIX}")

# --- sp=1 SPCache path through the engine's building blocks ---
from gptq_tpu.parallel.sp import (SPCache, _chunk_positions,  # noqa: E402
                                  make_sp_decode_step, make_sp_mesh)

mesh = make_sp_mesh(1)
Tc, ml = PREFIX, 2048
kvh, hd = spec.kv_heads, spec.hd
spc = SPCache(
    k=jnp.zeros((spec.n_layers, 1, ml, kvh, hd), jnp.int8),
    v=jnp.zeros((spec.n_layers, 1, ml, kvh, hd), jnp.int8),
    pos=jnp.asarray(_chunk_positions(PREFIX, 1, ml)),
    length=jnp.asarray(PREFIX, jnp.int32),
    k_scale=jnp.zeros((spec.n_layers, 1, ml, kvh), jnp.float32),
    v_scale=jnp.zeros((spec.n_layers, 1, ml, kvh), jnp.float32),
    meta=(Tc, ml))
sp_step = make_sp_decode_step(spec, fused, mesh, spc.meta, int8_cache=True,
                              check_capacity=False)
t_half = timed(run_chain(spc, sp_step.inner, N_TOK // 2), sp_step.weights,
               spc)
t_full = timed(run_chain(spc, sp_step.inner, N_TOK), sp_step.weights, spc)
sp_tok = (t_full - t_half) / (N_TOK - N_TOK // 2)
print(f"sp=1 SPCache decode: {sp_tok*1e3:.3f} ms/token @ prefix {PREFIX}")
print(f"ratio sp1/flat: {sp_tok/flat_tok:.3f} (<= ~1.1 = no regression)")
print("DONE")
