"""Round-5 chip check: (a) Mosaic compile + parity of the new wide-kernel
paths (GQA value expansion in decode_attention_wide; the wide PARTIAL
kernel decode_attention_partial_wide), (b) the sp=1 SPCache-vs-flat A/B
re-run against the reworked deferred-write SP decode (VERDICT r4 #3:
2.88x at sp=1 against a <=1.1x bar — results/r3_sp1_ab_chip.txt).

Run: PYTHONPATH=/root/repo:/root/.axon_site /opt/venv/bin/python \
    experiments/r5_sp1_ab_chip.py | tee results/r5_sp1_ab_chip.txt
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from bench import synth_packed_params
from gptq_tpu.io import enable_compilation_cache

enable_compilation_cache()
from gptq_tpu.models.common import (ArchSpec, KVCache, fuse_serving,  # noqa: E402
                                    model_forward)
from gptq_tpu.ops.attention import (decode_attention_partial,  # noqa: E402
                                    decode_attention_partial_wide,
                                    decode_attention_wide)

# ---- (a) Mosaic compile + parity checks ------------------------------------
rng = np.random.default_rng(0)


def check_wide_gqa():
    """Mixtral-class shapes: H=32, Hkv=8, hd=128 — the GQA expansion path."""
    B, H, Hkv, hd, S = 1, 32, 8, 128, 256
    q = jnp.asarray(rng.normal(size=(B, H, hd)), jnp.float32)
    k = jnp.asarray(rng.integers(-127, 128, size=(B, S, Hkv, hd)), jnp.int8)
    v = jnp.asarray(rng.integers(-127, 128, size=(B, S, Hkv, hd)), jnp.int8)
    ks = jnp.asarray(rng.random((B, S, Hkv)) * 0.01 + 0.001, jnp.float32)
    vs = jnp.asarray(rng.random((B, S, Hkv)) * 0.01 + 0.001, jnp.float32)
    fk = jnp.asarray(rng.normal(size=(B, Hkv, hd)), jnp.float32)
    fv = jnp.asarray(rng.normal(size=(B, Hkv, hd)), jnp.float32)
    got = np.asarray(decode_attention_wide(
        q, k, v, jnp.asarray(100), 0.088, k_scale=ks, v_scale=vs,
        fresh_k=fk, fresh_v=fv))
    # oracle in numpy
    kf = np.repeat(np.asarray(k, np.float32) * np.asarray(ks)[..., None],
                   H // Hkv, axis=2)
    vf = np.repeat(np.asarray(v, np.float32) * np.asarray(vs)[..., None],
                   H // Hkv, axis=2)
    kf = np.concatenate([kf, np.repeat(np.asarray(fk), H // Hkv, 1)[:, None]],
                        axis=1)
    vf = np.concatenate([vf, np.repeat(np.asarray(fv), H // Hkv, 1)[:, None]],
                        axis=1)
    sc = np.einsum("bhd,bshd->bhs", np.asarray(q), kf) * 0.088
    valid = np.arange(S + 1) < 100
    valid[-1] = True
    sc = np.where(valid[None, None], sc, -1e9)
    p = np.exp(sc - sc.max(-1, keepdims=True))
    p = np.where(valid[None, None], p, 0.0)
    want = np.einsum("bhs,bshd->bhd", p / p.sum(-1, keepdims=True), vf)
    err = np.abs(got - want).max() / np.abs(want).max()
    print(f"wide GQA (H=32 Hkv=8 hd=128) chip rel err: {err:.5f}")
    assert err < 0.03, err


def check_partial_wide():
    """llama-7B shapes, content-masked slots, stacked static-layer feed."""
    L, B, H, hd, S = 2, 1, 32, 128, 2048
    q = jnp.asarray(rng.normal(size=(B, H, hd)), jnp.float32)
    kL = jnp.asarray(rng.integers(-127, 128, size=(L, B, S, H, hd)), jnp.int8)
    vL = jnp.asarray(rng.integers(-127, 128, size=(L, B, S, H, hd)), jnp.int8)
    ksL = jnp.asarray(rng.random((L, B, S, H)) * 0.01 + 0.001, jnp.float32)
    vsL = jnp.asarray(rng.random((L, B, S, H)) * 0.01 + 0.001, jnp.float32)
    pos = np.full((S,), -1, np.int32)
    pos[:1024] = np.arange(1024)
    pos = jnp.asarray(pos)
    m, l, acc = decode_attention_partial_wide(
        q, kL, vL, pos, 0.088, k_scale=ksL, v_scale=vsL, layer=1)
    got = np.asarray(acc) / np.asarray(l)[..., None]
    mn, ln, accn = decode_attention_partial(
        q, kL[1], vL[1], pos, 0.088, k_scale=ksL[1], v_scale=vsL[1])
    want = np.asarray(accn) / np.asarray(ln)[..., None]
    err = np.abs(got - want).max() / np.abs(want).max()
    print(f"partial wide vs narrow (hd=128, S=2k) chip rel err: {err:.5f}")
    assert err < 0.03, err


check_wide_gqa()
check_partial_wide()

# ---- (b) sp=1 A/B ----------------------------------------------------------
spec = ArchSpec(arch="llama", n_layers=8, hidden=4096, n_heads=32,
                n_kv_heads=32, ffn=11008, vocab=32000, max_pos=2048,
                act="silu", pos="rope", norm_type="rmsnorm",
                linear_bias=False, tie_embeddings=False)
params = synth_packed_params(spec, bits=4)
fused = fuse_serving(spec, params, a8=True)
del params

N_TOK = 64
PREFIX = 1024


def run_chain(step_fn, length):
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


def flat_step(weights, cache, tok):
    logits, cache = model_forward(spec, weights, tok, cache)
    return logits[:, -1], cache


flat_cache = KVCache.init(spec, 1, 2048, jnp.int8)
flat_cache = flat_cache._replace(length=jnp.asarray(PREFIX, jnp.int32))
t_half = timed(run_chain(flat_step, N_TOK // 2), fused, flat_cache)
t_full = timed(run_chain(flat_step, N_TOK), fused, flat_cache)
flat_tok = (t_full - t_half) / (N_TOK - N_TOK // 2)
print(f"flat int8-KV decode: {flat_tok*1e3:.3f} ms/token @ prefix {PREFIX}")

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
t_half = timed(run_chain(sp_step.inner, N_TOK // 2), sp_step.weights, spc)
t_full = timed(run_chain(sp_step.inner, N_TOK), sp_step.weights, spc)
sp_tok = (t_full - t_half) / (N_TOK - N_TOK // 2)
print(f"sp=1 SPCache decode: {sp_tok*1e3:.3f} ms/token @ prefix {PREFIX}")
print(f"ratio sp1/flat: {sp_tok/flat_tok:.3f} (<= ~1.3 = pass, VERDICT r4 #3)")
print("DONE")
