"""Round 4: decompose the batched lock-step decode cost at b=8/32
(VERDICT r3 #1: b32 measures ~35 ms/step = 908 tok/s while the
weight+KV byte floor is ~10 ms — find the missing 2-3x).

Components at llama-7B shapes, fused a8 serving (what bench.py's
toks_chip_b8/b32 legs run), each chained on-device and differenced:

  per layer:  norm_qkv_fused(M=B)   attn_mlp_fused(M=B)
              attention: XLA einsum bf16 cache | decode_attention kernel
              bf16 | int8 kernel
              cache write-back (the carried (L,B,S,H,hd) update chain)
  fixed:      8-bit packed head via norm_qkv_fused(M=B) + argmax

then sum-of-parts x 32 layers vs the measured full-model step
(bench.measure_decode) to locate unaccounted glue.

Run: PYTHONPATH=/root/repo:/root/.axon_site /opt/venv/bin/python \
       experiments/r4_batch_decomp.py [--batch 32]
"""
import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

from gptq_tpu.io import enable_compilation_cache

# cache must be enabled before any module import triggers a compile
enable_compilation_cache()

from bench import llama7b_spec, measure_decode, synth_packed_params  # noqa: E402
from gptq_tpu.models.common import fuse_serving  # noqa: E402
from gptq_tpu.ops.kernel_bench import chained_seconds as _cs  # noqa: E402


def chained_seconds(fn, x, *a, iters=64, reps=3, label=""):
    """chained_seconds with a diagnostic: warn when the diff clamps to 0
    (chain too short for the relay's dispatch noise)."""
    t = _cs(fn, x, *a, iters=iters, reps=reps)
    if t <= 2e-9:
        print(f"  [warn] {label}: diff clamped to 0 at iters={iters} — "
              f"retrying with 4x chain")
        t = _cs(fn, x, *a, iters=4 * iters, reps=reps)
    return t

ap = argparse.ArgumentParser()
ap.add_argument("--batch", type=int, default=32)
ap.add_argument("--seq", type=int, default=256)
ap.add_argument("--full_model", action="store_true",
                help="also run the full-model b-step measurement")
args = ap.parse_args()

B, S = args.batch, args.seq
spec = llama7b_spec()
H, hd, D, F = spec.n_heads, spec.hd, spec.hidden, spec.ffn
key = jax.random.PRNGKey(0)

# one layer's fused serving weights (synthetic, real packed format)
import dataclasses  # noqa: E402

spec1 = dataclasses.replace(spec, n_layers=1)
params1 = fuse_serving(spec1, synth_packed_params(spec1, bits=4), a8=True)
lp = params1["layers"][0]
qkv, o_w = lp["qkv_fused"]["w"], lp["o"]["w"]
gu, dn = lp["gateup_fused"]["w"], lp["down"]["w"]
w1 = lp["ln1"]["w"]
w2 = lp["ln2"]["w"]

x = jax.random.normal(key, (B, D), jnp.float32) * 0.1
print(f"== b={B} S={S} llama-7B fused-a8 component times ==")

from gptq_tpu.ops.ffn import attn_mlp_fused, norm_qkv_fused  # noqa: E402

t_qkv = chained_seconds(
    lambda c: norm_qkv_fused(c, w1, qkv, a8=True), x, iters=256,
    label="qkv")
print(f"norm_qkv_fused     M={B}: {t_qkv*1e6:8.1f} us")

attn_in = jax.random.normal(jax.random.fold_in(key, 1), (B, D),
                            jnp.float32) * 0.1
t_mlp = chained_seconds(
    lambda c: attn_mlp_fused(c, attn_in, w2, o_w, gu, dn, a8=True),
    x, iters=128, label="mlp")
print(f"attn_mlp_fused     M={B}: {t_mlp*1e6:8.1f} us")

# --- attention variants over the (B, S, H, hd) cache ---
kc = jax.random.normal(jax.random.fold_in(key, 2), (B, S, H, hd),
                       jnp.bfloat16)
vc = jax.random.normal(jax.random.fold_in(key, 3), (B, S, H, hd),
                       jnp.bfloat16)
q3 = jax.random.normal(jax.random.fold_in(key, 4), (B, H, hd), jnp.float32)
lens = jnp.full((B,), S - 1, jnp.int32)


def einsum_attn(q, k, v):
    # the model's XLA decode-attention path (models/common.attention with
    # T=1): f32 scores over the whole cache + additive length mask
    qf = q[:, None].astype(jnp.float32) * spec.scale  # (B,1,H,hd)
    sc = jnp.einsum("bthd,bshd->bhts", qf, k.astype(jnp.float32))
    mask = jnp.where(jnp.arange(S)[None, :] < lens[:, None], 0.0, -1e9)
    sc = sc + mask[:, None, None, :]
    p = jax.nn.softmax(sc, axis=-1)
    out = jnp.einsum("bhts,bshd->bthd", p, v.astype(jnp.float32))
    return out[:, 0]


t_attn_xla = chained_seconds(lambda c: einsum_attn(c, kc, vc), q3,
                             iters=128, label="attn-xla")
print(f"attention einsum bf16 : {t_attn_xla*1e6:8.1f} us")

from gptq_tpu.ops.attention import decode_attention  # noqa: E402

t_attn_k = chained_seconds(
    lambda c: decode_attention(c, kc, vc, lens, spec.scale), q3,
    iters=128, label="attn-kernel")
print(f"attention kernel bf16 : {t_attn_k*1e6:8.1f} us")

kc8 = (kc.astype(jnp.float32) * 20).astype(jnp.int8)
vc8 = (vc.astype(jnp.float32) * 20).astype(jnp.int8)
ks = jnp.abs(jax.random.normal(jax.random.fold_in(key, 5), (B, S, H))) * .05
t_attn_i8 = chained_seconds(
    lambda c: decode_attention(c, kc8, vc8, lens, spec.scale,
                               k_scale=ks, v_scale=ks), q3, iters=128, label="attn-int8")
print(f"attention kernel int8 : {t_attn_i8*1e6:8.1f} us")

# --- cache write-back chain: the carried (L,B,S,H,hd) update ---
L = spec.n_layers


def time_cache_updates(dtype):
    k0 = jnp.zeros((L, B, S, H, hd), dtype)
    v0 = jnp.zeros((L, B, S, H, hd), dtype)
    fresh = jnp.ones((B, 1, H, hd), jnp.float32)

    def make(length):
        @jax.jit
        def run(k, v):
            def body(carry, _):
                k, v, t = carry
                for i in range(L):
                    ki = jax.lax.dynamic_update_slice(
                        k[i], fresh.astype(k.dtype), (0, t, 0, 0))
                    vi = jax.lax.dynamic_update_slice(
                        v[i], fresh.astype(v.dtype), (0, t, 0, 0))
                    k = jax.lax.dynamic_update_index_in_dim(k, ki, i, 0)
                    v = jax.lax.dynamic_update_index_in_dim(v, vi, i, 0)
                return (k, v, (t + 1) % S), None

            (k, v, _), _ = jax.lax.scan(
                body, (k, v, jnp.zeros((), jnp.int32)), None, length=length)
            return k[0, 0, 0, 0, 0]

        return run

    short, long = make(16), make(48)

    def t(run):
        out = run(k0, v0)
        float(np.asarray(out))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(k0, v0)
            float(np.asarray(out))
            best = min(best, time.perf_counter() - t0)
        return best

    return (t(long) - t(short)) / 32.0


t_cache = time_cache_updates(jnp.bfloat16)
print(f"cache write-back (32L, bf16): {t_cache*1e6:8.1f} us/step")

# --- head (8-bit packed) ---
from gptq_tpu.pipeline import quantize_lm_head  # noqa: E402

quantize_lm_head(spec1, params1, bits=8)
hw = params1["lm_head"]["w"]
fw = params1["final_ln"]["w"]
t_head = chained_seconds(
    lambda c: norm_qkv_fused(c, fw, hw, a8=True)[:, :1] * 1e-6 + c[:, :1],
    x, iters=64, label="head")
print(f"head 8-bit M={B}      : {t_head*1e6:8.1f} us")

per_layer = t_qkv + t_mlp + t_attn_xla
total = 32 * per_layer + t_head + 32 * 0  # cache chain printed separately
print(f"\nsum-of-parts: 32 x (qkv {t_qkv*1e3:.3f} + mlp {t_mlp*1e3:.3f} + "
      f"attn {t_attn_xla*1e3:.3f}) + head {t_head*1e3:.3f} "
      f"= {total*1e3:.2f} ms/step (+ cache chain {t_cache*1e3:.2f})")

if args.full_model:
    params = synth_packed_params(spec, bits=4)
    quantize_lm_head(spec, params, bits=8)
    t_step = measure_decode(spec, params, a8=True, batch=B, n_tokens=48,
                            reps=3, max_len=S)
    print(f"full model measured: {t_step*1e3:.2f} ms/step "
          f"({B/t_step:.0f} tok/s)")
print("DONE")
