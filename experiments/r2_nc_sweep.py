"""Chip sweep: N-chunk width (nc) for the streamed fused kernels at exact
llama-7B serving shapes (w4a8). _pick_chunk currently prefers 512; is a
wider/narrower chunk closer to the HBM floor?"""
import numpy as np
import jax.numpy as jnp

import gptq_tpu.ops.ffn as ffn
from gptq_tpu.ops.pack import pack_quantized, fuse_packed
from gptq_tpu.ops.kernel_bench import chained_seconds

rng = np.random.default_rng(0)


def mk(k, n, bits=4):
    w = rng.standard_normal((n, k), dtype=np.float32) * 0.05
    scale = np.abs(rng.standard_normal((1, n), np.float32)) * 0.02 + 0.01
    zero = np.full((1, n), float(2 ** (bits - 1)), np.float32)
    return pack_quantized(jnp.asarray(w), jnp.asarray(scale),
                          jnp.asarray(zero), bits=bits)


H, F = 4096, 11008
x = jnp.asarray(rng.standard_normal((1, 1, H), np.float32) * 0.5,
                jnp.bfloat16)
attn = x
w_ln = jnp.ones((H,), jnp.float32)
qkv = fuse_packed([mk(H, H)] * 3)
o = mk(H, H)
gu = fuse_packed([mk(H, F), mk(H, F)])
dn = mk(F, H)

qkv_mb = sum(w.nbytes for w in qkv.words) / 1e6
aml_mb = sum(sum(w.nbytes for w in p.words) for p in (o, gu, dn)) / 1e6

import jax

orig = ffn._pick_chunk
for prefer in (256, 512, 1024):
    ffn._pick_chunk = lambda N, p, prefer=prefer: orig(N, prefer)
    jax.clear_caches()  # nc is a trace-time constant, not a jit key
    t1 = chained_seconds(
        lambda h: ffn.norm_qkv_fused(h, w_ln, qkv, norm="rmsnorm", a8=True),
        x)
    t2 = chained_seconds(
        lambda h: ffn.attn_mlp_fused(h, x, w_ln, o, gu, dn, act="silu",
                                     norm="rmsnorm", glu=True, a8=True),
        attn)
    print(f"nc prefer={prefer}: qkv {t1*1e6:.1f} us "
          f"({qkv_mb/1e3/t1:.0f} GB/s), attn_mlp {t2*1e6:.1f} us "
          f"({aml_mb/1e3/t2:.0f} GB/s)")
ffn._pick_chunk = orig
