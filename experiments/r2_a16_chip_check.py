"""Chip compile + numerics check for the a16 (bf16-activation) mode of the
fused serving kernels (ffn_fused / attn_mlp_fused / norm_qkv_fused).

Mosaic can reject what CPU interpret mode accepts, so every new kernel
configuration must run once on the real chip. Also times a16 vs a8 decode
per-launch cost via chained differencing.
"""
import numpy as np
import jax
import jax.numpy as jnp

from gptq_tpu.ops.pack import pack_quantized
from gptq_tpu.ops.qmatmul import dequant_matmul
from gptq_tpu.ops.ffn import (ffn_fused, attn_mlp_fused, norm_qkv_fused)

rng = np.random.default_rng(0)


def mk(k, n, bits=4, g=-1):
    # pack_quantized wants Q (N, K) dequantized, scale/zero (ng, N)
    w = rng.standard_normal((n, k), dtype=np.float32) * 0.05
    ng = 1 if g == -1 else k // g
    scale = np.abs(rng.standard_normal((ng, n), np.float32)) * 0.02 + 0.01
    zero = np.full((ng, n), float(2 ** (bits - 1)), np.float32)
    return pack_quantized(jnp.asarray(w), jnp.asarray(scale),
                          jnp.asarray(zero), bits=bits, groupsize=g)


H, F = 2048, 5632
gu = mk(H, 2 * F)
dn = mk(F, H)
o = mk(H, H)
qkv = mk(H, 3 * H)
x = jnp.asarray(rng.standard_normal((1, 1, H), np.float32) * 0.5,
                jnp.bfloat16)
attn = jnp.asarray(rng.standard_normal((1, 1, H), np.float32) * 0.5,
                   jnp.bfloat16)
w_ln = jnp.ones((H,), jnp.float32)

for a8 in (False, True):
    tag = "a8" if a8 else "a16"
    y1 = ffn_fused(x, gu, dn, act="silu", a8=a8)
    y2 = attn_mlp_fused(attn, x, w_ln, o, gu, dn, act="silu",
                        norm="rmsnorm", glu=True, a8=a8)
    y3 = norm_qkv_fused(x, w_ln, qkv, norm="rmsnorm", a8=a8)
    jax.block_until_ready((y1, y2, y3))
    print(f"[{tag}] compiles ok; shapes", y1.shape, y2.shape, y3.shape)

# numerics vs the unfused xla path (a16 must be tight: same math)
g_half = dequant_matmul(x, gu, impl="xla")
inner = (jax.nn.silu(g_half[..., :F].astype(jnp.float32))
         * g_half[..., F:].astype(jnp.float32)).astype(jnp.bfloat16)
want = dequant_matmul(inner, dn, impl="xla").astype(jnp.float32)
got16 = np.asarray(ffn_fused(x, gu, dn, act="silu", a8=False), np.float32)
got8 = np.asarray(ffn_fused(x, gu, dn, act="silu", a8=True), np.float32)
den = float(np.abs(np.asarray(want)).max())
print("ffn a16 rel err:", float(np.abs(got16 - np.asarray(want)).max()) / den)
print("ffn a8  rel err:", float(np.abs(got8 - np.asarray(want)).max()) / den)

# latency: chained differencing (canonical protocol)
from gptq_tpu.ops.kernel_bench import chained_seconds

for a8 in (True, False):
    t = chained_seconds(
        lambda h, a8=a8: ffn_fused(h, gu, dn, act="silu", a8=a8), x)
    print(f"ffn_fused {'a8' if a8 else 'a16'}: {t * 1e6:.1f} us/launch")
for a8 in (True, False):
    t = chained_seconds(
        lambda h, a8=a8: attn_mlp_fused(h, x, w_ln, o, gu, dn, act="silu",
                                        norm="rmsnorm", glu=True, a8=a8),
        attn)
    print(f"attn_mlp_fused {'a8' if a8 else 'a16'}: {t * 1e6:.1f} us/launch")
