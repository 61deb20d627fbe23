"""Is the streamed fused FFN kernel bandwidth-bound at 3-bit? llama-7B
shapes, a8 and a16, 4-bit vs 3-bit per-launch time (chained protocol).
If 3-bit comes in ~25% faster, a 3-bit headline leg is worth adding."""
import numpy as np
import jax.numpy as jnp

from gptq_tpu.ops.pack import pack_quantized
from gptq_tpu.ops.ffn import ffn_fused, norm_qkv_fused
from gptq_tpu.ops.kernel_bench import chained_seconds

rng = np.random.default_rng(0)


def mk(k, n, bits, g=-1):
    w = rng.standard_normal((n, k), dtype=np.float32) * 0.05
    ng = 1 if g == -1 else k // g
    scale = np.abs(rng.standard_normal((ng, n), np.float32)) * 0.02 + 0.01
    zero = np.full((ng, n), float(2 ** (bits - 1)), np.float32)
    return pack_quantized(jnp.asarray(w), jnp.asarray(scale),
                          jnp.asarray(zero), bits=bits, groupsize=g)


H, F = 4096, 11008
x = jnp.asarray(rng.standard_normal((1, 1, H), np.float32) * 0.5,
                jnp.bfloat16)
w_ln = jnp.ones((H,), jnp.float32)

from gptq_tpu.ops.pack import fuse_packed
from gptq_tpu.ops.ffn import ffn_fusable

for bits in (4, 3):
    gu = fuse_packed([mk(H, F, bits), mk(H, F, bits)])
    dn = mk(F, H, bits)
    qkv = fuse_packed([mk(H, H, bits)] * 3)
    assert ffn_fusable(gu, dn), (gu.Np, dn.Kp)
    mb = (sum(w.nbytes for w in gu.words) + sum(w.nbytes for w in dn.words)
          + sum(w.nbytes for w in qkv.words)) / 1e6
    for a8 in (True,):
        t1 = chained_seconds(
            lambda h, a8=a8, gu=gu, dn=dn: ffn_fused(h, gu, dn, act="silu",
                                                     a8=a8), x)
        t2 = chained_seconds(
            lambda h, a8=a8, qkv=qkv: norm_qkv_fused(h, w_ln, qkv,
                                                     norm="rmsnorm", a8=a8),
            x)
        gbs = mb / 1e3 / (t1 + t2)
        print(f"w{bits}{'a8' if a8 else 'a16'}: ffn {t1*1e6:.1f} us, "
              f"qkv {t2*1e6:.1f} us  ({mb:.0f} MB streamed, "
              f"{gbs*1e3:.0f} GB/s eff)")
