"""Chip compile + numerics + latency check for the bf16-cache variant of
the decode-attention kernel (ops/attention.decode_attention), vs the XLA
einsum path it replaces. llama-7B decode shapes."""
import numpy as np
import jax
import jax.numpy as jnp

from gptq_tpu.ops.attention import decode_attention
from gptq_tpu.ops.kernel_bench import chained_seconds

rng = np.random.default_rng(0)
B, H, hd = 1, 32, 128
for S in (256, 2048):
    q = jnp.asarray(rng.normal(size=(B, H, hd)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, H, hd)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, S, H, hd)), jnp.bfloat16)
    length = S - 7
    sm = 1.0 / float(np.sqrt(hd))

    got = np.asarray(decode_attention(q, k, v, jnp.asarray(length), sm))

    kf = np.asarray(k, np.float32)[:, :length]
    vf = np.asarray(v, np.float32)[:, :length]
    sc = np.einsum("bhd,bshd->bhs", np.asarray(q), kf) * sm
    p = np.exp(sc - sc.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    want = np.einsum("bhs,bshd->bhd", p, vf)
    rel = np.abs(got - want).max() / np.abs(want).max()
    print(f"S={S}: rel err {rel:.2e}")

    t = chained_seconds(lambda qq: decode_attention(qq, k, v,
                                                    jnp.asarray(length), sm),
                        q)
    # XLA path for comparison
    mask = jnp.where(jnp.arange(S) < length, 0.0, -1e9)[None, None, None]

    @jax.jit
    def xla_attn(qq):
        sc = jnp.einsum("bhd,bshd->bhs", qq * sm, k.astype(jnp.float32))
        pr = jax.nn.softmax(sc[:, None] + mask, axis=-1)[:, 0]
        return jnp.einsum("bhs,bshd->bhd", pr, v.astype(jnp.float32))

    t2 = chained_seconds(xla_attn, q)
    print(f"S={S}: kernel {t * 1e6:.1f} us, xla-einsum {t2 * 1e6:.1f} us")
