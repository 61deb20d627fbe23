"""Chip compile + numerics + latency for the single-launch decode-layer
kernel at llama-7B shapes, vs the 3-launch path it replaces
(norm_qkv_fused 31.5 + attention 18 + attn_mlp_fused 98.5 + glue ~6.5 +
inter-launch gaps; model-measured per-layer 170.5 us)."""
import numpy as np
import jax
import jax.numpy as jnp

from gptq_tpu.ops.kernel_bench import make_random_packed, chained_seconds
from gptq_tpu.ops.layer_fused import decode_layer_fused, layer_fusable
from gptq_tpu.ops.pack import fuse_packed

H, nh, F = 4096, 32, 11008
hd = H // nh
key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 7)
q = make_random_packed(ks[0], H, H, 4, -1)
k = make_random_packed(ks[1], H, H, 4, -1)
v = make_random_packed(ks[2], H, H, 4, -1)
o = make_random_packed(ks[3], H, H, 4, -1)
gate = make_random_packed(ks[4], H, F, 4, -1)
up = make_random_packed(ks[5], H, F, 4, -1)
dn = make_random_packed(ks[6], F, H, 4, -1)
qkv = fuse_packed([q, k, v])
gu = fuse_packed([gate, up])


class _S:
    parts = ((H, H), (H, H), (H, H))


assert layer_fusable(qkv, _S, o, gu, dn, H, nh, nh)

rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(1, 1, H)) * 0.5, jnp.bfloat16)
cos = jnp.asarray(rng.normal(size=(1, 1, hd)), jnp.float32)
sin = jnp.asarray(rng.normal(size=(1, 1, hd)), jnp.float32)
w1 = jnp.ones((H,), jnp.float32)

for S in (256, 2048):
    ck = jnp.asarray(rng.normal(size=(1, S, nh, hd)), jnp.bfloat16)
    cv = jnp.asarray(rng.normal(size=(1, S, nh, hd)), jnp.bfloat16)
    ln = jnp.asarray(S - 9)
    y, ck2, cv2 = decode_layer_fused(
        x, ck, cv, ln, cos, sin, w1, w1, qkv, o, gu, dn,
        n_heads=nh, n_kv_heads=nh, sm_scale=hd ** -0.5, a8=True)
    jax.block_until_ready((y, ck2, cv2))
    print(f"S={S}: compiles; |y| {float(jnp.abs(y).max()):.3f}")

    t = chained_seconds(
        lambda h, ck=ck, cv=cv, ln=ln: decode_layer_fused(
            h, ck, cv, ln, cos, sin, w1, w1, qkv, o, gu, dn,
            n_heads=nh, n_kv_heads=nh, sm_scale=hd ** -0.5, a8=True)[0], x)
    print(f"S={S}: decode_layer_fused {t*1e6:.1f} us/launch", flush=True)
