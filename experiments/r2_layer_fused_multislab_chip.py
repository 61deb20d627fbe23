"""Chip numerics for the fixed 3-slot slab rotation in the single-launch
decode-layer kernel (ops/layer_fused.py): S=2048 -> 4+ S-blocks, so the
slab b+2 prefetch rotates through a third buffer instead of overwriting
the slot slab b is being read from. Compares against the unfused XLA
dequant-matmul oracle on the chip itself."""
import numpy as np
import jax
import jax.numpy as jnp

from gptq_tpu.models.common import apply_rope
from gptq_tpu.ops.kernel_bench import make_random_packed, chained_seconds
from gptq_tpu.ops.layer_fused import decode_layer_fused, layer_fusable
from gptq_tpu.ops.pack import fuse_packed
from gptq_tpu.ops.qmatmul import dequant_matmul

H, nh, nkv, F, S = 1024, 8, 8, 2816, 2048
hd = H // nh
kvw = nkv * hd
key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 7)
q = make_random_packed(ks[0], H, H, 4, -1)
k = make_random_packed(ks[1], H, kvw, 4, -1)
v = make_random_packed(ks[2], H, kvw, 4, -1)
o = make_random_packed(ks[3], H, H, 4, -1)
gate = make_random_packed(ks[4], H, F, 4, -1)
up = make_random_packed(ks[5], H, F, 4, -1)
dn = make_random_packed(ks[6], F, H, 4, -1)
qkv = fuse_packed([q, k, v])
gu = fuse_packed([gate, up])
L = dict(q=q, k=k, v=v, o=o, gate=gate, up=up, dn=dn)


class _S:
    parts = ((H, H), (kvw, kvw), (kvw, kvw))


assert layer_fusable(qkv, _S, o, gu, dn, H, nh, nkv)

rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(1, 1, H)) * 0.5, jnp.bfloat16)
length = 1100  # spans slabs 0-2: data must survive the rotation
ck = jnp.asarray(rng.normal(size=(1, S, nkv, hd)), jnp.bfloat16)
cv = jnp.asarray(rng.normal(size=(1, S, nkv, hd)), jnp.bfloat16)
poison = jnp.full((1, S - length - 1, nkv, hd), 37.0, jnp.bfloat16)
ck = ck.at[:, length + 1:].set(poison)
cv = cv.at[:, length + 1:].set(poison)
pos = jnp.asarray([[length]])


class _Spec:
    rope_theta = 10000.0


_Spec.hd = hd
from gptq_tpu.models.common import rope_tables  # noqa: E402

cos, sin = rope_tables(_Spec, pos)
w1 = jnp.ones((H,), jnp.float32)


def _rms(t, w):
    t = t.astype(jnp.float32)
    var = jnp.mean(t * t, axis=-1, keepdims=True)
    return (t * jax.lax.rsqrt(var + 1e-5) * w[None, None]
            ).astype(jnp.bfloat16).astype(jnp.float32)


@jax.jit
def oracle():
    h1 = _rms(x, w1).astype(jnp.bfloat16)
    qr = dequant_matmul(h1, L["q"], impl="xla", a8=True)
    kr = dequant_matmul(h1, L["k"], impl="xla", a8=True)
    vr = dequant_matmul(h1, L["v"], impl="xla", a8=True)
    qr = apply_rope(qr.reshape(1, 1, nh, hd).astype(jnp.float32), cos, sin)
    kr = apply_rope(kr.reshape(1, 1, nkv, hd).astype(jnp.float32), cos, sin)
    vr = vr.reshape(1, 1, nkv, hd).astype(jnp.float32)
    ck2 = jax.lax.dynamic_update_slice(ck, kr.astype(ck.dtype),
                                       (0, length, 0, 0))
    cv2 = jax.lax.dynamic_update_slice(cv, vr.astype(cv.dtype),
                                       (0, length, 0, 0))
    sc = jnp.einsum("bthd,bshd->bhts", qr * (hd ** -0.5),
                    ck2.astype(jnp.float32))
    mask = jnp.where(jnp.arange(S) <= length, 0.0, -1e9)[None, None, None]
    p = jax.nn.softmax(sc + mask, axis=-1)
    attn = jnp.einsum("bhts,bshd->bthd", p,
                      cv2.astype(jnp.float32)).reshape(1, 1, nh * hd)
    ao = dequant_matmul(attn.astype(jnp.bfloat16), L["o"], impl="xla",
                        a8=True)
    r2 = (x.astype(jnp.float32) + ao.astype(jnp.float32)
          ).astype(jnp.bfloat16).astype(jnp.float32)
    m = _rms(r2, w1).astype(jnp.bfloat16)
    g = dequant_matmul(m, L["gate"], impl="xla", a8=True)
    u = dequant_matmul(m, L["up"], impl="xla", a8=True)
    inner = (jax.nn.silu(g.astype(jnp.float32)) * u.astype(jnp.float32)
             ).astype(jnp.bfloat16)
    d = dequant_matmul(inner, L["dn"], impl="xla", a8=True)
    return r2 + d.astype(jnp.float32)


print("compiling oracle...", flush=True)
want = np.asarray(oracle(), np.float32)
print("oracle done; compiling kernel...", flush=True)
got, ck2, cv2 = decode_layer_fused(
    x, ck, cv, jnp.asarray(length), cos, sin, w1, w1, qkv, o, gu, dn,
    n_heads=nh, n_kv_heads=nkv, sm_scale=hd ** -0.5, a8=True)
got = np.asarray(got, np.float32)
rel = np.abs(got - want).max() / np.abs(want).max()
print(f"S={S} n_sb=4 (3-slot rotation): rel err {rel:.2e}")
assert rel < 0.05, rel

t = chained_seconds(
    lambda h: decode_layer_fused(
        h, ck, cv, jnp.asarray(length), cos, sin, w1, w1, qkv, o, gu, dn,
        n_heads=nh, n_kv_heads=nkv, sm_scale=hd ** -0.5, a8=True)[0], x)
print(f"decode_layer_fused {t*1e6:.1f} us/launch", flush=True)
