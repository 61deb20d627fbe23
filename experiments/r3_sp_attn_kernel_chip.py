"""Chip compile-check + A/B of decode_attention_partial (round 3):
1) kernel vs jnp oracle at llama-7B sp-shard shapes (int8 slabs),
2) chained timing kernel vs inline-jnp dequant attention,
3) the sp shard_map decode body (sp=1 mesh on the one chip) end-to-end.
Run: PYTHONPATH=/root/repo:/root/.axon_site /opt/venv/bin/python experiments/r3_sp_attn_kernel_chip.py
"""
import numpy as np
import jax
import jax.numpy as jnp

from gptq_tpu.ops.attention import decode_attention_partial
from gptq_tpu.ops.kernel_bench import chained_seconds

B, H, hd = 1, 32, 128
Hkv = 32
S = 512  # per-shard slots (max_len 2048 / sp 4)
rng = np.random.default_rng(0)
q = jnp.asarray(rng.normal(size=(B, H, hd)), jnp.float32)
k = jnp.asarray(rng.integers(-127, 128, size=(B, S, Hkv, hd)), jnp.int8)
v = jnp.asarray(rng.integers(-127, 128, size=(B, S, Hkv, hd)), jnp.int8)
ks = jnp.asarray(rng.random((B, S, Hkv)) * 0.01 + 1e-3, jnp.float32)
vs = jnp.asarray(rng.random((B, S, Hkv)) * 0.01 + 1e-3, jnp.float32)
pos = np.arange(S, dtype=np.int32)
pos[::7] = -1  # gaps
pos = jnp.asarray(pos)
sm = 1.0 / np.sqrt(hd)

m, l, acc = jax.block_until_ready(
    decode_attention_partial(q, k, v, pos, float(sm), k_scale=ks, v_scale=vs))
got = np.asarray(acc) / np.asarray(l)[..., None]

# jnp oracle (the sp.py inline path)
kf = np.asarray(k, np.float32) * np.asarray(ks)[..., None]
vf = np.asarray(v, np.float32) * np.asarray(vs)[..., None]
sc = np.einsum("bhd,bshd->bhs", np.asarray(q) * sm, kf)
sc[:, :, np.asarray(pos) < 0] = -np.inf
p = np.exp(sc - sc.max(-1, keepdims=True))
p[:, :, np.asarray(pos) < 0] = 0
want = np.einsum("bhs,bshd->bhd", p / p.sum(-1, keepdims=True), vf)
rel = np.abs(got - want).max() / np.abs(want).max()
print(f"kernel vs oracle rel err: {rel:.2e}")
assert rel < 2e-2, rel

# chained timing: kernel vs jnp inline dequant path
def run_kernel(x):
    m, l, a = decode_attention_partial(x, k, v, pos, float(sm),
                                       k_scale=ks, v_scale=vs)
    return a[..., :hd] * 1e-3 + x  # feed forward

def run_jnp(x):
    kd = k.astype(jnp.float32) * ks[..., None]
    vd = v.astype(jnp.float32) * vs[..., None]
    s2 = jnp.einsum("bhd,bshd->bhs", x * sm, kd)
    s2 = jnp.where((pos >= 0)[None, None], s2, -jnp.inf)
    mm = jnp.max(s2, axis=-1, keepdims=True)
    pp = jnp.where((pos >= 0)[None, None], jnp.exp(s2 - mm), 0.0)
    a = jnp.einsum("bhs,bshd->bhd", pp, vd) / jnp.sum(pp, -1, keepdims=True)
    return a * 1e-3 + x

for name, fn in [("kernel", run_kernel), ("jnp", run_jnp)]:
    t = chained_seconds(fn, q)
    print(f"{name}: {t*1e6:.1f} us/iter")

# sp shard_map body on the chip (sp=1)
from gptq_tpu.models.common import ArchSpec, init_params
from gptq_tpu.parallel.sp import make_sp_cache_prefill, make_sp_decode_step, make_sp_mesh

spec = ArchSpec(arch="llama", n_layers=2, hidden=256, n_heads=4, n_kv_heads=2,
                ffn=512, vocab=128, max_pos=256, act="silu", pos="rope",
                norm_type="rmsnorm", linear_bias=False, tie_embeddings=False)
params = init_params(spec, jax.random.PRNGKey(0), jnp.bfloat16)
mesh = make_sp_mesh(1)
prefill = make_sp_cache_prefill(spec, params, mesh, cache_dtype=jnp.int8,
                                max_len=256)
ids = jnp.asarray(rng.integers(0, spec.vocab, size=(1, 8)))
logits, cache = prefill(ids)
step = make_sp_decode_step(spec, params, mesh, cache.meta, int8_cache=True)
for t in range(3):
    logits, cache = step(cache, jnp.asarray([[t + 1]]))
jax.block_until_ready(logits)
print("sp shard_map decode body with kernel: OK,", np.asarray(logits).shape)
print("PASS")
