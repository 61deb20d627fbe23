"""attn_mlp_fused chunk tuning: the down phase (Kp=11264, words 1408 rows)
is forced to nc=256 by the 2.5MB word-block budget; qkv at nc=512 hits
800 GB/s while attn_mlp measures ~575. Force per-phase nc combos and
re-measure (2 reps each to reject chip garbage)."""
import numpy as np
import jax
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
w_ln = jnp.ones((H,), jnp.float32)
o = mk(H, H)
gu = fuse_packed([mk(H, F), mk(H, F)])
dn = mk(F, H)
mb = sum(sum(w.nbytes for w in p.words) for p in (o, gu, dn)) / 1e6

orig = ffn._mm_specs
# force nc by K: o has K=4096 N=4096, gu K=4096 N=22528, dn K=11264 N=4096
for label, force in [
    ("default", {}),
    ("dn512", {11264: 512}),
    ("all512", {4096: 512, 11264: 512}),
    ("gu1024-dn512", {(4096, 22528): 1024, 11264: 512}),
]:
    def specs(pw, force=force):
        s = orig(pw)
        nc = force.get((pw.Kp, pw.Np), force.get(pw.Kp))
        return s._replace(nc=nc) if nc and pw.Np % nc == 0 else s

    ffn._mm_specs = specs
    jax.clear_caches()
    ts = []
    for _ in range(2):
        ts.append(chained_seconds(
            lambda h: ffn.attn_mlp_fused(h, x, w_ln, o, gu, dn, act="silu",
                                         norm="rmsnorm", glu=True, a8=True),
            x))
    t = min(ts)
    print(f"{label}: {t*1e6:.1f} us ({mb/1e3/t:.0f} GB/s)  reps "
          f"{[round(v*1e6,1) for v in ts]}", flush=True)
ffn._mm_specs = orig
