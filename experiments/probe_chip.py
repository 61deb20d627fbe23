"""Characterize the chip: per-op floor, HBM bandwidth, MXU flops."""
import time

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 100


def timeit(run, *args):
    out = run(*args)
    float(np.asarray(out).ravel()[0])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(*args)
        float(np.asarray(out).ravel()[0])
        ts.append(time.perf_counter() - t0)
    return min(ts) / ITERS


def chain(f, feedback):
    @jax.jit
    def run(x, *ws):
        def body(c, _):
            return feedback(f(c, *ws)), None
        c, _ = jax.lax.scan(body, x, None, length=ITERS)
        return c
    return run


key = jax.random.PRNGKey(0)

# 1. tiny op floor
x = jnp.ones((8, 128), jnp.float32)
t = timeit(chain(lambda c: c + 1.0, lambda y: y * 0.0), x)
print(f"tiny add:                {t*1e6:8.1f} us")

# 2. big elementwise: 256 MB read+write
big = jax.random.normal(key, (128, 1024, 1024), jnp.bfloat16)
t = timeit(chain(lambda c: c * 1.000001, lambda y: y), big)
print(f"256MB mul:               {t*1e6:8.1f} us -> {2*big.size*2/t/1e9:7.1f} GB/s r+w")

# 3. matvec sweep: is time ~ bytes or ~ floor?
for K in (1024, 2048, 4096, 8192):
    w = jax.random.normal(key, (K, K), jnp.bfloat16) * 0.01
    xv = jax.random.normal(key, (8, K), jnp.bfloat16)
    t = timeit(chain(lambda c, w: jnp.dot(c, w), lambda y: y * 1e-6), xv, w)
    print(f"bf16 {K}^2 matvec:      {t*1e6:8.1f} us -> {K*K*2/t/1e9:7.1f} GB/s")

# 4. big matmul flops
M = 4096
a = jax.random.normal(key, (M, M), jnp.bfloat16)
b = jax.random.normal(key, (M, M), jnp.bfloat16)
t = timeit(chain(lambda c, b: jnp.dot(c, b, preferred_element_type=jnp.bfloat16),
                 lambda y: y * 1e-6), a, b)
print(f"bf16 {M}^3 matmul:      {t*1e6:8.1f} us -> {2*M**3/t/1e12:7.2f} TFLOP/s")

# 5. fused 7-matvec layer-shaped op (does fusing many matvecs amortize floor?)
h, f = 4096, 11008
ws = [jax.random.normal(jax.random.fold_in(key, i), s, jnp.bfloat16) * 0.01
      for i, s in enumerate([(h, h)] * 4 + [(h, f), (h, f), (f, h)])]
xv = jax.random.normal(key, (8, h), jnp.bfloat16)


def layer(c, *ws):
    q = jnp.dot(c, ws[0]); k = jnp.dot(c, ws[1]); v = jnp.dot(c, ws[2])
    o = jnp.dot(q + k + v, ws[3])
    g = jnp.dot(o, ws[4]); u = jnp.dot(o, ws[5])
    d = jnp.dot(jax.nn.silu(g) * u, ws[6])
    return d

t = timeit(chain(layer, lambda y: y * 1e-6), xv, *ws)
nbytes = sum(int(np.prod(w.shape)) for w in ws) * 2
print(f"7-matvec llama layer:    {t*1e6:8.1f} us -> {nbytes/t/1e9:7.1f} GB/s ({nbytes/1e6:.0f} MB)")
