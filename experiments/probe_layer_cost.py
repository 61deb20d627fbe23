"""Decompose decode cost: per-layer vs fixed (embed/lm_head/sampling), and
try a mixed int8 x bf16 dot inside the kernel."""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from bench import llama7b_spec, synth_packed_params, measure_decode

spec32 = llama7b_spec()
spec16 = dataclasses.replace(spec32, n_layers=16)

p32 = synth_packed_params(spec32, bits=4)
t32 = measure_decode(spec32, p32, n_tokens=64)
p16 = {k: (v[:16] if k == "layers" else v) for k, v in p32.items()}
t16 = measure_decode(spec16, p16, n_tokens=64)
del p32, p16
per_layer = (t32 - t16) / 16
fixed = t32 - 32 * per_layer
print(f"32L: {t32*1e3:.3f} ms  16L: {t16*1e3:.3f} ms")
print(f"per-layer: {per_layer*1e6:.1f} us   fixed (embed+head+argmax): {fixed*1e3:.3f} ms")
# layer bytes: 4*h*h/2 + 3*h*f/2 at padded f
h, f = 4096, 11264
nbytes = 4 * h * h // 2 + 3 * h * f // 2
print(f"layer weight bytes {nbytes/1e6:.1f} MB -> effective {nbytes/per_layer/1e9:.1f} GB/s")
