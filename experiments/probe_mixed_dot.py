"""Can Mosaic do a mixed bf16 x int8 dot without an explicit convert?"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, K, N = 8, 1024, 512


def kern_mixed(x_ref, w_ref, o_ref):
    o_ref[:] = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)


def kern_convert(x_ref, w_ref, o_ref):
    o_ref[:] = jnp.dot(x_ref[:], w_ref[:].astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)


key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (M, K), jnp.bfloat16)
w8 = jax.random.randint(key, (K, N), 0, 16, jnp.int8)

for name, kern in [("mixed bf16xint8", kern_mixed), ("convert-first", kern_convert)]:
    try:
        call = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        y = call(x, w8)
        ref = np.asarray(x, np.float32) @ np.asarray(w8, np.float32)
        err = np.abs(np.asarray(y) - ref).max() / np.abs(ref).max()
        print(f"{name}: ok, rel_err={err:.2e}")
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:150]}")
