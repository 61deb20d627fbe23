"""Determine pltpu.bitcast int32->int8 row ordering on TPU vs interpret."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel(w_ref, out_ref):
    out_ref[:] = pltpu.bitcast(w_ref[:], jnp.int8)


def probe(interpret):
    rows, cols = 8, 128
    # word[i, n] = bytes (little endian) b0=4i, b1=4i+1, b2=4i+2, b3=4i+3
    base = (4 * np.arange(rows, dtype=np.int64))[:, None] * np.ones(
        (1, cols), np.int64)
    w = (base + (base + 1) * 2**8 + (base + 2) * 2**16 + (base + 3) * 2**24)
    w = jnp.asarray(w.astype(np.uint32).astype(np.int64).astype(np.int32) if False else w.astype(np.int64).astype(np.uint32).view(np.int32) if False else (w % (2**32)).astype(np.uint32).astype(np.int64))
    w = jnp.asarray(np.asarray(w, np.int64).astype(np.uint32).view(np.int32))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows * 4, cols), jnp.int8),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(w)
    col0 = np.asarray(out)[:, 0].astype(np.int32) % 256
    return col0


if jax.default_backend() == "tpu":
    print("tpu      :", probe(False).tolist())
print("interpret:", probe(True).tolist())
