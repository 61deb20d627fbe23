"""Corrected int4 probe: time XLA dots with int4 vs int8 weight operands
at serving shapes, and test in-kernel int8->int4 astype + dot."""

import numpy as np
import jax
import jax.numpy as jnp

from gptq_tpu.ops.kernel_bench import chained_seconds


def time_dots():
    key = jax.random.PRNGKey(1)
    for K, N in ((4096, 4096), (4096, 12288)):
        w8 = jax.random.randint(key, (K, N), -8, 8, jnp.int8)
        w4 = w8.astype(jnp.int4)
        wb = w8.astype(jnp.bfloat16)
        x8 = jax.random.randint(key, (8, K), -127, 128, jnp.int8)
        xb = jax.random.normal(key, (8, K), jnp.bfloat16)

        cases = {
            "bf16w_bf16x": (xb, wb, jnp.float32),
            "int8w_int8x": (x8, w8, jnp.int32),
            "int4w_int8x": (x8, w4, jnp.int32),
            "int4w_int4x": (x8.astype(jnp.int4), w4, jnp.int32),
            "int4w_bf16x": (xb, w4, jnp.float32),
        }
        for name, (x, w, pt) in cases.items():
            try:
                fn = lambda c, w=w, pt=pt: jnp.dot(
                    c, w, preferred_element_type=pt)
                t = chained_seconds(fn, x, iters=48)
                gb = K * N / t / 1e9
                print(f"{K}x{N} {name}: {t*1e6:7.1f} us "
                      f"({gb:6.0f} Gcodes/s)", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{K}x{N} {name}: FAIL {type(e).__name__}: {e}"[:160],
                      flush=True)


def pallas_int4():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K, N = 2048, 2048
    key = jax.random.PRNGKey(2)
    w8 = jax.random.randint(key, (K, N), -8, 8, jnp.int8)
    x8 = jax.random.randint(key, (8, K), -127, 128, jnp.int8)

    def k_astype(w_ref, x_ref, o_ref):
        c4 = w_ref[:].astype(jnp.int4)
        o_ref[:] = jax.lax.dot_general(
            x_ref[:], c4, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    def k_int4in(w_ref, x_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    for name, kern, warr in (("astype_int8to4_dot", k_astype, w8),
                             ("int4_operand_dot", k_int4in,
                              w8.astype(jnp.int4))):
        try:
            f = lambda x, warr=warr, kern=kern: pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((8, N), jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(warr, x)
            out = f(x8)
            out.block_until_ready()
            want = jnp.dot(x8.astype(jnp.int32), w8.astype(jnp.int32))
            ok = bool(jnp.all(out == want))
            t = chained_seconds(f, x8, iters=48)
            print(f"pallas {name}: ok correct={ok} {t*1e6:.1f} us", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"pallas {name}: FAIL {type(e).__name__}: {e}"[:300],
                  flush=True)


if __name__ == "__main__":
    time_dots()
    pallas_int4()
