"""Chip probes: (1) int8-KV attention kernel compile check, (2) int4 MXU
dot support — if the MXU ingests int4 codes natively, weight-side ingest
halves vs int8 codes (the current matvec bottleneck).

Run alone: PYTHONPATH=... python -u experiments/r2_int4_probe.py
"""

import numpy as np
import jax
import jax.numpy as jnp


def probe_attention_kernel():
    from gptq_tpu.ops.attention import decode_attention_int8

    B, H, hd, S = 1, 32, 128, 1024
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, H, hd), jnp.float32)
    k = jax.random.randint(key, (B, S, H, hd), -127, 128, jnp.int8)
    v = jax.random.randint(key, (B, S, H, hd), -127, 128, jnp.int8)
    ks = jnp.abs(jax.random.normal(key, (B, S, H))) * 0.01 + 1e-3
    vs = jnp.abs(jax.random.normal(key, (B, S, H))) * 0.01 + 1e-3
    try:
        out = decode_attention_int8(q, k, v, ks, vs, jnp.asarray(600), 0.088)
        out.block_until_ready()
        # correctness vs materialized
        kf = k.astype(jnp.float32) * ks[..., None]
        vf = v.astype(jnp.float32) * vs[..., None]
        sc = jnp.einsum("bhd,bshd->bhs", q, kf) * 0.088
        sc = jnp.where(jnp.arange(S)[None, None, :] < 600, sc, -1e9)
        p = jax.nn.softmax(sc, axis=-1)
        want = jnp.einsum("bhs,bshd->bhd", p, vf)
        err = float(jnp.max(jnp.abs(out - want)) / (jnp.max(jnp.abs(want)) + 1e-9))
        print(f"attention kernel: COMPILES on chip, rel err {err:.4f}",
              flush=True)
        from gptq_tpu.ops.kernel_bench import chained_seconds

        t = chained_seconds(
            lambda qq: decode_attention_int8(qq, k, v, ks, vs,
                                             jnp.asarray(1000), 0.088), q,
            iters=48)
        # materialized reference path timing
        def mat(qq):
            kf = k.astype(jnp.float32) * ks[..., None]
            vf = v.astype(jnp.float32) * vs[..., None]
            sc = jnp.einsum("bhd,bshd->bhs", qq, kf) * 0.088
            sc = jnp.where(jnp.arange(S)[None, None, :] < 1000, sc, -1e9)
            p = jax.nn.softmax(sc, axis=-1)
            return jnp.einsum("bhs,bshd->bhd", p, vf)

        t2 = chained_seconds(mat, q, iters=48)
        print(f"attention kernel: {t*1e6:.1f} us vs materialized {t2*1e6:.1f}"
              f" us (S={S})", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"attention kernel FAIL: {type(e).__name__}: {e}"[:300],
              flush=True)


def probe_int4_xla():
    """Does XLA lower an int4-weight dot on this chip, and how fast?"""
    key = jax.random.PRNGKey(1)
    K = N = 4096
    w8 = jax.random.randint(key, (K, N), -7, 8, jnp.int8)
    x8 = jax.random.randint(key, (8, K), -127, 128, jnp.int8)
    xb = jax.random.normal(key, (8, K), jnp.bfloat16)
    cases = {
        "int4w_int8x": lambda: jnp.dot(x8, w8.astype(jnp.int4),
                                       preferred_element_type=jnp.int32),
        "int4w_int4x": lambda: jnp.dot(x8.astype(jnp.int4),
                                       w8.astype(jnp.int4),
                                       preferred_element_type=jnp.int32),
        "int4w_bf16x": lambda: jnp.dot(xb, w8.astype(jnp.int4),
                                       preferred_element_type=jnp.float32),
        "int8w_int8x": lambda: jnp.dot(x8, w8,
                                       preferred_element_type=jnp.int32),
    }
    from gptq_tpu.ops.kernel_bench import chained_seconds

    for name, fn in cases.items():
        try:
            f = jax.jit(lambda x, fn=fn: fn() + x[0, 0])
            out = f(x8)
            out.block_until_ready()
            t = chained_seconds(lambda c, fn=fn: fn() + 0 * c.astype(jnp.int32),
                                x8[:, :128].astype(jnp.int32), iters=32)
            print(f"XLA {name}: ok, {t*1e6:.1f} us per dot", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"XLA {name}: FAIL {type(e).__name__}: {e}"[:200],
                  flush=True)


def probe_int4_pallas():
    """Can a Pallas kernel build int4 operands from packed words and dot
    them on the MXU?"""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K, N = 2048, 2048
    key = jax.random.PRNGKey(2)
    words = jax.random.randint(key, (K // 8, N), -2**31, 2**31 - 1, jnp.int32)
    x = jax.random.randint(key, (8, K), -127, 128, jnp.int8)

    def k_bitcast(w_ref, x_ref, o_ref):
        c4 = pltpu.bitcast(w_ref[:], jnp.int4)  # (K/8, N) int32 -> int4?
        o_ref[:] = jax.lax.dot_general(
            x_ref[:], c4.reshape(K, N), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    def k_astype(w_ref, x_ref, o_ref):
        c8 = pltpu.bitcast(w_ref[:] & 0x0f0f0f0f, jnp.int8)  # low nibbles
        c4 = c8.astype(jnp.int4)
        o_ref[:] = jax.lax.dot_general(
            x_ref[:], c4[: K // 2].reshape(K // 2 * 2, N // 2 * 1)[:K // 2],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    for name, kern, oshape in (
            ("bitcast_int4_dot", k_bitcast, (8, N)),
    ):
        try:
            out = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct(oshape, jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(words, x)
            out.block_until_ready()
            print(f"pallas {name}: ok", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"pallas {name}: FAIL {type(e).__name__}: {e}"[:300],
                  flush=True)


if __name__ == "__main__":
    probe_attention_kernel()
    probe_int4_xla()
    probe_int4_pallas()
