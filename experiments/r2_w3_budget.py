"""(1) Tune + measure the 3-bit full model (the reference's headline is its
3-bit kernel: README.md:22,105); (2) decode cost budget: head cost and
per-layer cost with tuned tiles; (3) int8-KV fused attention on chip.

Run alone on the chip.
"""

import dataclasses
import sys

import jax
import jax.numpy as jnp
import numpy as np

import bench
from gptq_tpu.models.common import KVCache, fuse_serving, model_forward
from gptq_tpu.ops.autotune import tune_model


def measure(spec, params, a8=True, **kw):
    return bench.measure_decode(spec, params, a8=a8, **kw)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    spec = bench.llama7b_spec()

    if which in ("all", "w3"):
        p3 = bench.synth_packed_params(spec, bits=3)
        fused = fuse_serving(spec, p3)
        tune_model(fused, M=8, act="int8", budget_s=1500.0)
        del fused
        t3 = bench._retry(lambda: measure(spec, p3))
        print(f"w3a8 tuned: {t3*1e3:.3f} ms/token ({1/t3:.1f} tok/s)",
              flush=True)
        from gptq_tpu.pipeline import quantize_lm_head

        quantize_lm_head(spec, p3, bits=8)
        t3h = bench._retry(lambda: measure(spec, p3))
        print(f"w3a8 + head8: {t3h*1e3:.3f} ms/token ({1/t3h:.1f} tok/s)",
              flush=True)
        del p3

    if which in ("all", "budget"):
        p4 = bench.synth_packed_params(spec, bits=4)
        from gptq_tpu.pipeline import quantize_lm_head

        quantize_lm_head(spec, p4, bits=8)
        t_full = bench._retry(lambda: measure(spec, p4))
        half = dataclasses.replace(spec, n_layers=16)
        p4h = {**p4, "layers": p4["layers"][:16]}
        t_half = bench._retry(lambda: measure(half, p4h))
        per_layer = (t_full - t_half) / 16
        print(f"budget: full {t_full*1e3:.3f} ms, 16-layer {t_half*1e3:.3f}"
              f" ms -> per-layer {per_layer*1e6:.1f} us, "
              f"non-layer {1e3*(t_full - 32*per_layer):.3f} ms", flush=True)

    if which in ("all", "attn"):
        from gptq_tpu.ops.attention import decode_attention_int8
        from gptq_tpu.ops.kernel_bench import chained_seconds

        B, H, hd, S = 1, 32, 128, 2048
        key = jax.random.PRNGKey(0)
        q = jax.random.normal(key, (B, H, hd), jnp.float32)
        k = jax.random.randint(key, (B, S, H, hd), -127, 128, jnp.int8)
        v = jax.random.randint(key, (B, S, H, hd), -127, 128, jnp.int8)
        ks = jnp.abs(jax.random.normal(key, (B, S, H))) * 0.01 + 1e-3
        vs = jnp.abs(jax.random.normal(key, (B, S, H))) * 0.01 + 1e-3
        try:
            out = decode_attention_int8(q, k, v, ks, vs, jnp.asarray(1500),
                                        0.088)
            out.block_until_ready()
            kf = k.astype(jnp.float32) * ks[..., None]
            vf = v.astype(jnp.float32) * vs[..., None]
            sc = jnp.einsum("bhd,bshd->bhs", q, kf) * 0.088
            sc = jnp.where(jnp.arange(S)[None, None, :] < 1500, sc, -1e9)
            p = jax.nn.softmax(sc, axis=-1)
            want = jnp.einsum("bhs,bshd->bhd", p, vf)
            err = float(jnp.max(jnp.abs(out - want))
                        / (jnp.max(jnp.abs(want)) + 1e-9))
            t = chained_seconds(
                lambda qq: decode_attention_int8(
                    qq, k, v, ks, vs, jnp.asarray(1500), 0.088), q, iters=48)

            def mat(qq):
                kf = k.astype(jnp.float32) * ks[..., None]
                vf = v.astype(jnp.float32) * vs[..., None]
                sc = jnp.einsum("bhd,bshd->bhs", qq, kf) * 0.088
                sc = jnp.where(jnp.arange(S)[None, None, :] < 1500, sc, -1e9)
                p = jax.nn.softmax(sc, axis=-1)
                return jnp.einsum("bhs,bshd->bhd", p, vf)

            t2 = chained_seconds(mat, q, iters=48)
            # bf16 cache baseline
            kb = (k.astype(jnp.float32) * ks[..., None]).astype(jnp.bfloat16)
            vb = (v.astype(jnp.float32) * vs[..., None]).astype(jnp.bfloat16)

            def bf16_attn(qq):
                sc = jnp.einsum("bhd,bshd->bhs", qq,
                                kb.astype(jnp.float32)) * 0.088
                sc = jnp.where(jnp.arange(S)[None, None, :] < 1500, sc, -1e9)
                p = jax.nn.softmax(sc, axis=-1)
                return jnp.einsum("bhs,bshd->bhd", p, vb.astype(jnp.float32))

            t3 = chained_seconds(bf16_attn, q, iters=48)
            print(f"attn kernel S=2048: rel_err {err:.4f}; kernel "
                  f"{t*1e6:.1f} us, int8-materialized {t2*1e6:.1f} us, "
                  f"bf16-cache {t3*1e6:.1f} us", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"attn kernel FAIL: {type(e).__name__}: {e}"[:400],
                  flush=True)


if __name__ == "__main__":
    main()
