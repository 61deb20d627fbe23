"""Round-2 perf probe: decode-layer cost decomposition + tile sweep.

Questions:
  1. Where do the 195-225 us/layer go? (4 fused matmuls vs the rest)
  2. Do full-width tn tiles (block = contiguous HBM region) beat the
     current strided (tk, 1024) blocks?
  3. What does 3-bit cost vs 4-bit at the serving shapes (the reference's
     3.25x headline is its 3-bit kernel)?

Run alone on the chip:  /opt/venv/bin/python experiments/r2_tile_sweep.py
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from gptq_tpu.ops.kernel_bench import chained_seconds, make_random_packed
from gptq_tpu.ops.qmatmul import _matmul_pallas, quantize_acts_int8

M = 8  # padded decode row count

# serving shapes after fusion + padding (llama-7B): (K, N_padded)
SHAPES = {
    "qkv": (4096, 12288),
    "o": (4096, 4096),
    "gateup": (4096, 22528),
    "down": (11264, 4096),
}


def sweep(bits=4, groupsize=-1, act="int8"):
    key = jax.random.PRNGKey(0)
    print(f"=== {bits}-bit g{groupsize} act={act} (M={M}) ===")
    total_best = 0.0
    total_def = 0.0
    for name, (K, N) in SHAPES.items():
        pw = make_random_packed(jax.random.fold_in(key, K + N), K, N, bits,
                                groupsize)
        if act == "int8":
            x = jax.random.randint(key, (M, K), -127, 128, jnp.int8)
        else:
            x = jax.random.normal(key, (M, K), jnp.bfloat16)
        nbytes = K * N * bits / 8
        cands = [(2048, 1024), (512, N), (1024, N), (2048, 2048), (1024, 2048)]
        if (K, 1024) not in cands:
            cands.append((K, 1024))
        results = {}
        for tk, tn in cands:
            if K % tk or N % tn:
                continue
            # VMEM guard: double-buffered words + x + out
            vmem = 2 * (tk // (32 // min(bits, 8))) * tn * 4 + M * K * 4 + 2 * M * tn * 4
            if bits == 3:
                vmem += 2 * (tk // 32) * tn * 4
            if vmem > 14e6:
                continue
            try:
                t = chained_seconds(
                    lambda c, tk=tk, tn=tn: _matmul_pallas(c, pw, tk, tn), x,
                    iters=48, reps=3)
            except Exception as e:  # noqa: BLE001
                print(f"  {name} {tk}x{tn}: FAIL {type(e).__name__}: {e}"[:160])
                continue
            gbps = nbytes / t / 1e9
            results[(tk, tn)] = t
            print(f"  {name:7s} tk{tk:5d} tn{tn:5d}: {t*1e6:7.1f} us "
                  f"{gbps:6.0f} GB/s")
        if results:
            best = min(results.values())
            total_best += best
            total_def += results.get((2048, 1024), best)
    print(f"  sum of best: {total_best*1e6:.1f} us; "
          f"default tiles: {total_def*1e6:.1f} us")
    return total_best


def layer_decomposition():
    """Full fused 4-bit layer vs matmuls alone vs the residue."""
    import dataclasses

    from bench import llama7b_spec, synth_packed_params
    from gptq_tpu.models.common import (KVCache, build_mask, block_forward,
                                        fuse_serving, rope_tables)

    spec = dataclasses.replace(llama7b_spec(), n_layers=1)
    params = fuse_serving(spec, synth_packed_params(spec, bits=4), a8=True)
    bp = params["layers"][0]
    max_len = 256

    cache = KVCache.init(spec, 1, max_len, jnp.bfloat16)
    positions = jnp.zeros((1, 1), jnp.int32) + 17
    k_pos = jnp.arange(max_len)[None, :]
    mask = jnp.where(k_pos <= 17, 0.0, -1e9).astype(jnp.float32)[None, None]

    def full_layer(x):
        out, _, _ = block_forward(
            spec, bp, x, positions=positions, mask=mask,
            cache=(cache.k[0], cache.v[0]), cache_len=jnp.asarray(17))
        return out

    def matmuls_only(x):
        from gptq_tpu.models.common import _apply_fused, _row_linear, linear_apply
        q, k, v = _apply_fused(bp["qkv_fused"], x)
        o = linear_apply(bp["o"], q)
        g, up = _apply_fused(bp["gateup_fused"], x)
        d = linear_apply(bp["down"], g * up)
        return o + d + v.sum() + k.sum()

    x = jax.random.normal(jax.random.PRNGKey(1), (1, 1, spec.hidden),
                          jnp.bfloat16)
    t_full = chained_seconds(full_layer, x, iters=48)
    t_mm = chained_seconds(matmuls_only, x, iters=48)
    print(f"full layer: {t_full*1e6:.1f} us; matmuls only: {t_mm*1e6:.1f} us; "
          f"residue: {(t_full-t_mm)*1e6:.1f} us")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "decomp"):
        layer_decomposition()
    if which in ("all", "4bit"):
        sweep(bits=4, act="int8")
    if which in ("all", "3bit"):
        sweep(bits=3, act="int8")
    if which in ("all", "4g128"):
        sweep(bits=4, groupsize=128, act="int8")
