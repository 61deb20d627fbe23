"""Headline benchmark: 4-bit LLaMa-7B single-token decode on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": tokens/s/chip, "unit": "tok/s",
   "vs_baseline": speedup_vs_bf16 / 3.25}

Protocol mirrors the reference decode benchmark (reference: opt.py:440-507):
batch-1 token-by-token decode with KV cache, warmup, median latency. The
reference's headline kernel number is a 3.25x generation speedup over FP16
on the same device (reference: README.md:22,105), so vs_baseline is our
(4-bit tok/s) / (bf16 tok/s) speedup normalized by 3.25 — >= 1.0 means we
beat the reference's relative win.

Weights are synthetic (offline container; HF hub unreachable): random 4-bit
codes packed into the real serving format — identical compute/memory
behavior to a quantized checkpoint.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def llama7b_spec():
    from gptq_tpu.models.common import ArchSpec

    return ArchSpec(arch="llama", n_layers=32, hidden=4096, n_heads=32,
                    n_kv_heads=32, ffn=11008, vocab=32000, max_pos=2048,
                    act="silu", pos="rope", norm_type="rmsnorm",
                    linear_bias=False, tie_embeddings=False)


def synth_packed_params(spec, bits=4, groupsize=-1, dtype=None, seed=0):
    """Random packed weights, built layer by layer to bound host memory."""
    import jax
    import jax.numpy as jnp

    from gptq_tpu.models.common import init_params
    from gptq_tpu.ops.pack import PackedWeight, pack_codes

    dtype = dtype or jnp.bfloat16
    rng = np.random.default_rng(seed)

    from gptq_tpu.ops.pack import FIELD_SPLITS

    def packed_linear(out_d, in_d):
        ng = 1 if groupsize <= 0 else in_d // groupsize
        # random packed words directly (codes are irrelevant for timing)
        words = tuple(
            jnp.asarray(rng.integers(np.iinfo(np.int32).min,
                                     np.iinfo(np.int32).max,
                                     size=(in_d // (32 // fb), out_d),
                                     dtype=np.int32))
            for fb, _ in FIELD_SPLITS[bits]
        )
        scale = jnp.asarray(rng.normal(0.01, 0.002, size=(ng, out_d)).astype(np.float32))
        zoff = scale * (2 ** (bits - 1))
        return {"w": PackedWeight(words=words, scale=scale, zoff=zoff,
                                  bits=bits, K=in_d, N=out_d,
                                  groupsize=groupsize, fmt="uniform"),
                "b": None}

    h, f = spec.hidden, spec.ffn
    layers = []
    for _ in range(spec.n_layers):
        layers.append({
            "q": packed_linear(h, h), "k": packed_linear(h, h),
            "v": packed_linear(h, h), "o": packed_linear(h, h),
            "gate": packed_linear(f, h), "up": packed_linear(f, h),
            "down": packed_linear(h, f),
            "ln1": {"w": jnp.ones((h,), dtype)},
            "ln2": {"w": jnp.ones((h,), dtype)},
        })
    embed = {"tokens": jnp.asarray(
        rng.normal(0, 0.02, size=(spec.vocab, h)).astype(np.float32), dtype)}
    lm = {"w": jnp.asarray(
        rng.normal(0, 0.02, size=(spec.vocab, h)).astype(np.float32), dtype),
        "b": None}
    return {"embed": embed, "layers": layers, "final_ln": {"w": jnp.ones((h,), dtype)},
            "lm_head": lm}


def synth_dense_params(spec, dtype=None, seed=0):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    dtype = dtype or jnp.bfloat16
    h, f = spec.hidden, spec.ffn

    def lin(out_d, in_d):
        return {"w": jnp.asarray(
            (rng.normal(0, 1, size=(out_d, in_d)) * 0.01).astype(np.float32), dtype),
            "b": None}

    layers = []
    for _ in range(spec.n_layers):
        layers.append({
            "q": lin(h, h), "k": lin(h, h), "v": lin(h, h), "o": lin(h, h),
            "gate": lin(f, h), "up": lin(f, h), "down": lin(h, f),
            "ln1": {"w": jnp.ones((h,), dtype)},
            "ln2": {"w": jnp.ones((h,), dtype)},
        })
    embed = {"tokens": jnp.asarray(
        rng.normal(0, 0.02, size=(spec.vocab, h)).astype(np.float32), dtype)}
    lm = {"w": jnp.asarray(
        rng.normal(0, 0.02, size=(spec.vocab, h)).astype(np.float32), dtype),
        "b": None}
    return {"embed": embed, "layers": layers, "final_ln": {"w": jnp.ones((h,), dtype)},
            "lm_head": lm}


def measure_decode(spec, params, n_tokens=48, warmup=8, max_len=256):
    import jax
    import jax.numpy as jnp

    from gptq_tpu.models.common import KVCache, model_forward

    @jax.jit
    def step(params, cache, token):
        logits, cache = model_forward(spec, params, token, cache)
        return jnp.argmax(logits[:, -1], axis=-1), cache

    cache = KVCache.init(spec, 1, max_len, jnp.bfloat16)
    tok = jnp.zeros((1, 1), jnp.int32)
    for _ in range(warmup):
        nxt, cache = step(params, cache, tok)
    jax.block_until_ready(nxt)

    times = []
    for _ in range(n_tokens):
        t0 = time.perf_counter()
        nxt, cache = step(params, cache, tok)
        nxt.block_until_ready()
        times.append(time.perf_counter() - t0)
        tok = nxt[:, None]
    return float(np.median(times))


def main():
    spec = llama7b_spec()
    try:
        params_q = synth_packed_params(spec, bits=4)
        t_q = measure_decode(spec, params_q)
        del params_q
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"metric": "llama7b-4bit decode", "value": 0,
                          "unit": "tok/s", "vs_baseline": 0,
                          "error": f"{type(e).__name__}: {e}"[:400]}))
        return 1

    # bf16 dense baseline on the same chip; on OOM fall back to a
    # half-depth model and double its per-token latency (layer-linear cost)
    try:
        params_d = synth_dense_params(spec)
        t_d = measure_decode(spec, params_d)
        del params_d
    except Exception:
        try:
            import dataclasses

            half = dataclasses.replace(spec, n_layers=spec.n_layers // 2)
            params_d = synth_dense_params(half)
            t_d = 2.0 * measure_decode(half, params_d)
            del params_d
        except Exception:
            t_d = None

    toks = 1.0 / t_q
    speedup = (t_d / t_q) if t_d else None
    out = {
        "metric": "llama7b-4bit-decode tokens/s/chip (batch1, median)",
        "value": round(toks, 2),
        "unit": "tok/s",
        "vs_baseline": round(speedup / 3.25, 4) if speedup else None,
        "detail": {
            "median_token_s_4bit": round(t_q, 6),
            "median_token_s_bf16": round(t_d, 6) if t_d else None,
            "speedup_vs_bf16": round(speedup, 3) if speedup else None,
        },
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
