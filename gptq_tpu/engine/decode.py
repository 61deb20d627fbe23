"""KV-cache decode engine and the decode benchmark protocol.

Counterpart of the reference's packed-checkpoint `benchmark`
(reference: opt.py:440-507): token-by-token generation with a growing KV
cache, 100-step warmup, per-token wall-clock with device sync, median
latency, optional decode-time PPL `--check`, and a profiler trace option
(`jax.profiler.trace` replacing torch's chrome-trace export at
opt.py:479-486).

The decode step is one jitted program over a preallocated cache —
shapes are static, only `cache.length` varies, so the step compiles once.
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from gptq_tpu.models.common import ArchSpec, KVCache, model_forward


class DecodeEngine:
    def __init__(self, spec: ArchSpec, params: dict, max_len: int = 2048,
                 batch: int = 1, cache_dtype=jnp.bfloat16):
        self.spec = spec
        self.params = params
        self.max_len = max_len
        self.batch = batch
        self.cache_dtype = cache_dtype

        @jax.jit
        def _step(params, cache: KVCache, token):
            logits, cache = model_forward(spec, params, token, cache)
            return logits[:, -1], cache

        self._step = _step

    def new_cache(self) -> KVCache:
        return KVCache.init(self.spec, self.batch, self.max_len, self.cache_dtype)

    def prefill(self, ids: jax.Array, cache: KVCache | None = None):
        """Feed a prompt; returns (last-token logits, cache)."""
        cache = cache if cache is not None else self.new_cache()
        return self._step(self.params, cache, ids)

    def generate(self, prompt_ids: np.ndarray, max_new_tokens: int,
                 greedy: bool = True, key=None) -> np.ndarray:
        ids = jnp.asarray(prompt_ids).reshape(self.batch, -1)
        logits, cache = self.prefill(ids)
        out = []
        tok = jnp.argmax(logits, axis=-1)
        for _ in range(max_new_tokens):
            out.append(np.asarray(tok))
            logits, cache = self._step(self.params, cache, tok[:, None])
            tok = jnp.argmax(logits, axis=-1)
        return np.stack(out, axis=1)


def benchmark_decode(
    spec: ArchSpec,
    params: dict,
    input_ids: np.ndarray,  # (1, n_tokens) forced token sequence
    check: bool = False,
    warmup: int = 100,
    trace_dir: str | None = None,
    log=print,
) -> dict:
    """Reference benchmark protocol (opt.py:440-507): feed input_ids one
    token at a time through the cached decode step; report median per-token
    latency. With check=True also accumulates next-token NLL like
    `--benchmark --check` (opt.py:499-507)."""
    n = int(np.prod(input_ids.shape))
    ids = np.asarray(input_ids).reshape(1, n)
    engine = DecodeEngine(spec, params, max_len=n + 1, batch=1)
    cache = engine.new_cache()

    step = engine._step
    tok0 = jnp.asarray(ids[:, :1])
    warm_cache = engine.new_cache()
    for _ in range(warmup):
        logits, _ = step(params, warm_cache, tok0)
    float(np.asarray(logits[0, 0]))

    if trace_dir:
        with jax.profiler.trace(trace_dir):
            logits, _ = step(params, engine.new_cache(), tok0)
            jax.block_until_ready(logits)
        log(f"profile trace written to {trace_dir}")

    times = []
    nll = 0.0
    for i in range(n):
        tok = jnp.asarray(ids[:, i : i + 1])
        t0 = time.perf_counter()
        logits, cache = step(params, cache, tok)
        # force a host round-trip: on relayed backends block_until_ready can
        # return before device execution finishes
        float(np.asarray(logits[0, 0]))
        times.append(time.perf_counter() - t0)
        if check and i != n - 1:
            lp = jax.nn.log_softmax(logits[0].astype(jnp.float32))
            nll += -float(lp[ids[0, i + 1]])

    med = float(np.median(times))
    result = {
        "median_s": med,
        "tokens_per_s": 1.0 / med,
        "mean_s": float(np.mean(times)),
        "p90_s": float(np.percentile(times, 90)),
    }
    log(f"Median: {med:.6f}s  ({1.0/med:.1f} tok/s)")
    if check:
        result["ppl"] = float(np.exp(nll / (n - 1)))
        log(f"PPL: {result['ppl']:.4f}")
    return result
