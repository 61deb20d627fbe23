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

from gptq_tpu.models.common import (ArchSpec, KVCache, fuse_serving,
                                    model_forward)


def sample_token(logits, key, temperature: float = 0.0, top_k: int = 0):
    """Next-token rule shared by the on-device chunk loop and the
    first-token pick after prefill: greedy at temperature 0, else
    temperature-scaled (optionally top-k-filtered) categorical sampling."""
    if temperature <= 0.0:
        return jnp.argmax(logits, axis=-1)
    lg = logits.astype(jnp.float32) / temperature
    if top_k > 0:
        thresh = jax.lax.top_k(lg, top_k)[0][..., -1:]
        lg = jnp.where(lg < thresh, -jnp.inf, lg)
    return jax.random.categorical(key, lg, axis=-1)


class DecodeEngine:
    def __init__(self, spec: ArchSpec, params: dict, max_len: int = 2048,
                 batch: int = 1, cache_dtype=jnp.bfloat16, fuse: bool = True,
                 a8: bool = False):
        self.spec = spec
        if fuse or a8:
            params = fuse_serving(spec, params, a8=a8)
        self.params = params
        self.max_len = max_len
        self.batch = batch
        self.cache_dtype = cache_dtype

        @jax.jit
        def _step(params, cache: KVCache, token):
            logits, cache = model_forward(spec, params, token, cache)
            return logits[:, -1], cache

        self._step = _step

        @partial(jax.jit, static_argnums=(3, 5, 6))
        def _chunk(params, cache: KVCache, token, n: int, key=None,
                   temperature: float = 0.0, top_k: int = 0):
            """n decode steps chained on-device (one dispatch).

            On TPU each host->device dispatch costs a full round trip;
            chaining via lax.scan amortizes it over n tokens (the CUDA
            reference syncs per token, opt.py:489-501 — on TPU the idiomatic
            serving loop lives on device). temperature 0 = greedy; top_k > 0
            restricts sampling to the k most likely tokens."""

            def pick(logits, k):
                return sample_token(logits, k, temperature, top_k)

            def body(carry, k):
                tok, cache = carry
                logits, cache = model_forward(spec, params, tok, cache)
                nxt = pick(logits[:, -1], k)
                return (nxt[:, None], cache), nxt

            keys = (jax.random.split(key, n) if temperature > 0.0
                    else jnp.zeros((n, 2), jnp.uint32))
            (tok, cache), toks = jax.lax.scan(body, (token, cache), keys)
            return tok, cache, toks  # toks: (n, B)

        self._chunk = _chunk

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

    @staticmethod
    def _bucket(needed: int, max_len: int, floor: int = 128) -> int:
        b = floor
        while b < needed:
            b *= 2
        return min(b, max_len)

    def generate_chained(self, prompt_ids: np.ndarray, max_new_tokens: int,
                         chunk: int = 32, temperature: float = 0.0,
                         top_k: int = 0, key=None,
                         bucketed: bool = True) -> np.ndarray:
        """Generation with the decode loop on-device: one dispatch per
        `chunk` tokens instead of per token. temperature 0 reproduces
        `generate` (greedy); temperature > 0 samples (optionally top-k
        truncated) with the given PRNG key.

        bucketed=True runs each chunk against the smallest power-of-two
        cache prefix that covers it (the filled length is known on the
        host between chunks), so early tokens of a long-context session
        don't pay full-max_len attention reads; the slice writes back into
        the full cache after the chunk. A few bucket sizes each compile
        once."""
        ids = jnp.asarray(prompt_ids).reshape(self.batch, -1)
        if temperature > 0.0 and key is None:
            key = jax.random.PRNGKey(0)
        logits, cache = self.prefill(ids)
        if temperature > 0.0:
            # same sampling rule the chunk loop applies to every
            # subsequent token (greedy-first was a bias)
            key, sub = jax.random.split(key)
        else:
            sub = None
        first = sample_token(logits, sub, temperature, top_k)
        out = [first[:, None]]
        tok = first[:, None]
        remaining = max_new_tokens - 1
        cur = ids.shape[1] + 1  # filled prefix after the next token write
        while remaining > 0:
            n = min(chunk, remaining)
            if temperature > 0.0:
                key, sub = jax.random.split(key)
            else:
                sub = None
            b = (self._bucket(cur + n, self.max_len)
                 if bucketed else self.max_len)
            if b < self.max_len:
                small = KVCache(
                    k=cache.k[:, :, :b], v=cache.v[:, :, :b],
                    length=cache.length,
                    k_scale=None if cache.k_scale is None
                    else cache.k_scale[:, :, :b],
                    v_scale=None if cache.v_scale is None
                    else cache.v_scale[:, :, :b],
                )
                tok, small, toks = self._chunk(self.params, small, tok, n,
                                               sub, temperature, top_k)
                cache = KVCache(
                    k=cache.k.at[:, :, :b].set(small.k),
                    v=cache.v.at[:, :, :b].set(small.v),
                    length=small.length,
                    k_scale=None if cache.k_scale is None
                    else cache.k_scale.at[:, :, :b].set(small.k_scale),
                    v_scale=None if cache.v_scale is None
                    else cache.v_scale.at[:, :, :b].set(small.v_scale),
                )
            else:
                tok, cache, toks = self._chunk(self.params, cache, tok, n,
                                               sub, temperature, top_k)
            out.append(toks.T)  # (B, n)
            remaining -= n
            cur += n
        return np.asarray(jnp.concatenate(out, axis=1)[:, :max_new_tokens])


def _round_len(n: int, cache_dtype) -> int:
    """Benchmark KV-cache length. The int8 cache feeds the Pallas
    decode-attention kernel, whose S blocks and slab DMAs must be
    tile-aligned (int8 sublane tile = 32) — round up to a 128-multiple
    (extra rows are masked by cache.length). The bf16 default serves
    through the XLA einsum, where n+1 is fine and rounding would only
    inflate the attention-read bytes."""
    if cache_dtype == jnp.int8:
        return ((n + 127) // 128) * 128
    return n


def benchmark_decode(
    spec: ArchSpec,
    params: dict,
    input_ids: np.ndarray,  # (1, n_tokens) forced token sequence
    check: bool = False,
    warmup: int = 100,
    trace_dir: str | None = None,
    log=print,
    cache_dtype=jnp.bfloat16,
) -> dict:
    """Reference benchmark protocol (opt.py:440-507): feed input_ids one
    token at a time through the cached decode step; report median per-token
    latency. With check=True also accumulates next-token NLL like
    `--benchmark --check` (opt.py:499-507)."""
    n = int(np.prod(input_ids.shape))
    ids = np.asarray(input_ids).reshape(1, n)
    # cache length rounds up to a tile-friendly multiple: n+1 would give
    # the int8 attention kernel a non-sublane-aligned S block (e.g. 129
    # for --benchmark 128); extra rows are masked by the cache length
    engine = DecodeEngine(spec, params, max_len=_round_len(n + 1, cache_dtype),
                          batch=1, cache_dtype=cache_dtype)
    params = engine.params  # fused serving weights
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


def measure_dispatch_rtt(reps: int = 5) -> float:
    """Host<->device round-trip cost of one dispatch+fetch (seconds). On
    relayed backends this is large (tens of ms) and must be amortized or
    subtracted to see device time."""
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8, 128), jnp.float32)
    float(np.asarray(f(x)).ravel()[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(f(x)).ravel()[0])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def benchmark_decode_chained(
    spec: ArchSpec,
    params: dict,
    input_ids: np.ndarray,
    check: bool = False,
    warmup: int = 2,
    reps: int = 3,
    log=print,
    cache_dtype=jnp.bfloat16,
) -> dict:
    """Decode benchmark with the token loop on-device.

    Same workload as `benchmark_decode` (feed `input_ids` one token at a
    time through a growing KV cache) but all n steps run inside one jitted
    lax.scan, so the per-token time reflects the chip, not the host
    round-trip. The RTT is cancelled by differencing a full-length and a
    half-length run; both are also reported."""
    n = int(np.prod(input_ids.shape))
    ids = jnp.asarray(np.asarray(input_ids).reshape(n).astype(np.int32))
    params = fuse_serving(spec, params)

    def make_run(length: int):
        @jax.jit
        def run(params, ids_slice):
            cache = KVCache.init(spec, 1, _round_len(n + 1, cache_dtype),
                                 cache_dtype)
            nxt = jnp.concatenate([ids_slice[1:], ids_slice[-1:]])
            valid = jnp.arange(length) < length - 1

            def body(carry, x):
                cache, nll = carry
                tok, tgt, v = x
                logits, cache = model_forward(
                    spec, params, tok[None, None], cache)
                if check:
                    lp = jax.nn.log_softmax(logits[0, -1].astype(jnp.float32))
                    nll = nll - jnp.where(v, lp[tgt], 0.0)
                return (cache, nll), logits[0, -1, 0]

            (cache, nll), last = jax.lax.scan(
                body, (cache, jnp.zeros((), jnp.float32)),
                (ids_slice, nxt, valid))
            return nll + last[-1] * 0.0  # depend on every step

        return run

    half = n // 2
    run_full = make_run(n)
    run_half = make_run(half)

    def timed(run, ids_slice):
        out = run(params, ids_slice)
        float(np.asarray(out))  # warm compile + true sync
        ts = []
        for _ in range(max(1, warmup - 1)):
            out = run(params, ids_slice)
        float(np.asarray(out))
        for _ in range(reps):
            t0 = time.perf_counter()
            out = run(params, ids_slice)
            float(np.asarray(out))
            ts.append(time.perf_counter() - t0)
        return min(ts), out

    t_half, _ = timed(run_half, ids[:half])
    t_full, nll_full = timed(run_full, ids)
    per_tok = (t_full - t_half) / (n - half)
    rtt = measure_dispatch_rtt()
    below_floor = per_tok <= 0
    if below_floor:
        # tiny models: the half/full chain difference drowns in relay
        # noise and can come out negative — fall back to the full-chain
        # average (an upper bound: it still carries one dispatch RTT)
        # rather than reporting a negative time or an infinite rate
        per_tok = t_full / n
    result = {
        "per_token_s": per_tok,
        "tokens_per_s": 1.0 / per_tok,
        "full_run_s": t_full,
        "half_run_s": t_half,
        "dispatch_rtt_s": rtt,
        "n_tokens": n,
        "below_noise_floor": below_floor,
    }
    qualifier = " (upper bound: difference below noise floor)" \
        if below_floor else ""
    log(f"Per-token (device): {per_tok*1e3:.3f} ms "
        f"({result['tokens_per_s']:.1f} tok/s){qualifier}; "
        f"dispatch RTT {rtt*1e3:.1f} ms")
    if check:
        result["ppl"] = float(np.exp(float(np.asarray(nll_full)) / (n - 1)))
        log(f"PPL: {result['ppl']:.4f}")
    return result
