"""Parallel serving engines — the CLI surface for the sharded serving
matrix (sequence-parallel SPCache long-context serving and
expert-parallel MoE serving, each composing with tensor parallelism).

The reference's entire serving surface is the packed decode benchmark
inside each driver's __main__ (reference: opt.py:440-507, 659-721),
single-process. Round 2 built the sharded serving flows as library
functions proven by tests (parallel/sp.py, parallel/ep.py); this module
makes them product: one object per composition, buildable from CLI flags
(gptq_tpu.cli --sp/--ep [--tp]), with prefill/decode/generate and the
chained on-device benchmark protocol (per-token host-synced timing would
measure the ~30 ms relay dispatch, not the chip).

Capacity guards run on the host once per chunk — the hot loop uses the
unguarded jitted step inside lax.scan.
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from gptq_tpu.models.common import ArchSpec, KVCache, fuse_serving


def _round_up(n: int, unit: int) -> int:
    return -(-n // unit) * unit


class SPEngine:
    """Long-context serving with the KV cache sharded over an "sp" mesh
    axis for its whole lifetime (optionally doubly sharded over (sp, tp)
    with the weights tensor-parallel): per-device cache memory is
    S/(sp[*tp]), per-device weight memory W/tp. cache_dtype defaults to
    int8 at max_len >= 1024 (the long-context configuration: half the
    cache bytes, served by the fused partial-attention kernel) and
    bfloat16 below.

    max_len rounds up so per-device slot counts are 128-multiples — the
    partial-attention kernel's slab blocks then tile cleanly on TPU.
    """

    def __init__(self, spec: ArchSpec, params: dict, sp: int, tp: int = 1,
                 max_len: int = 2048, cache_dtype=None, fuse: bool = True,
                 a8: bool = False, devices=None):
        from gptq_tpu.parallel.sp import (make_sp_cache_prefill,
                                          make_sp_mesh,
                                          make_sp_tp_cache_prefill,
                                          make_sp_tp_mesh)

        if cache_dtype is None:
            cache_dtype = jnp.int8 if max_len >= 1024 else jnp.bfloat16
        self.spec = spec
        self.sp = sp
        self.tp = tp
        self.cache_dtype = cache_dtype
        self.int8 = cache_dtype == jnp.int8
        self.max_len = _round_up(max_len, 128 * sp)
        self._steps: dict[tuple, object] = {}  # meta -> step
        self._chunks: dict[tuple, object] = {}

        if tp > 1:
            self.mesh = make_sp_tp_mesh(sp, tp, devices)
            self.params = params  # tp_local_view shards inside the builders
            self._fuse, self._a8 = fuse, a8
            self._prefill, self._local = make_sp_tp_cache_prefill(
                spec, params, self.mesh, cache_dtype=cache_dtype,
                max_len=self.max_len, fuse=fuse, a8=a8)
        else:
            self.mesh = make_sp_mesh(sp, devices)
            # sp replicates weights: serve-time fusion applies up front
            self.params = (fuse_serving(spec, params, a8=a8)
                           if fuse or a8 else params)
            self._local = None
            self._prefill = make_sp_cache_prefill(
                spec, self.params, self.mesh, cache_dtype=cache_dtype,
                max_len=self.max_len)

    # -- builders -----------------------------------------------------------

    def _step_for(self, meta: tuple):
        if meta not in self._steps:
            from gptq_tpu.parallel.sp import (make_sp_decode_step,
                                              make_sp_tp_decode_step)

            if self.tp > 1:
                _, step = make_sp_tp_decode_step(
                    self.spec, self.params, self.mesh, meta,
                    fuse=self._fuse, a8=self._a8, int8_cache=self.int8,
                    check_capacity=False)
            else:
                step = make_sp_decode_step(
                    self.spec, self.params, self.mesh, meta,
                    int8_cache=self.int8, check_capacity=False)
            self._steps[meta] = step
        return self._steps[meta]

    def _chunk_for(self, meta: tuple):
        """Chained greedy/forced decode: n steps in ONE dispatch via
        lax.scan over the unguarded step (the TPU-idiomatic serving loop;
        the reference syncs per token, opt.py:489-501)."""
        if meta not in self._chunks:
            step_obj = self._step_for(meta)
            inner = step_obj.inner
            # weights ride as a jit OPERAND (first arg): closure-captured
            # arrays embed in the lowered module as constants — ~GBs of
            # packed weights per program at 7B scale, which the remote
            # compile service cannot take (parallel/sp.py _inner note)
            weights = (self._local if self._local is not None
                       else step_obj.weights)

            @partial(jax.jit, static_argnums=(3, 4))
            def chunk(weights, cache, tok, n: int, check: bool,
                      forced=None):
                """forced (n, B) overrides the greedy pick (benchmark
                protocol feeds a fixed sequence); with check=True also
                accumulates next-token NLL of the forced sequence."""

                def body(carry, x):
                    tok, cache, nll = carry
                    logits, cache = inner(weights, cache, tok)
                    nxt = jnp.argmax(logits, axis=-1)
                    if forced is not None:
                        if check:
                            lp = jax.nn.log_softmax(
                                logits[0].astype(jnp.float32))
                            nll = nll + -lp[x[0]]
                        nxt = x
                    return (nxt[:, None], cache, nll), nxt

                xs = forced if forced is not None else jnp.zeros(
                    (n, tok.shape[0]), tok.dtype)
                (tok, cache, nll), toks = jax.lax.scan(
                    body, (tok, cache, jnp.zeros((), jnp.float32)), xs)
                return tok, cache, toks, nll

            self._chunks[meta] = partial(chunk, weights)
        return self._chunks[meta]

    # -- serving API --------------------------------------------------------

    def prefill(self, ids: jax.Array):
        """(last-token logits (B, vocab), SPCache). The prompt length must
        divide by sp (generate() handles ragged prompts by feeding the
        remainder through decode steps)."""
        logits, cache = self._prefill(jnp.asarray(ids))
        return logits[:, -1], cache

    def step(self, cache, token: jax.Array):
        step = self._step_for(cache.meta)
        if self.tp > 1:
            return step(self._local, cache, jnp.asarray(token))
        return step(cache, jnp.asarray(token))

    def _capacity(self, cache) -> int:
        Tc, ml = cache.meta
        return ml * self.sp

    def generate(self, prompt_ids: np.ndarray, max_new_tokens: int,
                 chunk: int = 32) -> np.ndarray:
        """Greedy generation: sp-divisible prompt prefix prefills through
        the ring, the ragged remainder and all new tokens run through the
        chained decode step (one dispatch per `chunk` tokens)."""
        ids = jnp.asarray(prompt_ids)
        B, T = ids.shape
        Tp = max(self.sp, (T // self.sp) * self.sp)
        if Tp > T:
            raise ValueError(f"prompt length {T} < sp {self.sp}")
        logits, cache = self.prefill(ids[:, :Tp])
        length = Tp
        rest = ids[:, Tp:]
        ck = self._chunk_for(cache.meta)
        # the ragged remainder (< sp tokens) feeds through decode steps
        for i in range(rest.shape[1]):
            logits, cache = self.step(cache, rest[:, i:i + 1])
            length += 1
        tok = jnp.argmax(logits, axis=-1)[:, None]
        out = [np.asarray(tok)]
        remaining = max_new_tokens - 1
        while remaining > 0:
            n = min(chunk, remaining, self._capacity(cache) - length - 1)
            if n <= 0:
                break
            tok, cache, toks, _ = ck(cache, tok, n, False, None)
            out.append(np.asarray(toks.T))
            remaining -= n
            length += n
        return np.concatenate(out, axis=1)

    def benchmark_chained(self, input_ids: np.ndarray, check: bool = False,
                          warmup: int = 2, reps: int = 3, log=print) -> dict:
        """Decode benchmark through the sharded-cache serving path: the
        first sp tokens prefill, the rest feed token-by-token inside one
        on-device scan. RTT cancels by differencing full/half chains
        (the protocol of engine.decode.benchmark_decode_chained)."""
        n = int(np.prod(input_ids.shape))
        ids = jnp.asarray(np.asarray(input_ids).reshape(1, n))
        sp = self.sp
        _, cache0 = self.prefill(ids[:, :sp])
        if n > self._capacity(cache0):
            raise ValueError(f"{n} tokens exceed capacity "
                             f"{self._capacity(cache0)}")
        ck = self._chunk_for(cache0.meta)

        def run(length: int):
            # chain feeds ids[sp .. sp+length-1]; each step's NLL target
            # is the forced next token
            forced = ids[0, sp + 1:sp + 1 + length, None]  # (length, 1)
            tok = ids[:, sp:sp + 1]
            _, _, toks, nll = ck(cache0, tok, length, check, forced)
            return toks, nll

        def timed(length):
            toks, nll = run(length)
            jax.block_until_ready(toks)
            ts = []
            for _ in range(max(1, warmup - 1)):
                toks, nll = run(length)
            jax.block_until_ready(toks)
            for _ in range(reps):
                t0 = time.perf_counter()
                toks, nll = run(length)
                jax.block_until_ready(toks)
                ts.append(time.perf_counter() - t0)
            return min(ts), nll

        full = n - sp - 1
        half = full // 2
        t_half, _ = timed(half)
        t_full, nll = timed(full)
        per_tok = (t_full - t_half) / (full - half)
        below = per_tok <= 0
        if below:
            per_tok = t_full / full
        result = {
            "per_token_s": per_tok,
            "tokens_per_s": 1.0 / per_tok,
            "full_run_s": t_full,
            "half_run_s": t_half,
            "n_tokens": full,
            "below_noise_floor": below,
            "sp": self.sp, "tp": self.tp,
            "cache_dtype": "int8" if self.int8 else "bfloat16",
            "max_len": self.max_len,
        }
        log(f"sp={self.sp} tp={self.tp} cache={result['cache_dtype']} "
            f"max_len={self.max_len}: {per_tok*1e3:.3f} ms/token "
            f"({result['tokens_per_s']:.1f} tok/s)"
            f"{' (upper bound)' if below else ''}")
        if check:
            result["ppl"] = float(np.exp(float(np.asarray(nll)) / full))
            log(f"PPL: {result['ppl']:.4f}")
        return result


class EPEngine:
    """MoE serving with expert stacks sharded over an "ep" mesh axis
    (optionally attention tensor-parallel over a 2-D (ep, tp) mesh):
    per-device expert memory E/ep. The KV cache is a regular KVCache —
    replicated on the ep-only mesh, kv-head-sharded over tp on the 2-D
    mesh. The ep decode step handles prefill too (T > 1 appends)."""

    def __init__(self, spec: ArchSpec, params: dict, ep: int, tp: int = 1,
                 max_len: int = 2048, cache_dtype=jnp.bfloat16,
                 fuse: bool = True, a8: bool = False, devices=None):
        from gptq_tpu.parallel.ep import (make_ep_decode_step, make_ep_mesh,
                                          make_ep_tp_decode_step)

        if not spec.n_experts:
            raise ValueError("--ep serving needs an MoE model "
                             "(spec.n_experts == 0)")
        self.spec = spec
        self.ep = ep
        self.tp = tp
        self.max_len = max_len
        self.cache_dtype = cache_dtype
        self.int8 = cache_dtype == jnp.int8
        if tp > 1:
            import numpy as _np
            from jax.sharding import Mesh

            devices = devices if devices is not None else jax.devices()
            if len(devices) < ep * tp:
                raise ValueError(f"need {ep * tp} devices, "
                                 f"have {len(devices)}")
            self.mesh = Mesh(
                _np.asarray(devices[:ep * tp]).reshape(ep, tp), ("ep", "tp"))
            self._local, self._step = make_ep_tp_decode_step(
                spec, params, self.mesh, fuse=fuse, a8=a8,
                int8_cache=self.int8)
        else:
            self.mesh = make_ep_mesh(ep, devices)
            self._local = (fuse_serving(spec, params, a8=a8)
                           if fuse or a8 else params)
            self._step = make_ep_decode_step(spec, self._local, self.mesh,
                                             int8_cache=self.int8)

    def new_cache(self, batch: int = 1) -> KVCache:
        return KVCache.init(self.spec, batch, self.max_len, self.cache_dtype)

    def prefill(self, ids: jax.Array, cache: KVCache | None = None):
        cache = cache if cache is not None else self.new_cache(
            jnp.asarray(ids).shape[0])
        logits, cache = self._step(self._local, cache, jnp.asarray(ids))
        return logits, cache

    def step(self, cache: KVCache, token: jax.Array):
        return self._step(self._local, cache, jnp.asarray(token))

    def generate(self, prompt_ids: np.ndarray, max_new_tokens: int) -> np.ndarray:
        logits, cache = self.prefill(jnp.asarray(prompt_ids))
        tok = jnp.argmax(logits, axis=-1)[:, None]
        out = [np.asarray(tok)]
        for _ in range(max_new_tokens - 1):
            logits, cache = self.step(cache, tok)
            tok = jnp.argmax(logits, axis=-1)[:, None]
            out.append(np.asarray(tok))
        return np.concatenate(out, axis=1)

    def benchmark_chained(self, input_ids: np.ndarray, check: bool = False,
                          warmup: int = 2, reps: int = 3, log=print) -> dict:
        """Forced-sequence decode benchmark through the ep step (chained
        on-device; same two-length differencing as SPEngine)."""
        n = int(np.prod(input_ids.shape))
        ids = jnp.asarray(np.asarray(input_ids).reshape(1, n))
        step = self._step
        local = self._local
        spec = self.spec
        max_len = self.max_len
        cdt = self.cache_dtype

        @partial(jax.jit, static_argnums=(1,))
        def run(ids_row, length: int):
            cache = KVCache.init(spec, 1, max_len, cdt)
            nxt = jnp.concatenate([ids_row[1:length], ids_row[length - 1:length]])
            valid = jnp.arange(length) < length - 1

            def body(carry, x):
                cache, nll = carry
                tok, tgt, v = x
                logits, cache = step(local, cache, tok[None, None])
                if check:
                    lp = jax.nn.log_softmax(logits[0].astype(jnp.float32))
                    nll = nll - jnp.where(v, lp[tgt], 0.0)
                return (cache, nll), logits[0, 0]

            (cache, nll), last = jax.lax.scan(
                body, (cache, jnp.zeros((), jnp.float32)),
                (ids_row[:length], nxt, valid))
            return nll + last[-1] * 0.0

        def timed(length):
            out = run(ids[0], length)
            float(np.asarray(out))
            ts = []
            for _ in range(max(1, warmup - 1)):
                out = run(ids[0], length)
            float(np.asarray(out))
            for _ in range(reps):
                t0 = time.perf_counter()
                out = run(ids[0], length)
                float(np.asarray(out))
                ts.append(time.perf_counter() - t0)
            return min(ts), out

        half = n // 2
        t_half, _ = timed(half)
        t_full, nll = timed(n)
        per_tok = (t_full - t_half) / (n - half)
        below = per_tok <= 0
        if below:
            per_tok = t_full / n
        result = {
            "per_token_s": per_tok,
            "tokens_per_s": 1.0 / per_tok,
            "n_tokens": n,
            "below_noise_floor": below,
            "ep": self.ep, "tp": self.tp,
        }
        log(f"ep={self.ep} tp={self.tp}: {per_tok*1e3:.3f} ms/token "
            f"({result['tokens_per_s']:.1f} tok/s)"
            f"{' (upper bound)' if below else ''}")
        if check:
            result["ppl"] = float(np.exp(float(np.asarray(nll)) / (n - 1)))
            log(f"PPL: {result['ppl']:.4f}")
        return result
