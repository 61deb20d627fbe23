"""Kernel tile autotuning.

Tile choice moves the fused dequant-matmul between ~400 and ~800 GB/s
effective on the same shape (chip-measured), and the best tile differs by
shape. Tuning must happen EAGERLY (a traced kernel cannot time itself), so
callers pre-tune the unique (K, N) shapes of a model once —
`tune_packed_shapes` — and `best_tiles` serves the table to dequant_matmul
at trace time. Results persist to results/autotune.json keyed by shape,
format and backend, so a model's second run skips tuning.

Table schema: key -> [tk, tn, gbps] (gbps = achieved effective bandwidth
of the winner, bytes = packed weight bytes / measured time; recorded so
regressions are visible across chips/runs). Legacy [tk, tn] entries load
fine. tk == -1 encodes the streamed double-buffered impl
(GPTQ_TPU_MATMUL_IMPL=streamed) as the winner.

The reference tunes its CUDA kernels by hand per GPU (BLOCKWIDTH/
BLOCKHEIGHT constants, quant_cuda_kernel.cu:28-29; k_tile/m_tile template
dispatch, lut_gemm/mv_fp16_bias.hpp:118-141); here the sweep is automated.
"""

from __future__ import annotations

import json
import os
import time
from typing import Iterable

import numpy as np

_TABLE: dict[str, tuple] = {}
# keys whose sweep was deadline-truncated: usable for THIS process but
# never persisted, so the next run (with fresh budget) retunes them
# instead of being locked to a partial winner forever
_EPHEMERAL: set[str] = set()
_LOADED = False
_PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "results", "autotune.json")

# candidate (tk, tn) tiles for decode-shape (small M) matmuls. Each
# candidate costs two kernel compiles (~1 min on a relayed chip), so the
# list is small; results persist, so the cost is once per shape.
# (0, FULL_N) expands to tn = stored N: the words block then covers full
# rows, so its HBM DMA is one contiguous slab (chip-measured at or near
# the 819 GB/s HBM spec where strided tn blocks sit at 400-600).
FULL_N = -2
STREAMED = -1
CANDIDATES = [(2048, 512), (1024, 1024), (4096, 512), (1024, 2048),
              (2048, 2048), (512, FULL_N), (1024, FULL_N),
              (STREAMED, STREAMED)]

_VMEM_BUDGET = 13_000_000  # double-buffered words blocks must fit VMEM


def _key(K: int, N: int, bits: int, groupsize: int, fmt: str, M: int,
         act: str = "bf16") -> str:
    import jax

    mb = "s" if M <= 64 else "l"
    return (f"{jax.default_backend()}:{fmt}{bits}g{groupsize}"
            f":{K}x{N}:{mb}:{act}")


def _load() -> None:
    global _LOADED
    if _LOADED:
        return
    _LOADED = True
    try:
        with open(_PATH) as f:
            _TABLE.update({k: tuple(v) for k, v in json.load(f).items()})
    except (OSError, ValueError):
        pass


def _save() -> None:
    try:
        os.makedirs(os.path.dirname(_PATH), exist_ok=True)
        with open(_PATH, "w") as f:
            json.dump({k: list(v) for k, v in _TABLE.items()
                       if k not in _EPHEMERAL}, f, indent=1)
    except OSError:
        pass


def best_tiles(K: int, N: int, bits: int, groupsize: int, fmt: str,
               M: int, act: str = "bf16") -> tuple[int, int] | None:
    """Tuned (tk, tn) for this shape, or None for the built-in default.
    (-1, -1) means the streamed impl won."""
    _load()
    ent = _TABLE.get(_key(K, N, bits, groupsize, fmt, M, act))
    return None if ent is None else tuple(ent[:2])


def _time_eager(fn, x, iters: int = 64, reps: int = 3) -> float:
    """Chained on-device timing (see kernel_bench.chained_seconds)."""
    from gptq_tpu.ops.kernel_bench import chained_seconds

    return chained_seconds(fn, x, iters=iters, reps=reps)


def _expand(tk: int, tn: int, pw) -> tuple[int, int] | None:
    """Resolve placeholder candidates against a concrete shape; None if the
    candidate is invalid (doesn't divide / exceeds VMEM)."""
    if tk == STREAMED:
        return (STREAMED, STREAMED)
    if tn == FULL_N:
        tn = pw.Np
    if pw.Kp % tk or pw.Np % tn:
        return None
    from gptq_tpu.ops.pack import FIELD_SPLITS

    fbs = ([fb for fb, _ in FIELD_SPLITS[pw.bits]] if pw.fmt != "bcq"
           else [1] * pw.bits)
    words_bytes = sum(2 * (tk // (32 // fb)) * tn * 4 for fb in fbs)
    if words_bytes > _VMEM_BUDGET:
        return None
    return (tk, tn)


def tune_packed(pw, M: int = 8, log=lambda s: None,
                act: str = "bf16",
                deadline: float | None = None) -> tuple[int, int]:
    """Measure CANDIDATES for one PackedWeight shape; persist and return
    the winner. With `deadline` (absolute perf_counter time), stop
    measuring further candidates once past it — each candidate costs ~2
    kernel compiles, which on a cold relayed chip is minutes, so a
    single shape's sweep could otherwise eat the whole model budget."""
    import jax
    import jax.numpy as jnp

    from gptq_tpu.ops.bcq_matmul import _matmul_pallas as bcq_mm
    from gptq_tpu.ops.qmatmul import (_matmul_pallas as uni_mm,
                                      _matmul_streamed)

    _load()
    key = _key(pw.K, pw.N, pw.bits, pw.groupsize, pw.fmt, M, act)
    if key in _TABLE:
        return tuple(_TABLE[key][:2])
    mm = bcq_mm if pw.fmt == "bcq" else uni_mm
    if act == "int8":
        x = jax.random.randint(jax.random.PRNGKey(0), (max(8, M), pw.Kp),
                               -127, 128, jnp.int8)
    else:
        x = jax.random.normal(jax.random.PRNGKey(0), (max(8, M), pw.Kp),
                              jnp.bfloat16)
    # the kernels' actual static defaults (qmatmul/_matmul_pallas and
    # bcq_matmul/_matmul_pallas differ: bitplanes expand bits-x in VMEM)
    if pw.fmt == "bcq":
        default = (1024, 1024) if M <= 64 else (512, 256)
    else:
        default = (2048, 1024) if M <= 64 else (512, 256)
    nbytes = (pw.Kp * pw.Np * pw.bits) / 8
    results: dict[tuple[int, int], float] = {}
    truncated = False
    for cand in dict.fromkeys([default] + CANDIDATES):
        if (deadline is not None and results
                and time.perf_counter() > deadline):
            log(f"  {pw.K}x{pw.N}: budget deadline, "
                f"{len(results)} candidates measured")
            truncated = True
            break
        c = _expand(*cand, pw)
        if c is None:
            continue
        tk, tn = c
        if tk == STREAMED:
            if pw.fmt == "bcq" or len(pw.words) != 1:
                continue
            fn = lambda a: _matmul_streamed(a, pw)
        else:
            fn = lambda a, tk=tk, tn=tn: mm(a, pw, tk, tn)
        try:
            t = _time_eager(fn, x)
        except Exception:  # noqa: BLE001 — tile invalid for this layout
            continue
        log(f"  {pw.K}x{pw.N} tk{tk} tn{tn}: {t*1e6:.1f} us "
            f"{nbytes/t/1e9:.0f} GB/s")
        results[(tk, tn)] = t
    if not results:
        return (0, 0)
    # chip timing is noisy and the shared chip sometimes returns garbage
    # (differenced chain times <= 0): any winner — INCLUDING the static
    # default — above ~1.3x the 819 GB/s HBM spec is an artifact; re-measure
    # once (keeping the slower reading) and drop it if it repeats
    best = min(results, key=results.get)
    while results and nbytes / results[best] / 1e9 > 1050:
        t2 = _time_eager(
            (lambda a: _matmul_streamed(a, pw)) if best[0] == STREAMED
            else (lambda a: mm(a, pw, *best)), x)
        results[best] = max(results[best], t2)
        if nbytes / results[best] / 1e9 > 1050:
            del results[best]
        if not results:
            # every reading implausible: persist the keep-default sentinel
            # so the sweep doesn't re-run every invocation — unless the
            # sweep was deadline-truncated (one garbage candidate must not
            # lock the shape to defaults on disk; retune with fresh budget)
            _TABLE[key] = (0, 0, 0.0)
            if truncated:
                _EPHEMERAL.add(key)
            else:
                _EPHEMERAL.discard(key)
                _save()
            return (0, 0)
        best = min(results, key=results.get)
    if default in results and best != default:
        if results[best] > 0.92 * results[default]:
            best = default
    gbps = round(nbytes / results[best] / 1e9, 1)
    _TABLE[key] = (*best, gbps)
    if truncated:
        _EPHEMERAL.add(key)
    else:
        _EPHEMERAL.discard(key)
        _save()
    log(f"autotune {key}: tk{best[0]} tn{best[1]} "
        f"({results[best]*1e6:.1f} us, {gbps} GB/s)")
    return best


def tune_model(params: dict, M: int = 8, log=print, act: str = "bf16",
               budget_s: float = 600.0) -> None:
    """Pre-tune every unique PackedWeight shape in a params pytree.

    budget_s caps total tuning wall time (compile-dominated on relayed
    chips); shapes past the budget keep the static default."""
    import jax

    from gptq_tpu.ops.pack import PackedWeight

    t0 = time.perf_counter()
    seen = set()
    for leaf in jax.tree.leaves(
            params, is_leaf=lambda x: isinstance(x, PackedWeight)):
        if not isinstance(leaf, PackedWeight):
            continue
        sig = (leaf.K, leaf.N, leaf.bits, leaf.groupsize, leaf.fmt)
        if sig in seen:
            continue
        seen.add(sig)
        if time.perf_counter() - t0 > budget_s:
            log(f"autotune budget exhausted; {sig} keeps defaults")
            continue
        tune_packed(leaf, M=M, log=log, act=act, deadline=t0 + budget_s)
