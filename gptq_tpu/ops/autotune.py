"""Kernel tile autotuning.

Tile choice moves the fused dequant-matmul between ~400 and ~800 GB/s
effective on the same shape (chip-measured), and the best tile differs by
shape. Tuning must happen EAGERLY (a traced kernel cannot time itself), so
callers pre-tune the unique (K, N) shapes of a model once —
`tune_packed_shapes` — and `best_tiles` serves the table to dequant_matmul
at trace time. Results persist to results/autotune.json keyed by shape,
format and backend, so a model's second run skips tuning.

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

_TABLE: dict[str, tuple[int, int]] = {}
_LOADED = False
_PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "results", "autotune.json")

# candidate (tk, tn) tiles for decode-shape (small M) matmuls. Each
# candidate costs two kernel compiles (~1 min on a relayed chip), so the
# list is small; results persist, so the cost is once per shape.
CANDIDATES = [(2048, 512), (1024, 1024), (4096, 512), (1024, 2048)]


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
            json.dump({k: list(v) for k, v in _TABLE.items()}, f, indent=1)
    except OSError:
        pass


def best_tiles(K: int, N: int, bits: int, groupsize: int, fmt: str,
               M: int, act: str = "bf16") -> tuple[int, int] | None:
    """Tuned (tk, tn) for this shape, or None for the built-in default."""
    _load()
    return _TABLE.get(_key(K, N, bits, groupsize, fmt, M, act))


def _time_eager(fn, x, iters: int = 64, reps: int = 3) -> float:
    """Chained on-device timing (see kernel_bench.chained_seconds)."""
    from gptq_tpu.ops.kernel_bench import chained_seconds

    return chained_seconds(fn, x, iters=iters, reps=reps)


def tune_packed(pw, M: int = 8, log=lambda s: None,
                act: str = "bf16") -> tuple[int, int]:
    """Measure CANDIDATES for one PackedWeight shape; persist and return
    the winner."""
    import jax
    import jax.numpy as jnp

    from gptq_tpu.ops.bcq_matmul import _matmul_pallas as bcq_mm
    from gptq_tpu.ops.qmatmul import _matmul_pallas as uni_mm

    _load()
    key = _key(pw.K, pw.N, pw.bits, pw.groupsize, pw.fmt, M, act)
    if key in _TABLE:
        return _TABLE[key]
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
    results: dict[tuple[int, int], float] = {}
    for tk, tn in dict.fromkeys([default] + CANDIDATES):
        if pw.Kp % tk or pw.Np % tn:
            continue
        try:
            t = _time_eager(lambda c, tk=tk, tn=tn: mm(c, pw, tk, tn), x)
        except Exception:  # noqa: BLE001 — tile invalid for this layout
            continue
        log(f"  {pw.K}x{pw.N} tk{tk} tn{tn}: {t*1e6:.1f} us")
        results[(tk, tn)] = t
    if not results:
        return (0, 0)
    best = min(results, key=results.get)
    # chip timing is noisy: only override the static default when the
    # winner is clearly (>8%) faster than the default's own measurement
    if default in results and best != default:
        if results[best] > 0.92 * results[default]:
            best = default
    _TABLE[key] = best
    _save()
    log(f"autotune {key}: tk{best[0]} tn{best[1]} "
        f"({results[best]*1e6:.1f} us)")
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
        tune_packed(leaf, M=M, log=log, act=act)
