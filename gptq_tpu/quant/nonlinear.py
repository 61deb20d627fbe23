"""Non-linear (non-uniform grid) quantization.

Re-design of the reference's exhaustive codebook search
(reference: nonLinear_quant.py). A weight is first mapped to a wide uniform
"hyper" grid of 2^hyperbits levels, then snapped to the best 2^wbits-point
non-uniform sub-grid. Candidate codebooks are the center level +/- all
combinations of `wbits` distinct powers of two out of
{2^(hyperbits-2) .. 2^-1} (reference: nonLinear_quant.py:40-53); the search
sweeps `exploreSplit+1` scales between the (hyperbits+exploreBits)-bit and
(hyperbits-exploreBits)-bit grid steps.

The torch version loops codebooks x scales in Python with an OOM-fallback
argmin (reference: nonLinear_quant.py:55-77); here the whole search is a
single vectorized argmin over a static (n_choices, 2^wbits) table.
"""

from __future__ import annotations

from functools import partial
from itertools import combinations

import jax
import jax.numpy as jnp
import numpy as np


def all_codebooks(hyperbits: int, wbits: int) -> np.ndarray:
    """Static table of candidate codebooks, shape (n_choices, 2^wbits)
    (reference: nonLinear_quant.py:40-53). Values live on the hyper grid
    index scale, centered at (2^hyperbits - 1)/2."""
    powers = [2.0 ** i for i in range(hyperbits - 2, -2, -1)]
    center = (2.0 ** hyperbits - 1) / 2
    books = []
    for combo in combinations(powers, wbits):
        levels = [center]
        for a in combo:
            levels = [lv + a for lv in levels] + [lv - a for lv in levels]
        books.append(levels)
    return np.asarray(books, dtype=np.float32)


def _hyper_quantize(x, scale, zero, maxq):
    """Map to hyper-grid indices (reference: nonLinear_quant.py:29-33)."""
    return jnp.clip(jnp.round((x - zero[:, None]) / scale[:, None]), 0, maxq)


def _dequantize(q, scale, zero):
    return scale[:, None] * q + zero[:, None]


def _snap(q, codebook):
    """Snap each hyper-grid index to the nearest codebook level.
    q: (N, K); codebook: (L,). Vectorized argmin over L."""
    d = jnp.abs(q[..., None] - codebook)  # (N, K, L)
    return codebook[jnp.argmin(d, axis=-1)]


@partial(jax.jit, static_argnames=("wbits", "hyperbits", "explore_bits", "explore_split", "use_input"))
def nonlinear_find_params(
    x: jax.Array,
    wbits: int,
    hyperbits: int,
    explore_bits: int = 1,
    explore_split: int = 20,
    inp: jax.Array | None = None,
    use_input: bool = False,
):
    """Exhaustive (codebook x scale) search minimizing MSE of W (or W @ input)
    (reference: nonLinear_quant.py:98-145). x: (N, K) weight.

    Returns (scale (N,), zero (N,), codebook (2^wbits,), maxq)."""
    books = jnp.asarray(all_codebooks(hyperbits, wbits))  # (C, L)
    x = x.astype(jnp.float32)
    maxq = (1 << hyperbits) - 1

    zeros_row = jnp.zeros((x.shape[0],), dtype=x.dtype)
    xmin = jnp.minimum(x.min(axis=1), zeros_row)
    xmax = jnp.maximum(x.max(axis=1), zeros_row)
    base_scale = (xmax - xmin) / maxq
    zero = jnp.round(xmin / base_scale) * base_scale  # dequant-domain zero
    scale_down = (xmax - xmin) / (2.0 ** (hyperbits + explore_bits) - 1)
    scale_up = (xmax - xmin) / (2.0 ** (hyperbits - explore_bits) - 1)
    step = (scale_up - scale_down) / explore_split

    def eval_one(carry, cs):
        best_loss, best_choice, best_scale = carry
        choice_idx, split_idx = cs
        scale = scale_down + step * split_idx
        codebook = books[choice_idx]
        q = _hyper_quantize(x, scale, zero, maxq)
        q = _snap(q, codebook)
        dq = _dequantize(q, scale, zero)
        if use_input:
            loss = jnp.mean((x @ inp - dq @ inp) ** 2)
        else:
            loss = jnp.mean((x - dq) ** 2)
        better = loss < best_loss
        return (
            jnp.where(better, loss, best_loss),
            jnp.where(better, choice_idx, best_choice),
            jnp.where(better, scale, best_scale),
        ), None

    n_choices = books.shape[0]
    choice_ids = jnp.repeat(jnp.arange(n_choices), explore_split + 1)
    split_ids = jnp.tile(jnp.arange(explore_split + 1, dtype=jnp.float32), n_choices)
    init = (jnp.asarray(jnp.inf, jnp.float32), jnp.asarray(0, jnp.int32), base_scale)
    (_, best_choice, best_scale), _ = jax.lax.scan(
        eval_one, init, (choice_ids.astype(jnp.int32), split_ids)
    )
    return best_scale, zero, books[best_choice]


def nonlinear_quantize(x, scale, zero, codebook, hyperbits: int):
    """Quantize-dequantize against a fitted non-uniform grid
    (reference: nonLinear_quant.py:147-154)."""
    maxq = (1 << hyperbits) - 1
    q = _hyper_quantize(x.astype(jnp.float32), scale, zero, maxq)
    q = _snap(q, codebook)
    return _dequantize(q, scale, zero)


class NonLinearQuantizer:
    """Driver-facing wrapper (reference: nonLinear_quant.py:79-160)."""

    def __init__(self, wbits=3, hyperbits=5, explore_bits=1, explore_split=20):
        self.wbits = wbits
        self.hyperbits = hyperbits
        self.explore_bits = explore_bits
        self.explore_split = explore_split
        self.scale = None
        self.zero = None
        self.codebook = None

    def find_params(self, x: jax.Array, inp: jax.Array | None = None):
        self.scale, self.zero, self.codebook = nonlinear_find_params(
            x,
            self.wbits,
            self.hyperbits,
            self.explore_bits,
            self.explore_split,
            inp=inp,
            use_input=inp is not None,
        )

    def quantize(self, x: jax.Array) -> jax.Array:
        if not self.ready():
            raise ValueError("Quantizer not ready.")
        return nonlinear_quantize(x, self.scale, self.zero, self.codebook, self.hyperbits)

    def ready(self) -> bool:
        return self.scale is not None
