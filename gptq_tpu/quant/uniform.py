"""Uniform (and ternary) min-max / MSE-searched quantization grids.

Functional JAX re-design of the reference's stateful ``Quantizer``
(reference: quant.py:6-131). Parameters are explicit pytrees instead of
registered buffers; the MSE grid-shrink search is a `lax.scan` over shrink
candidates instead of a Python loop so the whole find_params is one XLA
program.

Grid semantics (identical to reference):
    q(x)  = scale * (clamp(round(x/scale) + zero, 0, maxq) - zero)
    trits = maxq < 0 branch: q(x) = (x > scale/2)*scale + (x < zero/2)*zero
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp


def quantize_uniform(x: jax.Array, scale: jax.Array, zero: jax.Array, maxq) -> jax.Array:
    """Quantize-dequantize ``x`` on a uniform grid (reference: quant.py:6-10).

    ``maxq`` may be a python int or a scalar array; ``maxq < 0`` selects the
    ternary ("trits") branch where scale/zero hold xmax/xmin directly.
    """
    def _trits(_):
        return (x > scale / 2).astype(x.dtype) * scale + (x < zero / 2).astype(
            x.dtype
        ) * zero

    def _grid(_):
        q = jnp.clip(jnp.round(x / scale) + zero, 0, jnp.asarray(maxq, x.dtype))
        return scale * (q - zero)

    # maxq is static in practice (config-derived); keep a lax.cond so traced
    # scalars also work (e.g. when vmapped over mixed-precision configs).
    try:
        static_maxq = int(maxq)  # concrete
        return _trits(None) if static_maxq < 0 else _grid(None)
    except (jax.errors.TracerIntegerConversionError, jax.errors.ConcretizationTypeError):
        return jax.lax.cond(maxq < 0, _trits, _grid, None)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class UniformParams:
    """Grid parameters: ``scale``/``zero`` broadcastable against the tensor."""

    scale: jax.Array
    zero: jax.Array

    def quantize(self, x: jax.Array, maxq) -> jax.Array:
        return quantize_uniform(x, self.scale, self.zero, maxq)


@partial(
    jax.jit,
    static_argnames=(
        "bits", "perchannel", "sym", "mse", "norm", "grid", "maxshrink",
        "trits", "weight",
    ),
)
def find_params(
    x: jax.Array,
    bits: int,
    perchannel: bool = True,
    sym: bool = False,
    mse: bool = False,
    norm: float = 2.4,
    grid: int = 100,
    maxshrink: float = 0.8,
    trits: bool = False,
    weight: bool = True,
) -> UniformParams:
    """Compute (scale, zero) for ``x`` (reference: quant.py:37-119).

    For ``weight=True`` inputs, x is (rows, cols...) and per-channel means
    per-row; the returned scale/zero have shape (rows, 1, ..) so they
    broadcast against x. For activations the reference's transposed layouts
    are replicated.
    """
    maxq = -1 if trits else (1 << bits) - 1
    shape = x.shape
    x = x.astype(jnp.float32)

    if perchannel:
        if weight:
            flat = x.reshape(shape[0], -1)
        else:
            if x.ndim == 4:
                flat = jnp.transpose(x, (1, 0, 2, 3)).reshape(shape[1], -1)
            elif x.ndim == 3:
                flat = x.reshape(-1, shape[-1]).T
            elif x.ndim == 2:
                flat = x.T
            else:
                flat = x.reshape(1, -1)
    else:
        flat = x.reshape(1, -1)

    zeros_row = jnp.zeros((flat.shape[0],), dtype=flat.dtype)
    xmin = jnp.minimum(flat.min(axis=1), zeros_row)
    xmax = jnp.maximum(flat.max(axis=1), zeros_row)

    if sym:
        xmax = jnp.maximum(jnp.abs(xmin), xmax)
        xmin = jnp.where(xmin < 0, -xmax, xmin)
    degenerate = (xmin == 0) & (xmax == 0)
    xmin = jnp.where(degenerate, -1.0, xmin)
    xmax = jnp.where(degenerate, 1.0, xmax)

    if maxq < 0:  # ternary: scale/zero hold xmax/xmin (reference: quant.py:69-71)
        scale = xmax
        zero = xmin
    else:
        scale = (xmax - xmin) / maxq
        if sym:
            zero = jnp.full_like(scale, (maxq + 1) / 2)
        else:
            zero = jnp.round(-xmin / scale)

        if mse:
            nsteps = int(maxshrink * grid)

            def step(best, i):
                best_err, best_scale, best_zero = best
                p = 1.0 - i / grid
                xmin1 = p * xmin
                xmax1 = p * xmax
                scale1 = (xmax1 - xmin1) / maxq
                zero1 = zero if sym else jnp.round(-xmin1 / scale1)
                q = quantize_uniform(flat, scale1[:, None], zero1[:, None], maxq)
                err = jnp.sum(jnp.abs(q - flat) ** norm, axis=1)
                better = err < best_err
                return (
                    jnp.where(better, err, best_err),
                    jnp.where(better, scale1, best_scale),
                    jnp.where(better, zero1, best_zero),
                ), None

            init = (jnp.full_like(scale, jnp.inf), scale, zero)
            (_, scale, zero), _ = jax.lax.scan(
                step, init, jnp.arange(nsteps, dtype=jnp.float32)
            )

    if not perchannel:
        if weight:
            rep = shape[0]
        else:
            rep = shape[1] if len(shape) != 3 else shape[2]
        scale = jnp.repeat(scale, rep)
        zero = jnp.repeat(zero, rep)

    if weight:
        out_shape = (-1,) + (1,) * (len(shape) - 1)
        return UniformParams(scale.reshape(out_shape), zero.reshape(out_shape))
    if len(shape) == 4:
        return UniformParams(scale.reshape(1, -1, 1, 1), zero.reshape(1, -1, 1, 1))
    if len(shape) == 3:
        return UniformParams(scale.reshape(1, 1, -1), zero.reshape(1, 1, -1))
    return UniformParams(scale[None, :], zero[None, :])


@dataclass
class UniformQuantizer:
    """Convenience wrapper mirroring the reference Quantizer's configure/
    find_params/quantize flow (reference: quant.py:12-131) for driver code;
    the underlying math is the functional API above."""

    bits: int = 4
    perchannel: bool = True
    sym: bool = False
    mse: bool = False
    norm: float = 2.4
    grid: int = 100
    maxshrink: float = 0.8
    trits: bool = False
    params: UniformParams | None = None

    @property
    def maxq(self) -> int:
        return -1 if self.trits else (1 << self.bits) - 1

    def find_params(self, x: jax.Array, weight: bool = True) -> UniformParams:
        self.params = find_params(
            x,
            bits=self.bits,
            perchannel=self.perchannel,
            sym=self.sym,
            mse=self.mse,
            norm=self.norm,
            grid=self.grid,
            maxshrink=self.maxshrink,
            trits=self.trits,
            weight=weight,
        )
        return self.params

    def quantize(self, x: jax.Array) -> jax.Array:
        if not self.ready():
            return x
        return quantize_uniform(x, self.params.scale, self.params.zero, self.maxq)

    def ready(self) -> bool:
        return self.params is not None and bool(jnp.all(self.params.scale != 0))
