"""Uniform quantizer unit tests (reference semantics: quant.py:6-131).

The torch reference algorithm is re-run here verbatim-in-math (via numpy)
as an independent oracle on random inputs.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gptq_tpu.quant.uniform import UniformQuantizer, find_params, quantize_uniform


def np_quantize(x, scale, zero, maxq):
    if maxq < 0:
        return (x > scale / 2) * scale + (x < zero / 2) * zero
    q = np.clip(np.round(x / scale) + zero, 0, maxq)
    return scale * (q - zero)


def np_find_params(x, bits, sym=False, trits=False):
    """Per-row min-max grid, the perchannel weight path."""
    maxq = -1 if trits else 2**bits - 1
    xmin = np.minimum(x.min(axis=1), 0)
    xmax = np.maximum(x.max(axis=1), 0)
    if sym:
        xmax = np.maximum(np.abs(xmin), xmax)
        xmin = np.where(xmin < 0, -xmax, xmin)
    degenerate = (xmin == 0) & (xmax == 0)
    xmin[degenerate] = -1
    xmax[degenerate] = 1
    if maxq < 0:
        return xmax, xmin
    scale = (xmax - xmin) / maxq
    zero = np.full_like(scale, (maxq + 1) / 2) if sym else np.round(-xmin / scale)
    return scale, zero


@pytest.mark.parametrize("bits", [2, 3, 4, 8])
@pytest.mark.parametrize("sym", [False, True])
def test_find_params_matches_oracle(bits, sym):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(16, 64)).astype(np.float32)
    p = find_params(jnp.asarray(x), bits=bits, perchannel=True, sym=sym, weight=True)
    scale, zero = np_find_params(x, bits, sym=sym)
    np.testing.assert_allclose(np.asarray(p.scale)[:, 0], scale, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(p.zero)[:, 0], zero, rtol=1e-6)


def test_quantize_roundtrip_exact_gridpoints():
    """Values already on the grid must be fixed points."""
    bits = 4
    rng = np.random.default_rng(1)
    x = rng.normal(size=(8, 32)).astype(np.float32)
    p = find_params(jnp.asarray(x), bits=bits, perchannel=True, weight=True)
    q1 = quantize_uniform(jnp.asarray(x), p.scale, p.zero, 2**bits - 1)
    q2 = quantize_uniform(q1, p.scale, p.zero, 2**bits - 1)
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), atol=1e-6)


def test_quantize_matches_oracle():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(8, 32)).astype(np.float32)
    scale, zero = np_find_params(x, 3)
    got = quantize_uniform(
        jnp.asarray(x), jnp.asarray(scale)[:, None], jnp.asarray(zero)[:, None], 7
    )
    want = np_quantize(x, scale[:, None], zero[:, None], 7)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_trits_branch():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(4, 16)).astype(np.float32)
    p = find_params(jnp.asarray(x), bits=2, trits=True, perchannel=True, weight=True)
    got = quantize_uniform(jnp.asarray(x), p.scale, p.zero, -1)
    scale, zero = np_find_params(x, 2, trits=True)
    want = np_quantize(x, scale[:, None], zero[:, None], -1)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)
    # ternary: at most 3 distinct values per row
    for r in np.asarray(got):
        assert len(np.unique(r)) <= 3


def test_mse_search_not_worse():
    """The MSE grid-shrink must not increase quantization error."""
    rng = np.random.default_rng(4)
    x = rng.standard_t(df=2, size=(8, 256)).astype(np.float32)  # heavy tails
    xj = jnp.asarray(x)
    base = find_params(xj, bits=3, perchannel=True, weight=True)
    tuned = find_params(xj, bits=3, perchannel=True, mse=True, weight=True)
    e0 = np.sum(np.abs(np.asarray(quantize_uniform(xj, base.scale, base.zero, 7)) - x) ** 2.4)
    e1 = np.sum(np.abs(np.asarray(quantize_uniform(xj, tuned.scale, tuned.zero, 7)) - x) ** 2.4)
    assert e1 <= e0 + 1e-3


def test_degenerate_all_zero_row():
    x = jnp.zeros((4, 16))
    p = find_params(x, bits=4, perchannel=True, weight=True)
    q = quantize_uniform(x, p.scale, p.zero, 15)
    assert bool(jnp.all(jnp.isfinite(q)))
    np.testing.assert_allclose(np.asarray(q), 0.0, atol=1e-6)


def test_pertensor_path():
    rng = np.random.default_rng(5)
    x = rng.normal(size=(8, 32)).astype(np.float32)
    p = find_params(jnp.asarray(x), bits=4, perchannel=False, weight=True)
    assert p.scale.shape == (8, 1)
    assert len(np.unique(np.asarray(p.scale))) == 1


def test_wrapper_class():
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(8, 32)).astype(np.float32))
    q = UniformQuantizer(bits=4, perchannel=True)
    q.find_params(x)
    assert q.ready()
    y = q.quantize(x)
    assert float(jnp.max(jnp.abs(y - x))) < float(jnp.max(jnp.abs(x)))
