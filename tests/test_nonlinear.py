"""Non-linear (non-uniform grid) quantizer tests (reference: nonLinear_quant.py)."""

import jax.numpy as jnp
import numpy as np
from itertools import combinations

from gptq_tpu.quant.nonlinear import (
    NonLinearQuantizer,
    all_codebooks,
    nonlinear_find_params,
    nonlinear_quantize,
)


def test_codebook_table_matches_reference_construction():
    """reference: nonLinear_quant.py:40-53."""
    hyperbits, wbits = 5, 3
    books = all_codebooks(hyperbits, wbits)
    powers = [2.0**i for i in range(hyperbits - 2, -2, -1)]
    assert books.shape == (len(list(combinations(powers, wbits))), 2**wbits)
    # spot-check first combo (8, 4, 2): center 15.5 +/- combinations
    first = sorted(books[0].tolist())
    center = (2**hyperbits - 1) / 2
    want = sorted(
        center + s1 * 8 + s2 * 4 + s3 * 2
        for s1 in (1, -1)
        for s2 in (1, -1)
        for s3 in (1, -1)
    )
    np.testing.assert_allclose(first, want)


def test_quantize_uses_only_codebook_levels():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, 64)).astype(np.float32))
    scale, zero, book = nonlinear_find_params(x, wbits=3, hyperbits=5, explore_split=4)
    dq = nonlinear_quantize(x, scale, zero, book, hyperbits=5)
    # every dequantized value must be scale*level + zero for some level
    got = (np.asarray(dq) - np.asarray(zero)[:, None]) / np.asarray(scale)[:, None]
    lv = np.asarray(book)
    dist = np.min(np.abs(got[..., None] - lv), axis=-1)
    assert dist.max() < 1e-3


def test_nonlinear_beats_naive_3bit_uniform():
    """The searched non-uniform grid should beat a plain 3-bit uniform grid
    on gaussian weights (that is its purpose)."""
    from gptq_tpu.quant.rtn import rtn_quantize_weight

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(16, 256)).astype(np.float32))
    q = NonLinearQuantizer(wbits=3, hyperbits=5, explore_split=10)
    q.find_params(x)
    dq = q.quantize(x)
    e_nl = float(jnp.mean((x - dq) ** 2))
    e_u = float(jnp.mean((x - rtn_quantize_weight(x, bits=3)) ** 2))
    assert e_nl < e_u * 1.05  # at least competitive, typically better


def test_input_weighted_loss_path():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(8, 32)).astype(np.float32))
    inp = jnp.asarray(np.abs(rng.normal(size=(32,))).astype(np.float32))
    scale, zero, book = nonlinear_find_params(
        x, wbits=2, hyperbits=4, explore_split=4, inp=inp, use_input=True
    )
    assert scale.shape == (8,)
    assert book.shape == (4,)
