"""BCQ / shift quantizer tests (reference semantics: bcq_quant/)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gptq_tpu.quant.bcq import (
    BCQuantizer,
    additive_power_of_2,
    bcq_fit,
    bcq_quantize,
    binary_codebook,
    find_b,
    greedy_fit,
    quantize_shift,
    round_power_of_2,
)


def test_binary_codebook_order():
    bm = binary_codebook(2)
    np.testing.assert_array_equal(
        bm, [[1, 1], [1, -1], [-1, 1], [-1, -1]]
    )


def test_round_power_of_2():
    x = jnp.asarray([0.0, 1.0, 1.5, 3.0, -0.7, 0.25])
    got = np.asarray(round_power_of_2(x))
    # log2(1.5)=0.584 -> round 1 -> 2 ; log2(3)=1.58 -> round 2 -> 4
    np.testing.assert_allclose(got, [0.0, 1.0, 2.0, 4.0, -0.5, 0.25], atol=1e-7)


def test_additive_power_of_2_improves():
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.abs(rng.normal(size=(64,))).astype(np.float32))
    e1 = np.abs(np.asarray(additive_power_of_2(x, 1)) - np.asarray(x))
    e2 = np.abs(np.asarray(additive_power_of_2(x, 2)) - np.asarray(x))
    e3 = np.abs(np.asarray(additive_power_of_2(x, 3)) - np.asarray(x))
    assert e2.sum() <= e1.sum() + 1e-6
    assert e3.sum() <= e2.sum() + 1e-6


def test_find_b_optimal():
    """find_b must pick the elementwise-nearest +/-alpha combination."""
    rng = np.random.default_rng(1)
    d1, d2, k = 5, 33, 3
    w = rng.normal(size=(d1, d2)).astype(np.float32)
    alpha = np.sort(np.abs(rng.normal(size=(d1, k))).astype(np.float32), axis=1)[:, ::-1]
    B = np.asarray(find_b(jnp.asarray(w), jnp.asarray(alpha.copy())))
    got = np.einsum("ijl,il->ij", B, alpha)
    # brute force
    bm = binary_codebook(k)  # (2^k, k)
    levels = alpha @ bm.T  # (d1, 2^k)
    best = np.take_along_axis(
        levels, np.argmin(np.abs(w[..., None] - levels[:, None, :]), axis=-1), axis=1
    )
    np.testing.assert_allclose(np.abs(got - w), np.abs(best - w), atol=1e-5)


def test_greedy_fit_matches_oracle():
    rng = np.random.default_rng(2)
    w = rng.normal(size=(8, 64)).astype(np.float32)
    _, B, alpha = greedy_fit(jnp.asarray(w), n_bits=3)
    # oracle
    r = w.copy()
    for i in range(3):
        b = np.sign(r)
        a = np.abs(r).mean(axis=1)
        np.testing.assert_allclose(np.asarray(B)[:, :, i], b, atol=1e-6)
        np.testing.assert_allclose(np.asarray(alpha)[:, i], a, rtol=1e-5)
        r = r - b * a[:, None]


@pytest.mark.parametrize("use_bst", [True, False])
def test_refinement_reduces_error(use_bst):
    rng = np.random.default_rng(3)
    w = rng.normal(size=(16, 128)).astype(np.float32)
    wj = jnp.asarray(w)
    r0, _, _ = bcq_fit(wj, qbits=3, rounds=0)
    r5, _, _ = bcq_fit(wj, qbits=3, rounds=5, use_bst=use_bst)
    e0 = float(jnp.sum((wj - r0) ** 2))
    e5 = float(jnp.sum((wj - r5) ** 2))
    assert e5 <= e0 + 1e-5


def test_quantize_shift_alphas_are_apot():
    """Every returned alpha must be a sum of apot_nums signed powers of two."""
    rng = np.random.default_rng(4)
    w = jnp.asarray(rng.normal(size=(8, 64)).astype(np.float32))
    _, _, alpha = quantize_shift(w, qbits=3, rounds=3, apot_nums=2)
    a = np.asarray(alpha).ravel()
    snapped = np.asarray(additive_power_of_2(jnp.asarray(a), 2))
    np.testing.assert_allclose(a, snapped, rtol=1e-6)
    # descending order invariant (reference: bcq_quant/quantizer.py:75)
    a3 = np.asarray(alpha)
    assert np.all(np.diff(a3, axis=-1) <= 1e-7)


def test_quantize_shift_grouped_shapes():
    rng = np.random.default_rng(5)
    w = jnp.asarray(rng.normal(size=(8, 64)).astype(np.float32))
    ret, B, alpha = quantize_shift(w, qbits=2, rounds=2, group_size=16)
    assert ret.shape == (8, 64)
    assert B.shape == (8, 4, 16, 2)
    assert alpha.shape == (8, 4, 2)
    # reconstruction consistency: ret == sum_b alpha_b * B_b
    recon = np.einsum("ngkb,ngb->ngk", np.asarray(B), np.asarray(alpha)).reshape(8, 64)
    np.testing.assert_allclose(np.asarray(ret), recon, atol=1e-5)


def test_bcq_quantize_against_fixed_alpha():
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(8, 32)).astype(np.float32))
    q = BCQuantizer((8, 32), groupsize=-1, wbits=3, rounds=3)
    q.find_params(x)
    ret, B = q.quantize(x)
    assert ret.shape == (8, 32)
    assert B.shape == (8, 1, 32, 3)
    recon = np.einsum("ngkb,ngb->ngk", np.asarray(B), np.asarray(q.alpha)).reshape(8, 32)
    np.testing.assert_allclose(np.asarray(ret), recon, atol=1e-5)
    # quantizing with BST is at least as good elementwise-optimal vs greedy signs
    ret_g, _ = bcq_quantize(x, q.alpha, groupsize=-1, use_bst=False)
    e_bst = float(jnp.sum((x - ret) ** 2))
    e_greedy = float(jnp.sum((x - ret_g) ** 2))
    assert e_bst <= e_greedy + 1e-5
