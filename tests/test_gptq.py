"""GPTQ solver tests.

The serial numpy oracle below re-derives the reference algorithm
(reference: gptq.py:126-309) column by column; the JAX solver's blocked
scan/fori formulation must reproduce it.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gptq_tpu.quant.gptq import (
    GPTQ,
    SolverConfig,
    gptq_quantize,
    hessian_init,
    hessian_update,
)
from gptq_tpu.quant.rtn import rtn_quantize_weight


def np_find_params(x, bits, sym=False):
    maxq = 2**bits - 1
    xmin = np.minimum(x.min(axis=1), 0)
    xmax = np.maximum(x.max(axis=1), 0)
    if sym:
        xmax = np.maximum(np.abs(xmin), xmax)
        xmin = np.where(xmin < 0, -xmax, xmin)
    degenerate = (xmin == 0) & (xmax == 0)
    xmin = np.where(degenerate, -1, xmin)
    xmax = np.where(degenerate, 1, xmax)
    scale = (xmax - xmin) / maxq
    zero = np.full_like(scale, (maxq + 1) / 2) if sym else np.round(-xmin / scale)
    return scale, zero


def np_quant(w, scale, zero, maxq):
    q = np.clip(np.round(w / scale) + zero, 0, maxq)
    return scale * (q - zero)


def np_gptq(W, H, bits, blocksize=128, percdamp=0.01, groupsize=-1, actorder=False,
            static_groups=False, sym=False):
    """Serial oracle of the reference inner loop (float64)."""
    W = W.astype(np.float64).copy()
    H = H.astype(np.float64).copy()
    rows, cols = W.shape
    maxq = 2**bits - 1
    dead = np.diag(H) == 0
    H[dead, dead] = 1
    W[:, dead] = 0

    groups = None
    if static_groups:
        groups = []
        for i in range(0, cols, groupsize):
            groups.append(np_find_params(W[:, i : i + groupsize], bits, sym))

    if actorder:
        perm = np.argsort(-np.diag(H), kind="stable")
        W = W[:, perm]
        H = H[perm][:, perm]
        invperm = np.argsort(perm, kind="stable")

    damp = percdamp * np.mean(np.diag(H))
    H[np.arange(cols), np.arange(cols)] += damp
    L = np.linalg.cholesky(H)
    Hinv_full = np.linalg.inv(L).T @ np.linalg.inv(L)
    Hinv = np.linalg.cholesky(Hinv_full).T  # upper factor

    if groupsize <= 0:
        scale, zero = np_find_params(W, bits, sym)

    Q = np.zeros_like(W)
    Losses = np.zeros_like(W)
    for i1 in range(0, cols, blocksize):
        i2 = min(i1 + blocksize, cols)
        count = i2 - i1
        W1 = W[:, i1:i2].copy()
        Q1 = np.zeros_like(W1)
        Err1 = np.zeros_like(W1)
        Hinv1 = Hinv[i1:i2, i1:i2]
        for i in range(count):
            w = W1[:, i]
            d = Hinv1[i, i]
            if groupsize > 0:
                if not static_groups:
                    if (i1 + i) % groupsize == 0:
                        scale, zero = np_find_params(
                            W[:, (i1 + i) : (i1 + i + groupsize)], bits, sym
                        )
                else:
                    idx = i1 + i
                    if actorder:
                        idx = perm[idx]
                    scale, zero = groups[idx // groupsize]
            q = np_quant(w, scale, zero, maxq)
            Q1[:, i] = q
            Losses[:, i1 + i] = (w - q) ** 2 / d**2 / 2
            err = (w - q) / d
            W1[:, i:] -= err[:, None] * Hinv1[i, i:][None, :]
            Err1[:, i] = err
        Q[:, i1:i2] = Q1
        W[:, i2:] -= Err1 @ Hinv[i1:i2, i2:]
    if actorder:
        Q = Q[:, invperm]
    return Q, Losses.sum()


def make_problem(rows=32, cols=64, nsamples=8, seed=0):
    rng = np.random.default_rng(seed)
    W = rng.normal(size=(rows, cols)).astype(np.float32)
    X = rng.normal(size=(nsamples, 16, cols)).astype(np.float32)
    state = hessian_init(cols)
    for i in range(nsamples):
        state = hessian_update(state, jnp.asarray(X[i : i + 1]))
    H = np.asarray(state[0])
    return W, H, state


@pytest.mark.parametrize(
    "kw",
    [
        dict(),
        dict(groupsize=16),
        dict(groupsize=16, static_groups=True),
        dict(actorder=True),
        dict(actorder=True, groupsize=16, static_groups=True),
        dict(actorder=True, groupsize=16),
        dict(sym=True),
        dict(blocksize=32),
    ],
    ids=["plain", "groups", "static", "actorder", "actorder+static",
         "actorder+dyngroups", "sym", "bs32"],
)
def test_solver_matches_serial_oracle(kw):
    W, H, _ = make_problem()
    bits = 4
    cfg = SolverConfig(mode="uniform", bits=bits, blocksize=kw.get("blocksize", 128),
                       groupsize=kw.get("groupsize", -1),
                       actorder=kw.get("actorder", False),
                       static_groups=kw.get("static_groups", False),
                       sym=kw.get("sym", False))
    out = gptq_quantize(jnp.asarray(W), jnp.asarray(H), cfg)
    Q_ref, loss_ref = np_gptq(W, H, bits, **kw)
    Q = np.asarray(out["Q"], dtype=np.float64)
    # identical up to f32-vs-f64 rounding: grid decisions may flip on
    # near-ties; require >=99% exact matches and tiny mean deviation
    match = np.isclose(Q, Q_ref, rtol=1e-4, atol=1e-5).mean()
    assert match > 0.99, f"only {match:.4f} of entries match the oracle"
    assert abs(float(out["loss"]) - loss_ref) / max(loss_ref, 1e-9) < 0.05


def test_identity_hessian_equals_rtn():
    """With H = I there is no error feedback: GPTQ == RTN on the same grid."""
    rng = np.random.default_rng(1)
    W = rng.normal(size=(16, 32)).astype(np.float32)
    H = np.eye(32, dtype=np.float32)
    cfg = SolverConfig(mode="uniform", bits=4)
    out = gptq_quantize(jnp.asarray(W), jnp.asarray(H), cfg)
    rtn = rtn_quantize_weight(jnp.asarray(W), bits=4)
    np.testing.assert_allclose(np.asarray(out["Q"]), np.asarray(rtn), atol=1e-5)


def test_gptq_beats_rtn_on_true_objective():
    """The key quality invariant: GPTQ's calibrated output error must beat
    RTN's on the calibration distribution (reference DEBUG check,
    gptq.py:278-282)."""
    rng = np.random.default_rng(2)
    rows, cols, n = 24, 48, 2048
    # correlated inputs make error feedback matter
    A = rng.normal(size=(cols, cols)).astype(np.float32)
    X = rng.normal(size=(n, cols)).astype(np.float32) @ (A / np.sqrt(cols))
    W = rng.normal(size=(rows, cols)).astype(np.float32)
    state = hessian_init(cols)
    state = hessian_update(state, jnp.asarray(X[None]))
    cfg = SolverConfig(mode="uniform", bits=3)
    out = gptq_quantize(jnp.asarray(W), state[0], cfg)
    rtn = np.asarray(rtn_quantize_weight(jnp.asarray(W), bits=3))
    err_gptq = np.sum((X @ (W - np.asarray(out["Q"])).T) ** 2)
    err_rtn = np.sum((X @ (W - rtn).T) ** 2)
    assert err_gptq < err_rtn


def test_dead_columns_are_zeroed():
    rng = np.random.default_rng(3)
    W = rng.normal(size=(8, 32)).astype(np.float32)
    X = rng.normal(size=(64, 32)).astype(np.float32)
    X[:, 5] = 0.0  # dead input channel
    state = hessian_update(hessian_init(32), jnp.asarray(X[None]))
    cfg = SolverConfig(mode="uniform", bits=4)
    out = gptq_quantize(jnp.asarray(W), state[0], cfg)
    assert bool(jnp.all(jnp.isfinite(out["Q"])))


def test_hessian_accumulation_matches_formula():
    """H must equal 2/N sum x x^T regardless of batching split
    (reference: gptq.py:59-65)."""
    rng = np.random.default_rng(4)
    X = rng.normal(size=(12, 7, 16)).astype(np.float32)
    state = hessian_init(16)
    for i in range(0, 12, 3):
        state = hessian_update(state, jnp.asarray(X[i : i + 3]))
    H = np.asarray(state[0])
    flat = X.reshape(-1, 16).astype(np.float64)
    H_ref = 2 / 12 * (flat.T @ flat) / 7 * 7  # 2/nbatches * mean over... see below
    # reference scaling: H = sum over batches of (2/n_running) x x^T with
    # rescale — telescopes to (2/N_total_batches) sum_tokens x x^T
    H_ref = 2 / 12 * (flat.T @ flat)
    np.testing.assert_allclose(H, H_ref, rtol=1e-4)


def test_nonpadded_columns():
    """cols not divisible by blocksize exercises the padding path."""
    rng = np.random.default_rng(5)
    W = rng.normal(size=(16, 200)).astype(np.float32)
    X = rng.normal(size=(128, 200)).astype(np.float32)
    state = hessian_update(hessian_init(200), jnp.asarray(X[None]))
    cfg = SolverConfig(mode="uniform", bits=4, blocksize=128)
    out = gptq_quantize(jnp.asarray(W), state[0], cfg)
    Q_ref, loss_ref = np_gptq(W, np.asarray(state[0]), 4)
    match = np.isclose(np.asarray(out["Q"]), Q_ref, rtol=1e-4, atol=1e-5).mean()
    assert match > 0.99


def test_lut_mode_runs():
    W, H, _ = make_problem(rows=16, cols=32)
    cfg = SolverConfig(mode="lut", bits=3, bcq_rounds=2)
    out = gptq_quantize(jnp.asarray(W), jnp.asarray(H), cfg)
    assert out["Q"].shape == (16, 32)
    assert out["alpha"].shape == (16, 1, 3)
    assert np.isfinite(float(out["loss"]))


def test_columnwise_mode_runs():
    W, H, _ = make_problem(rows=16, cols=32)
    cfg = SolverConfig(mode="columnwise", bits=3, bcq_rounds=2, blocksize=32)
    out = gptq_quantize(jnp.asarray(W), jnp.asarray(H), cfg)
    assert out["Q"].shape == (16, 32)
    assert np.isfinite(float(out["loss"]))


def test_nonlinear_mode_runs():
    W, H, state = make_problem(rows=16, cols=32)
    cfg = SolverConfig(mode="nonlinear", bits=3, hyperbits=5, explore_split=4)
    out = gptq_quantize(jnp.asarray(W), jnp.asarray(H), cfg, mean_input=state[2])
    assert out["Q"].shape == (16, 32)
    assert np.isfinite(float(out["loss"]))


def test_stateful_wrapper_and_analyse():
    rng = np.random.default_rng(6)
    W = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))
    g = GPTQ(W)
    g.add_batch(jnp.asarray(rng.normal(size=(2, 4, 16)).astype(np.float32)))
    assert g.nsamples == 2
    out = g.fasterquant(SolverConfig(bits=4))
    assert out["Q"].shape == (8, 16)
    st = g.analyse()
    assert st["rowwise"]["w"]["max"].shape == (8,)
    assert st["columnWise"]["wh"]["std"].shape == (16,)
    g.free()
