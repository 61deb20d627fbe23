"""Binary-coding quantization (BCQ) and additive-power-of-2 "shift" variant.

TPU-native re-design of the reference's torch implementation
(reference: bcq_quant/bcq.py, bcq_quant/bcq_shift.py). W ~= sum_b alpha_b * B_b
with B in {-1, +1}. The alternating refinement (batched CG for alpha, sorted
binary-search for B) is expressed as `lax.scan` so the whole fit is one XLA
program; the 2^k codebook enumeration is a static numpy table.

All functions are pure; nothing is moved between devices (the reference
hard-codes `.cuda()` at bcq_shift.py:102 — here placement is the caller's).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def binary_codebook(n_bits: int) -> np.ndarray:
    """All 2^n sign vectors, ordered as the reference's recursive construction
    (reference: bcq.py:140-144): entry 0 = [+1..+1], entry 2^n-1 = [-1..-1],
    with the first coordinate varying slowest."""
    vecs = [[]]
    for _ in range(n_bits):
        vecs = [[1.0] + v for v in vecs] + [[-1.0] + v for v in vecs]
    return np.asarray(vecs, dtype=np.float32)


def find_b(w: jax.Array, alpha: jax.Array) -> jax.Array:
    """Optimal sign assignment via sorted binary search (reference: bcq.py:146-170).

    w: (d1, d2) values; alpha: (d1, k) nonnegative magnitudes.
    Returns B: (d1, d2, k) in {-1, +1} minimizing |w - B.alpha| elementwise.
    """
    k = alpha.shape[-1]
    bin_mat = jnp.asarray(binary_codebook(k))  # (2^k, k)
    v = alpha @ bin_mat.T  # (d1, 2^k) candidate reconstruction levels
    order = jnp.argsort(v, axis=1)
    v_sorted = jnp.take_along_axis(v, order, axis=1)

    d1, d2 = w.shape
    left = jnp.zeros((d1, d2), dtype=jnp.int32)
    right = jnp.full((d1, d2), (1 << k) - 1, dtype=jnp.int32)
    for _ in range(k):
        mid_left = (left + right - 1) // 2  # left<=right-1 here, so nonnegative
        mid_right = mid_left + 1
        lo = jnp.take_along_axis(v_sorted, mid_left, axis=1)
        hi = jnp.take_along_axis(v_sorted, mid_right, axis=1)
        mid_vals = (lo + hi) / 2
        go_left = w < mid_vals
        right = jnp.where(go_left, mid_left, right)
        left = jnp.where(go_left, left, mid_right)
    assignment = jnp.take_along_axis(order, left, axis=1)  # (d1, d2)
    return bin_mat[assignment]  # (d1, d2, k)


def greedy_fit(w: jax.Array, n_bits: int, wf: jax.Array | None = None):
    """Greedy residual-sign initialization (reference: bcq.py:85-110).

    Returns (w_hat, B (d1,d2,k), alpha (d1,k))."""
    r = w
    w_hat = jnp.zeros_like(w)
    bs, alphas = [], []
    for _ in range(n_bits):
        b = jnp.sign(r)
        if wf is not None:
            num = jnp.sum(jnp.abs(r) * wf, axis=1)
            den = jnp.sum(wf, axis=1)
            alpha = jnp.where(den > 0, num / den, 0.0)
        else:
            alpha = jnp.mean(jnp.abs(r), axis=1)
        r = r - b * alpha[:, None]
        w_hat = w_hat + b * alpha[:, None]
        bs.append(b)
        alphas.append(alpha)
    return w_hat, jnp.stack(bs, axis=-1), jnp.stack(alphas, axis=-1)


def batch_cg(A: jax.Array, b: jax.Array, x0: jax.Array) -> jax.Array:
    """Batched conjugate gradient, k iterations (reference: bcq.py:172-191)."""
    k = A.shape[-1]
    x = x0[..., None]
    bb = b[..., None]
    r = bb - A @ x
    rtr_new = jnp.swapaxes(r, -1, -2) @ r
    p = r

    def step(carry, _):
        x, r, p, rtr_new = carry
        rtr = rtr_new
        Ap = A @ p
        a = rtr / (jnp.swapaxes(p, -1, -2) @ Ap + 1e-6)
        x = x + a * p
        r = r - a * Ap
        rtr2 = jnp.swapaxes(r, -1, -2) @ r
        beta = rtr2 / (rtr + 1e-6)
        p = r + beta * p
        return (x, r, p, rtr2), None

    (x, _, _, _), _ = jax.lax.scan(step, (x, r, p, rtr_new), None, length=k)
    return x[..., 0]


def _refine(w, B, alpha, use_bst: bool, apot_nums: int | None, wf=None):
    """One alternating-refinement round (reference: bcq.py:112-138 /
    bcq_shift.py:199-232). apot_nums=None -> plain BCQ alpha; otherwise the
    alphas are snapped to sums of `apot_nums` signed powers of two."""
    Bt = jnp.swapaxes(B, -1, -2)  # (d1, k, d2)
    if wf is not None:
        Bt = Bt * wf[:, None, :]
    B_cov = Bt @ B  # (d1, k, k)
    Btw = (Bt @ w[..., None])[..., 0]  # (d1, k)
    alpha_new = batch_cg(B_cov, Btw, alpha)
    alpha_new = -jnp.sort(-jnp.abs(alpha_new), axis=-1)  # descending magnitudes
    if apot_nums is not None:
        alpha_new = additive_power_of_2(alpha_new, apot_nums)
    if use_bst:
        B_new = find_b(w, alpha_new)
        if wf is not None:
            B_new = B_new * (wf != 0.0)[..., None]
    else:
        r = w
        cols = []
        for i in range(B.shape[-1]):
            b = jnp.sign(r)
            r = r - b * alpha_new[:, i : i + 1]
            cols.append(b)
        B_new = jnp.stack(cols, axis=-1)
    w_hat = jnp.einsum("ijl,il->ij", B_new, alpha_new)
    return w_hat, B_new, alpha_new


def round_power_of_2(x: jax.Array) -> jax.Array:
    """Snap to the nearest (in log space) signed power of two
    (reference: bcq_shift.py:15-39). round(log2|x|) with x=0 -> 0."""
    sign = jnp.sign(x)
    shift = jnp.round(jnp.log2(jnp.abs(x)))
    return jnp.exp2(shift) * sign


def additive_power_of_2(x: jax.Array, nums: int = 2) -> jax.Array:
    """Greedy decomposition into `nums` signed powers of two
    (reference: bcq_shift.py:41-48)."""
    out = round_power_of_2(x)
    for _ in range(nums - 1):
        out = out + round_power_of_2(x - out)
    return out


@partial(jax.jit, static_argnames=("qbits", "rounds", "group_size", "use_bst", "apot_nums", "apot"))
def _fit(w, qbits, rounds, group_size, use_bst, apot_nums, apot):
    orig_shape = w.shape
    gs = group_size if group_size > 0 else orig_shape[-1]
    wg = w.reshape(-1, gs).astype(jnp.float32)
    wf = jnp.ones_like(wg)

    ret, B, alpha = greedy_fit(wg, qbits, wf=wf)
    if rounds > 0 and qbits > 1:
        nums = apot_nums if apot else None

        def round_step(carry, _):
            _, B, alpha = carry
            return _refine(wg, B, alpha, use_bst=use_bst, apot_nums=nums, wf=wf), None

        (ret, B, alpha), _ = jax.lax.scan(round_step, (ret, B, alpha), None, length=rounds)

    if apot:
        # shift variant recomputes the reconstruction from (B, alpha)
        # (reference: bcq_shift.py:149)
        ret = jnp.einsum("ijl,il->ij", B, alpha)
    ret = ret.reshape(orig_shape)
    B = B.reshape(orig_shape[0], orig_shape[1] // gs, gs, qbits)
    alpha = alpha.reshape(orig_shape[0], orig_shape[1] // gs, qbits)
    return ret, B, alpha


def quantize_shift(
    w: jax.Array,
    qbits: int,
    rounds: int = 15,
    group_size: int = -1,
    use_bst: bool = True,
    apot_nums: int = 1,
):
    """BCQ fit with additive-power-of-2 alphas (reference: bcq_shift.py:82-165).

    w: (N, K). Returns (ret, B (N,K/g,g,b), alpha (N,K/g,b))."""
    return _fit(w, qbits, rounds, group_size, use_bst, apot_nums, apot=True)


def bcq_fit(
    w: jax.Array,
    qbits: int,
    rounds: int = 15,
    group_size: int = -1,
    use_bst: bool = True,
):
    """Plain BCQ fit (reference: bcq.py:8-83, unit weighting path)."""
    return _fit(w, qbits, rounds, group_size, use_bst, apot_nums=1, apot=False)


@partial(jax.jit, static_argnames=("groupsize", "use_bst"))
def bcq_quantize(x: jax.Array, alpha: jax.Array, groupsize: int = -1, use_bst: bool = True):
    """Quantize ``x`` against fixed per-group alphas (reference:
    bcq_quant/quantizer.py:8-36). x: (N, K); alpha: (N, K//g, b).
    Returns (ret (N,K), B (N, K//g, g, b))."""
    N, K = x.shape
    b = alpha.shape[-1]
    gs = groupsize if groupsize > 0 else K
    ng = K // gs
    xg = x.reshape(N * ng, gs).astype(jnp.float32)
    ag = alpha.reshape(N * ng, b).astype(jnp.float32)
    if use_bst:
        B = find_b(xg, ag)
    else:
        r = xg
        cols = []
        for i in range(b):
            s = jnp.sign(r)
            r = r - s * ag[:, i : i + 1]
            cols.append(s)
        B = jnp.stack(cols, axis=-1)
    ret = jnp.einsum("ijl,il->ij", B, ag).reshape(N, K)
    return ret, B.reshape(N, ng, gs, b)


class BCQuantizer:
    """Driver-facing wrapper (reference: bcq_quant/quantizer.py:39-84)."""

    def __init__(self, shape, groupsize=-1, wbits=3, rounds=5, use_bst=True, apot_nums=1):
        self.wbits = wbits
        self.groupsize = groupsize
        self.rounds = rounds
        self.use_bst = use_bst
        self.apot_nums = apot_nums
        N, K = shape
        self.num_groups = 1 if groupsize == -1 else K // groupsize
        self.alpha = None

    def find_params(self, x: jax.Array) -> jax.Array:
        _, _, self.alpha = quantize_shift(
            x,
            qbits=self.wbits,
            rounds=self.rounds,
            group_size=self.groupsize,
            use_bst=self.use_bst,
            apot_nums=self.apot_nums,
        )
        return self.alpha

    def quantize(self, x: jax.Array):
        if not self.ready():
            self.find_params(x)
        return bcq_quantize(x, self.alpha, self.groupsize)

    def ready(self) -> bool:
        return self.alpha is not None
