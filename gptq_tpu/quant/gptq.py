"""Layer-wise second-order (GPTQ) quantization solver, TPU-native.

Re-design of the reference solver (reference: gptq.py:23-318) as one XLA
program per layer:

  * Hessian accumulation H = sum (2/n) x x^T with running rescale
    (reference: gptq.py:38-65) is a single f32 HIGHEST-precision matmul per
    calibration batch (the reference disables TF32 at gptq.py:18-19 for the
    same reason).
  * damped Cholesky -> inverse -> upper Cholesky factor
    (reference: gptq.py:174-180) via jnp.linalg.cholesky + cho_solve; the
    upper factor of Hinv is chol_lower(Hinv)^T (uniqueness of Cholesky).
  * the blocked column-serial quantize + error-feedback loop
    (reference: gptq.py:191-276) is a `lax.scan` over column blocks whose
    body is a `lax.fori_loop` over the 128 in-block columns; rows are fully
    vectorized. The trailing rank-`blocksize` update W[:, i2:] -= Err1 @
    Hinv[i1:i2, i2:] is one masked matmul per block.
  * four column-quantizer back-ends (uniform / BCQ-LUT / columnwise
    APoT-shift / non-linear) selected by a static mode flag, mirroring the
    dispatch at reference gptq.py:205-264.

Divergences from the reference (intent kept, bugs not replicated):
  * non_linear + dynamic groups: the reference crashes (gptq.py:221 passes
    weight= to NonLinearQuantizer.find_params); here per-group refits work.
  * analyse(): the reference overwrites its "wa" dict with W/diag stats
    (gptq.py:114-122); here "wh" is filled as documented.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from gptq_tpu.quant import bcq as bcq_mod
from gptq_tpu.quant import nonlinear as nl_mod

HIGH = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# Hessian accumulation
# ---------------------------------------------------------------------------

def hessian_init(columns: int, dtype=jnp.float32):
    """Zero state: (H, nsamples, mean_input)."""
    return (
        jnp.zeros((columns, columns), dtype=dtype),
        jnp.zeros((), dtype=jnp.int32),
        jnp.zeros((columns,), dtype=dtype),
    )


@jax.jit
def hessian_update(state, inp):
    """Fold one calibration batch into H (reference: gptq.py:38-65).

    inp: (batch, ..., columns) activations feeding the linear. The sample
    count increment is the leading batch dim (reference counts pre-reshape
    batch at gptq.py:44). mean_input keeps the reference's last-batch
    sqrt(2/n)-scaled token mean (used by the non-linear quantizer / analyse).
    """
    H, n, _ = state
    b = inp.shape[0] if inp.ndim >= 3 else 1
    x = inp.reshape(-1, inp.shape[-1]).astype(jnp.float32)
    n_new = n + b
    scale_old = n.astype(jnp.float32) / n_new.astype(jnp.float32)
    xs = jnp.sqrt(2.0 / n_new.astype(jnp.float32)) * x
    H = H * scale_old + jnp.matmul(xs.T, xs, precision=HIGH)
    mean_input = jnp.mean(xs, axis=0)
    return H, n_new, mean_input


# ---------------------------------------------------------------------------
# Solver configuration (static / hashable)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class SolverConfig:
    mode: str = "uniform"  # uniform | lut | columnwise | nonlinear
    bits: int = 4
    blocksize: int = 128
    percdamp: float = 0.01
    groupsize: int = -1
    actorder: bool = False
    static_groups: bool = False
    sym: bool = False
    trits: bool = False
    mse: bool = False
    # BCQ / shift
    bcq_rounds: int = 5
    use_bst: bool = True
    apot_nums: int = 2
    # non-linear
    hyperbits: int = 5
    explore_bits: int = 1
    explore_split: int = 20
    # TrueOBS variants (reference: zeroShot/models/fast_trueobs.py:108-144)
    sparse_outliers: bool = False  # keep (w-q)^2 > .25*scale^2 weights dense
    nearest: bool = False          # disable error feedback (RTN w/ same grid)

    @property
    def maxq(self) -> int:
        return -1 if self.trits else (1 << self.bits) - 1


# ---------------------------------------------------------------------------
# Row-wise grid fitting helper (min-max + optional MSE shrink)
# ---------------------------------------------------------------------------

def _row_params(x, cfg: SolverConfig):
    """Per-row (scale, zero) for a (rows, g) slice — the in-loop refit body
    (reference: quant.py:37-119 with perchannel=True, weight=True)."""
    maxq = cfg.maxq
    zeros_row = jnp.zeros((x.shape[0],), dtype=x.dtype)
    xmin = jnp.minimum(x.min(axis=1), zeros_row)
    xmax = jnp.maximum(x.max(axis=1), zeros_row)
    if cfg.sym:
        xmax = jnp.maximum(jnp.abs(xmin), xmax)
        xmin = jnp.where(xmin < 0, -xmax, xmin)
    degenerate = (xmin == 0) & (xmax == 0)
    xmin = jnp.where(degenerate, -1.0, xmin)
    xmax = jnp.where(degenerate, 1.0, xmax)
    if maxq < 0:
        return xmax, xmin  # trits: scale=xmax, zero=xmin
    scale = (xmax - xmin) / maxq
    zero = jnp.full_like(scale, (maxq + 1) / 2) if cfg.sym else jnp.round(-xmin / scale)
    if cfg.mse:
        grid, maxshrink, norm = 100, 0.8, 2.4
        nsteps = int(maxshrink * grid)

        def step(best, i):
            best_err, bscale, bzero = best
            p = 1.0 - i / grid
            xmin1, xmax1 = p * xmin, p * xmax
            scale1 = (xmax1 - xmin1) / maxq
            zero1 = zero if cfg.sym else jnp.round(-xmin1 / scale1)
            q = jnp.clip(jnp.round(x / scale1[:, None]) + zero1[:, None], 0, maxq)
            dq = scale1[:, None] * (q - zero1[:, None])
            err = jnp.sum(jnp.abs(dq - x) ** norm, axis=1)
            better = err < best_err
            return (
                jnp.where(better, err, best_err),
                jnp.where(better, scale1, bscale),
                jnp.where(better, zero1, bzero),
            ), None

        init = (jnp.full_like(scale, jnp.inf), scale, zero)
        (_, scale, zero), _ = jax.lax.scan(step, init, jnp.arange(nsteps, dtype=jnp.float32))
    return scale, zero


def _quantize_col(w, scale, zero, maxq: int):
    """Uniform quantize-dequantize of one column (rows,)."""
    if maxq < 0:
        return (w > scale / 2) * scale + (w < zero / 2) * zero
    q = jnp.clip(jnp.round(w / scale) + zero, 0, maxq)
    return scale * (q - zero)


def _upper_cholesky_inverse(H, rhs_chunk: int = 1024):
    """U upper-triangular with U^T U = H^-1 (reference: gptq.py:177-180).

    The identity RHS solves in `rhs_chunk`-column chunks: XLA's blocked
    triangular-solve lowering materializes one trailing temp per 128-row
    block, each scaled by the RHS width — with the full n=11008 identity
    that chain alone needs > 20 GB of HBM (chip compile OOM, found on the
    first honest full-scale llama-7B quantize run, round 4); 1024-column
    chunks bound it near 2 GB at identical total FLOPs."""
    n = H.shape[0]
    L = jnp.linalg.cholesky(H)
    if n <= 2 * rhs_chunk:
        eye = jnp.eye(n, dtype=H.dtype)
        Hinv = jax.scipy.linalg.cho_solve((L, True), eye)
    else:
        def solve_chunk(c0):
            cols = jax.lax.broadcasted_iota(jnp.int32, (n, rhs_chunk), 1) + c0
            rows = jax.lax.broadcasted_iota(jnp.int32, (n, rhs_chunk), 0)
            # overflow columns (last chunk when rhs_chunk does not divide
            # n) carry an all-zero RHS -> zero solution, sliced off below
            eye_c = (rows == cols).astype(H.dtype)
            return jax.scipy.linalg.cho_solve((L, True), eye_c)

        nc = -(-n // rhs_chunk)
        chunks = jax.lax.map(solve_chunk,
                             jnp.arange(nc) * rhs_chunk)  # (nc, n, chunk)
        Hinv = jnp.transpose(chunks, (1, 0, 2)).reshape(
            n, nc * rhs_chunk)[:, :n]
    Hinv = (Hinv + Hinv.T) / 2  # symmetrize before the second factorization
    return jnp.linalg.cholesky(Hinv).T


# ---------------------------------------------------------------------------
# The solver
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("cfg",))
def gptq_quantize(W, H, cfg: SolverConfig, mean_input=None):
    """Quantize one linear's weight (reference: GPTQ.fasterquant, gptq.py:126-309).

    W: (rows, cols) f32-castable weight (rows = out features).
    H: (cols, cols) accumulated Hessian.
    mean_input: (cols,) scaled token mean (non-linear mode only).

    Returns dict with:
      Q        — (rows, cols) quantize-dequantized weight (original column order)
      loss     — scalar sum of (w-q)^2 / (2 d^2) (reference: gptq.py:267,274)
      scale/zero — (num_groups, rows) per-group grid params (uniform/nonlinear)
      alpha    — (rows, num_groups, bits) BCQ magnitudes (lut mode)
      perm     — (cols,) column permutation applied (actorder) or identity
    """
    rows, cols = W.shape
    W = W.astype(jnp.float32)
    H = H.astype(jnp.float32)
    if mean_input is None:
        mean_input = jnp.zeros((cols,), jnp.float32)

    diagH = jnp.diag(H)
    dead = diagH == 0
    H = H + jnp.diag(jnp.where(dead, 1.0, 0.0))
    W = W * (~dead)[None, :].astype(W.dtype)

    g = cfg.groupsize if cfg.groupsize > 0 else cols
    num_groups = max(1, cols // g)

    # --- static per-group grids, fit on pre-permutation W (reference order:
    # gptq.py:157-163 precedes the actorder permutation at :165-169)
    sg_scale = sg_zero = None
    if cfg.static_groups and cfg.mode in ("uniform", "nonlinear"):
        Wg = W.reshape(rows, num_groups, g).transpose(1, 0, 2)  # (ng, rows, g)
        if cfg.mode == "uniform":
            sg_scale, sg_zero = jax.vmap(lambda x: _row_params(x, cfg))(Wg)
        else:
            fit = lambda x: nl_mod.nonlinear_find_params(
                x, cfg.bits, cfg.hyperbits, cfg.explore_bits, cfg.explore_split
            )
            sg_scale, sg_zero, sg_book = jax.vmap(fit)(Wg)

    if cfg.actorder:
        perm = jnp.argsort(-jnp.diag(H))
        W = W[:, perm]
        H = H[perm][:, perm]
        invperm = jnp.argsort(perm)
    else:
        perm = jnp.arange(cols)
        invperm = perm

    damp = cfg.percdamp * jnp.mean(jnp.diag(H))
    H = H + damp * jnp.eye(cols, dtype=H.dtype)
    Hinv = _upper_cholesky_inverse(H)

    # --- mode-specific upfront fits on the (possibly permuted) W
    # (reference: gptq.py:181-185)
    alpha0 = None
    book0 = None
    outlier_thresh = None
    if cfg.mode == "uniform" and not cfg.static_groups and cfg.groupsize <= 0:
        fixed_scale, fixed_zero = _row_params(W, cfg)
        if cfg.sparse_outliers:
            # (reference: fast_trueobs.py:108) outlier = .25 * scale^2
            outlier_thresh = 0.25 * fixed_scale**2
    if cfg.mode == "lut":
        _, _, alpha0 = bcq_mod._fit(
            W, cfg.bits, cfg.bcq_rounds, cfg.groupsize, cfg.use_bst, cfg.apot_nums, apot=True
        )  # (rows, ng, bits)
    if cfg.mode == "nonlinear" and not cfg.static_groups and cfg.groupsize <= 0:
        nl_scale, nl_zero, book0 = nl_mod.nonlinear_find_params(
            W, cfg.bits, cfg.hyperbits, cfg.explore_bits, cfg.explore_split,
            inp=mean_input, use_input=True,
        )

    # --- padding to a whole number of blocks
    bs = cfg.blocksize
    nb = -(-cols // bs)
    cols_pad = nb * bs
    pad = cols_pad - cols
    Wp = jnp.pad(W, ((0, 0), (0, pad)))
    Hinv_p = jnp.zeros((cols_pad, cols_pad), Hinv.dtype)
    Hinv_p = Hinv_p.at[:cols, :cols].set(Hinv)
    if pad:
        idx = jnp.arange(cols, cols_pad)
        Hinv_p = Hinv_p.at[idx, idx].set(1.0)
    Hinv_blocks = Hinv_p.reshape(nb, bs, cols_pad)
    perm_pad = jnp.concatenate([perm, jnp.arange(cols, cols_pad)])

    nl_book_len = (1 << cfg.bits)

    # qstate: carried quantizer state; also accumulates per-group grids for
    # the dynamic-groups path so packing has them afterwards.
    if cfg.mode == "uniform":
        if cfg.groupsize <= 0:
            qstate = (jnp.tile(fixed_scale, (1, 1)), jnp.tile(fixed_zero, (1, 1)))
        elif cfg.static_groups:
            qstate = (sg_scale, sg_zero)
        else:
            qstate = (jnp.ones((num_groups, rows)), jnp.zeros((num_groups, rows)))
    elif cfg.mode == "nonlinear":
        if cfg.groupsize <= 0:
            qstate = (nl_scale[None], nl_zero[None], book0[None])
        elif cfg.static_groups:
            qstate = (sg_scale, sg_zero, sg_book)
        else:
            qstate = (
                jnp.ones((num_groups, rows)),
                jnp.zeros((num_groups, rows)),
                jnp.zeros((num_groups, nl_book_len)),
            )
    elif cfg.mode == "lut":
        qstate = ()
    elif cfg.mode == "columnwise":
        ngc = max(1, rows // g) if cfg.groupsize > 0 else 1
        qstate = (jnp.zeros((1, ngc, cfg.bits)),)
    else:
        raise ValueError(f"unknown mode {cfg.mode}")

    def group_of(idx):
        src = perm_pad[idx] if cfg.actorder else idx
        return jnp.minimum(src // g, num_groups - 1)

    def quantize_column(qstate, w, idx, i, W_stale, W1):
        if cfg.mode == "uniform":
            scales, zeros = qstate
            if cfg.groupsize > 0 and not cfg.static_groups:
                def refit(args):
                    scales, zeros = args
                    sl = jax.lax.dynamic_slice(W_stale, (0, idx), (rows, g))
                    s, z = _row_params(sl, cfg)
                    gi = jnp.minimum(idx // g, num_groups - 1)
                    return (
                        jax.lax.dynamic_update_slice(scales, s[None], (gi, 0)),
                        jax.lax.dynamic_update_slice(zeros, z[None], (gi, 0)),
                    )
                scales, zeros = jax.lax.cond(
                    (idx % g == 0) & (idx < cols), refit, lambda a: a, (scales, zeros)
                )
                gi = jnp.minimum(idx // g, num_groups - 1)
            else:
                gi = group_of(idx) if cfg.groupsize > 0 else 0
            q = _quantize_col(w, scales[gi], zeros[gi], cfg.maxq)
            return q, (scales, zeros)

        if cfg.mode == "nonlinear":
            scales, zeros, books = qstate
            if cfg.groupsize > 0 and not cfg.static_groups:
                def refit(args):
                    scales, zeros, books = args
                    sl = jax.lax.dynamic_slice(W_stale, (0, idx), (rows, g))
                    s, z, bk = nl_mod.nonlinear_find_params(
                        sl, cfg.bits, cfg.hyperbits, cfg.explore_bits, cfg.explore_split
                    )
                    gi = jnp.minimum(idx // g, num_groups - 1)
                    return (
                        jax.lax.dynamic_update_slice(scales, s[None], (gi, 0)),
                        jax.lax.dynamic_update_slice(zeros, z[None], (gi, 0)),
                        jax.lax.dynamic_update_slice(books, bk[None], (gi, 0)),
                    )
                scales, zeros, books = jax.lax.cond(
                    (idx % g == 0) & (idx < cols), refit, lambda a: a,
                    (scales, zeros, books),
                )
                gi = jnp.minimum(idx // g, num_groups - 1)
            else:
                gi = group_of(idx) if cfg.groupsize > 0 else 0
            # w is one column: (rows,) values, one per row grid — quantize
            # as a (rows, 1) matrix so each row meets ITS scale/zero
            # (reference: gptq.py:227 quantizes w.unsqueeze(1))
            q = nl_mod.nonlinear_quantize(
                w[:, None], scales[gi], zeros[gi], books[gi], cfg.hyperbits
            )[:, 0]
            return q, (scales, zeros, books)

        if cfg.mode == "lut":
            gi = group_of(idx) if cfg.groupsize > 0 else 0
            a = alpha0[:, gi, :]  # (rows, bits)
            B = bcq_mod.find_b(w[:, None], a)  # (rows, 1, bits)
            q = jnp.einsum("rcb,rb->rc", B, a)[:, 0]
            return q, qstate

        # columnwise: refit APoT alphas on the flattened next-8-column chunk
        # of the in-block state W1 (reference: gptq.py:239-249)
        (alpha,) = qstate

        def refit(alpha):
            chunk = jax.lax.dynamic_slice(W1, (0, i), (rows, 8))
            flat = chunk.reshape(1, rows * 8)
            gsz = g * 8 if cfg.groupsize > 0 else -1
            _, _, a = bcq_mod._fit(
                flat, cfg.bits, cfg.bcq_rounds, gsz, cfg.use_bst, cfg.apot_nums, apot=True
            )
            return a

        alpha = jax.lax.cond(i % 8 == 0, refit, lambda a: a, alpha)
        q, _ = bcq_mod.bcq_quantize(
            w[None], alpha, groupsize=cfg.groupsize if cfg.groupsize > 0 else -1,
            use_bst=cfg.use_bst,
        )
        return q[0], (alpha,)

    def block_body(carry, xs):
        W_stale, qstate, n_out = carry
        b_idx, Hinv_b = xs
        i1 = b_idx * bs
        W1 = jax.lax.dynamic_slice(W_stale, (0, i1), (rows, bs))
        Q1 = jnp.zeros((rows, bs), W1.dtype)
        L1 = jnp.zeros((rows, bs), W1.dtype)
        E1 = jnp.zeros((rows, bs), W1.dtype)

        def col_body(i, st):
            W1, Q1, L1, E1, qstate, n_out = st
            idx = i1 + i
            w = jax.lax.dynamic_slice(W1, (0, i), (rows, 1))[:, 0]
            hrow_full = jax.lax.dynamic_slice(Hinv_b, (i, 0), (1, cols_pad))[0]
            d = hrow_full[idx]
            q, qstate = quantize_column(qstate, w, idx, i, W_stale, W1)
            if outlier_thresh is not None:
                # TrueOBS sparse outliers: keep large-error weights dense
                # (reference: fast_trueobs.py:131-137)
                sel = ((w - q) ** 2 > outlier_thresh) & (idx < cols)
                q = jnp.where(sel, w, q)
                n_out = n_out + jnp.sum(sel)
            err = (w - q) / d
            hrow = jax.lax.dynamic_slice(hrow_full, (i1,), (bs,))
            mask = (jnp.arange(bs) >= i).astype(W1.dtype)
            if not cfg.nearest:
                W1 = W1 - err[:, None] * (hrow * mask)[None, :]
            Q1 = jax.lax.dynamic_update_slice(Q1, q[:, None], (0, i))
            L1 = jax.lax.dynamic_update_slice(L1, ((w - q) ** 2 / d**2)[:, None], (0, i))
            E1 = jax.lax.dynamic_update_slice(E1, err[:, None], (0, i))
            return (W1, Q1, L1, E1, qstate, n_out)

        W1, Q1, L1, E1, qstate, n_out = jax.lax.fori_loop(
            0, bs, col_body, (W1, Q1, L1, E1, qstate, n_out)
        )
        # trailing update; columns < i1 see zeros (Hinv upper-triangular) and
        # columns inside the finished block are never read again.
        if not cfg.nearest:
            W_stale = W_stale - jnp.matmul(E1, Hinv_b, precision=HIGH)
        return (W_stale, qstate, n_out), (Q1, L1)

    (_, qstate, n_out), (Qb, Lb) = jax.lax.scan(
        block_body, (Wp, qstate, jnp.zeros((), jnp.int32)),
        (jnp.arange(nb), Hinv_blocks)
    )
    Q = jnp.transpose(Qb, (1, 0, 2)).reshape(rows, cols_pad)
    L = jnp.transpose(Lb, (1, 0, 2)).reshape(rows, cols_pad) / 2
    Q = Q[:, :cols]
    loss = jnp.sum(L[:, :cols])
    if cfg.actorder:
        Q = Q[:, invperm]

    out = {"Q": Q, "loss": loss, "perm": perm}
    if outlier_thresh is not None:
        out["outlier_frac"] = n_out.astype(jnp.float32) / (rows * cols)
    if cfg.mode == "uniform":
        out["scale"], out["zero"] = qstate[0], qstate[1]
    elif cfg.mode == "nonlinear":
        out["scale"], out["zero"], out["codebook"] = qstate
    elif cfg.mode == "lut":
        out["alpha"] = alpha0
    return out


# ---------------------------------------------------------------------------
# Driver-facing stateful wrapper
# ---------------------------------------------------------------------------

class GPTQ:
    """Mirrors the reference's per-layer object flow (reference: gptq.py:23-318):
    construct per linear, feed calibration activations, then solve.

    Like the reference's `GPTQ(layer)` it is transparent over layer kinds
    (reference: gptq.py:29-32,49-58,303-304):
      kind="linear" — weight (out, in), activations (..., in)
      kind="conv2d" — weight (out, in, kh, kw); activations are NCHW
        images, unfolded into patch rows exactly like torch.nn.Unfold
        (stride/padding/dilation from conv_cfg); the solved Q restores the
        4-d kernel layout
      kind="conv1d" — HF transformers.Conv1D (in, out) transposed weight
    """

    def __init__(self, weight: jax.Array, kind: str = "linear",
                 conv_cfg: dict | None = None):
        self.kind = kind
        self.conv_cfg = conv_cfg or {}
        self.orig_shape = weight.shape
        if kind == "conv2d":
            from gptq_tpu.quant.conv import conv2d_weight_matrix

            weight = conv2d_weight_matrix(weight)
        elif kind == "conv1d":
            from gptq_tpu.quant.conv import conv1d_weight_matrix

            weight = conv1d_weight_matrix(weight)
        elif kind != "linear":
            raise ValueError(f"unknown layer kind {kind}")
        self.weight = weight
        self.rows, self.columns = weight.shape
        self.state = hessian_init(self.columns)

    @property
    def nsamples(self) -> int:
        return int(self.state[1])

    def add_batch(self, inp: jax.Array) -> None:
        if self.kind == "conv2d":
            from gptq_tpu.quant.conv import conv2d_patches

            inp = conv2d_patches(
                inp,
                self.conv_cfg.get("kernel_size", self.orig_shape[2:]),
                self.conv_cfg.get("stride", (1, 1)),
                self.conv_cfg.get("padding", (0, 0)),
                self.conv_cfg.get("dilation", (1, 1)),
            )
        self.state = hessian_update(self.state, inp)

    def fasterquant(self, cfg: SolverConfig):
        H, _, mean_input = self.state
        out = dict(gptq_quantize(self.weight, H, cfg, mean_input))
        if self.kind == "conv2d":
            from gptq_tpu.quant.conv import conv2d_weight_from_matrix

            out["Q"] = conv2d_weight_from_matrix(out["Q"], self.orig_shape)
        elif self.kind == "conv1d":
            from gptq_tpu.quant.conv import conv1d_weight_from_matrix

            out["Q"] = conv1d_weight_from_matrix(out["Q"])
        return out

    def analyse(self, percdamp: float = 0.01):
        """Row/column-wise stats of W, W*a and W/diag(Hinv)
        (reference: gptq.py:67-124; the reference's wh block mistakenly
        overwrites wa — here both are reported)."""
        W = self.weight.astype(jnp.float32)
        H, _, mean_input = self.state
        diagH = jnp.diag(H)
        dead = diagH == 0
        H = H + jnp.diag(jnp.where(dead, 1.0, 0.0))
        W = W * (~dead)[None, :]
        damp = percdamp * jnp.mean(jnp.diag(H))
        H = H + damp * jnp.eye(self.columns, dtype=H.dtype)
        U = _upper_cholesky_inverse(H)

        def stats(x, axis):
            return {
                "max": x.max(axis=axis),
                "min": x.min(axis=axis),
                "mean": x.mean(axis=axis),
                "std": x.std(axis=axis, ddof=1),
            }

        wa = W * mean_input[None, :]
        wh = W / jnp.diag(U)[None, :]
        return {
            "rowwise": {"w": stats(W, 1), "wa": stats(wa, 1), "wh": stats(wh, 1)},
            "columnWise": {"w": stats(W, 0), "wa": stats(wa, 0), "wh": stats(wh, 0)},
        }

    def free(self):
        self.state = None
        self.weight = None
