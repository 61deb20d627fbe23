"""Conv2d / Conv1D adaptation for the GPTQ solver.

The reference flattens Conv2d kernels to (out, in*kh*kw) and feeds unfolded
input patches into the Hessian (reference: gptq.py:29-31,49-58); HF-style
Conv1D (transposed linear) is handled by transposing (gptq.py:31-32,303-304).
Here the same adaptation is explicit: `conv2d_weight_matrix` /
`conv2d_patches` produce the matrices the solver consumes, and
`weight_from_matrix` restores the original layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def conv2d_weight_matrix(W: jax.Array) -> jax.Array:
    """(out, in, kh, kw) -> (out, in*kh*kw)."""
    return W.reshape(W.shape[0], -1)


def conv2d_weight_from_matrix(Q: jax.Array, shape) -> jax.Array:
    return Q.reshape(shape)


def conv2d_patches(x: jax.Array, kernel_size, stride=(1, 1), padding=(0, 0),
                   dilation=(1, 1)) -> jax.Array:
    """Unfold NCHW input into (batch, n_patches, in*kh*kw) patch rows —
    torch.nn.Unfold equivalent (reference: gptq.py:49-58). The rows feed
    hessian_update directly."""
    kh, kw = kernel_size
    n, c, h, w = x.shape
    patches = jax.lax.conv_general_dilated_patches(
        x.astype(jnp.float32),
        filter_shape=(kh, kw),
        window_strides=tuple(stride),
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        rhs_dilation=tuple(dilation),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )  # (n, c*kh*kw, oh, ow)
    ck = patches.shape[1]
    return patches.reshape(n, ck, -1).transpose(0, 2, 1)  # (n, patches, ck)


def conv1d_weight_matrix(W: jax.Array) -> jax.Array:
    """HF transformers.Conv1D stores (in, out); the solver wants (out, in)."""
    return W.T


def conv1d_weight_from_matrix(Q: jax.Array) -> jax.Array:
    return Q.T
