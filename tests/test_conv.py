"""Conv adaptation tests: patch extraction matches torch.nn.Unfold and the
GPTQ solver round-trips conv weights (reference: gptq.py:29-58)."""

import numpy as np
import torch
import jax.numpy as jnp

from gptq_tpu.quant.conv import (
    conv2d_patches,
    conv2d_weight_from_matrix,
    conv2d_weight_matrix,
)
from gptq_tpu.quant.gptq import SolverConfig, gptq_quantize, hessian_init, hessian_update


def test_patches_match_torch_unfold():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 8, 8)).astype(np.float32)
    for ks, st, pad in [((3, 3), (1, 1), (0, 0)), ((2, 2), (2, 2), (1, 1))]:
        want = torch.nn.Unfold(ks, padding=pad, stride=st)(
            torch.from_numpy(x)
        ).numpy()  # (n, c*kh*kw, L)
        got = np.asarray(conv2d_patches(jnp.asarray(x), ks, st, pad))
        np.testing.assert_allclose(
            got, want.transpose(0, 2, 1), rtol=1e-5, atol=1e-6
        )


def test_gptq_on_conv_weight():
    rng = np.random.default_rng(1)
    W = rng.normal(size=(8, 3, 3, 3)).astype(np.float32)  # (out,in,kh,kw)
    x = rng.normal(size=(4, 3, 8, 8)).astype(np.float32)
    patches = conv2d_patches(jnp.asarray(x), (3, 3))
    state = hessian_init(27)
    state = hessian_update(state, patches)
    Wm = conv2d_weight_matrix(jnp.asarray(W))
    out = gptq_quantize(Wm, state[0], SolverConfig(bits=4, blocksize=16))
    Q = conv2d_weight_from_matrix(out["Q"], W.shape)
    assert Q.shape == W.shape
    assert np.isfinite(float(out["loss"]))
