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


def test_conv2d_gptq_pipeline_beats_rtn():
    """End-to-end conv quantization through the driver-facing GPTQ wrapper
    (reference find_layers covers nn.Conv2d transparently): GPTQ with a
    patch-accumulated Hessian must beat RTN on conv OUTPUT error."""
    import jax
    from gptq_tpu.quant.gptq import GPTQ
    from gptq_tpu.quant.rtn import rtn_quantize_weight

    rng = np.random.default_rng(7)
    W = (rng.normal(size=(16, 8, 3, 3)) * 0.5).astype(np.float32)

    def make_x(n):
        # channel-correlated, spatially smooth inputs: an informative
        # (non-identity) Hessian is what separates GPTQ from RTN
        base = rng.normal(size=(n, 1, 12, 12))
        mix = rng.normal(size=(n, 8, 1, 1)) * 0.3
        x = base * (1.0 + mix) + 0.2 * rng.normal(size=(n, 8, 12, 12))
        return x.astype(np.float32)

    xs = [make_x(2) for _ in range(4)]

    g = GPTQ(jnp.asarray(W), kind="conv2d",
             conv_cfg={"kernel_size": (3, 3), "padding": (1, 1)})
    for x in xs:
        g.add_batch(jnp.asarray(x))
    out = g.fasterquant(SolverConfig(bits=3, blocksize=32))
    Q = np.asarray(out["Q"])
    assert Q.shape == W.shape

    Q_rtn = np.asarray(rtn_quantize_weight(
        jnp.asarray(W.reshape(16, -1)), 3)).reshape(W.shape)

    def conv(w, x):
        return jax.lax.conv_general_dilated(
            jnp.asarray(x), jnp.asarray(w), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"))

    xe = make_x(4)
    y_ref = conv(W, xe)
    err_gptq = float(jnp.mean((conv(Q, xe) - y_ref) ** 2))
    err_rtn = float(jnp.mean((conv(Q_rtn, xe) - y_ref) ** 2))
    assert err_gptq < err_rtn, (err_gptq, err_rtn)


def test_conv1d_gptq_roundtrip():
    """HF transformers.Conv1D (transposed linear) through the wrapper."""
    from gptq_tpu.quant.gptq import GPTQ

    rng = np.random.default_rng(9)
    W = (rng.normal(size=(24, 16)) * 0.5).astype(np.float32)  # (in, out)
    xs = [rng.normal(size=(3, 5, 24)).astype(np.float32) for _ in range(3)]
    g = GPTQ(jnp.asarray(W), kind="conv1d")
    for x in xs:
        g.add_batch(jnp.asarray(x))
    out = g.fasterquant(SolverConfig(bits=4, blocksize=16))
    assert out["Q"].shape == W.shape  # restored to (in, out)
    assert np.isfinite(float(out["loss"]))
