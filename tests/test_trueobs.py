"""TrueOBS-variant and activation-quantization tests
(reference: zeroShot/models/fast_trueobs.py, quant.py:127-167)."""

import numpy as np
import jax
import jax.numpy as jnp

from gptq_tpu.quant.gptq import SolverConfig, gptq_quantize, hessian_init, hessian_update


def make_problem(rows=16, cols=64, seed=0):
    rng = np.random.default_rng(seed)
    W = rng.normal(size=(rows, cols)).astype(np.float32)
    # heavy-tailed weights so outliers exist
    W[rng.random(size=W.shape) < 0.02] *= 8
    X = rng.normal(size=(512, cols)).astype(np.float32)
    state = hessian_update(hessian_init(cols), jnp.asarray(X[None]))
    return jnp.asarray(W), state[0]


def test_sparse_outliers_pass_through():
    W, H = make_problem()
    # mse grid-shrink clips the heavy tail -> those weights become outliers
    cfg = SolverConfig(mode="uniform", bits=3, sparse_outliers=True, mse=True)
    out = gptq_quantize(W, H, cfg)
    frac = float(out["outlier_frac"])
    assert 0 < frac < 0.2
    # keeping outliers dense must not hurt the proxy loss
    cfg_plain = SolverConfig(mode="uniform", bits=3, mse=True)
    out_plain = gptq_quantize(W, H, cfg_plain)
    assert float(out["loss"]) <= float(out_plain["loss"]) + 1e-3


def test_nearest_flag_disables_feedback():
    from gptq_tpu.quant.rtn import rtn_quantize_weight

    W, H = make_problem(seed=1)
    cfg = SolverConfig(mode="uniform", bits=4, nearest=True)
    out = gptq_quantize(W, H, cfg)
    rtn = rtn_quantize_weight(W, bits=4)
    np.testing.assert_allclose(np.asarray(out["Q"]), np.asarray(rtn), atol=1e-5)


def test_actquant_fake_quantizes_inputs():
    from gptq_tpu.models.common import ArchSpec, init_params, model_forward
    from gptq_tpu.pipeline import add_actquant

    spec = ArchSpec(arch="llama", n_layers=1, hidden=32, n_heads=4, n_kv_heads=4,
                    ffn=64, vocab=61, max_pos=64, act="silu", pos="rope",
                    norm_type="rmsnorm", linear_bias=False, tie_embeddings=False)
    params = init_params(spec, jax.random.PRNGKey(0))
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 61, size=(2, 16)))
    before, _ = model_forward(spec, params, ids)
    add_actquant(spec, params, ids, bits=8)
    assert "act_q" in params["layers"][0]["q"]
    after, _ = model_forward(spec, params, ids)
    d = float(jnp.max(jnp.abs(before - after)))
    assert 0 < d < 1.0  # changed, but 8-bit so only slightly
