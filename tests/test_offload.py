"""Host-resident (streamed) quantization must match device-resident results
— the reference's CPU<->GPU layer streaming counterpart (opt.py:103-224)."""

import numpy as np
import jax
import jax.numpy as jnp
import jax.tree_util as jtu

from gptq_tpu.config import QuantConfig
from gptq_tpu.models.common import ArchSpec, init_params, model_forward
from gptq_tpu.pipeline import quantize_model

SPEC = ArchSpec(arch="opt", n_layers=2, hidden=32, n_heads=4, ffn=64,
                vocab=61, max_pos=64, act="relu", pos="learned",
                norm_type="layernorm", linear_bias=True, tie_embeddings=False)


def test_host_streamed_quantization_matches_device():
    params = init_params(SPEC, jax.random.PRNGKey(0))
    calib = jnp.asarray(np.random.default_rng(0).integers(0, 61, size=(4, 16)))
    cfg = QuantConfig(wbits=4, nsamples=4)

    dev_params = jtu.tree_map(jnp.array, params)
    quantize_model(SPEC, dev_params, calib, cfg, log=lambda s: None)

    host_params = jtu.tree_map(jnp.array, params)
    for bp in host_params["layers"]:
        for k in ("q", "k", "v", "o", "fc1", "fc2"):
            bp[k]["w"] = np.asarray(bp[k]["w"])  # host-resident
    quantize_model(SPEC, host_params, calib, cfg, log=lambda s: None)
    # quantized weights written back as numpy
    assert isinstance(host_params["layers"][0]["q"]["w"], np.ndarray)

    ids = jnp.asarray(np.random.default_rng(1).integers(0, 61, size=(1, 12)))
    a, _ = model_forward(SPEC, dev_params, ids)
    host_params["layers"] = jax.tree.map(jnp.asarray, host_params["layers"])
    b, _ = model_forward(SPEC, host_params, ids)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)
