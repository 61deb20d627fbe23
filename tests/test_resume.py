"""Mid-quantization resume: interrupting after layer 0 and resuming must
produce the same result as an uninterrupted run."""

import numpy as np
import jax
import jax.numpy as jnp
import jax.tree_util as jtu

from gptq_tpu.config import QuantConfig
from gptq_tpu.models.common import ArchSpec, init_params, model_forward
from gptq_tpu.pipeline import quantize_model

SPEC = ArchSpec(arch="llama", n_layers=3, hidden=32, n_heads=4, n_kv_heads=4,
                ffn=64, vocab=61, max_pos=64, act="silu", pos="rope",
                norm_type="rmsnorm", linear_bias=False, tie_embeddings=False)


def clone(p):
    return jtu.tree_map(jnp.array, p)


def test_resume_matches_uninterrupted(tmp_path):
    params0 = init_params(SPEC, jax.random.PRNGKey(0))
    calib = jnp.asarray(np.random.default_rng(0).integers(0, 61, size=(4, 16)))
    cfg = QuantConfig(wbits=4, nsamples=4)

    full = clone(params0)
    quantize_model(SPEC, full, calib, cfg, log=lambda s: None)

    # interrupted run: stop after layer 1 by raising from the log callback
    part = clone(params0)
    count = {"layers": 0}

    def interrupt(msg):
        if msg.startswith("layer") and "done" in msg:
            count["layers"] += 1
            if count["layers"] == 2:
                raise KeyboardInterrupt

    try:
        quantize_model(SPEC, part, calib, cfg, log=interrupt,
                       resume_dir=str(tmp_path))
    except KeyboardInterrupt:
        pass

    # fresh params, resume
    resumed = clone(params0)
    res = quantize_model(SPEC, resumed, calib, cfg, log=lambda s: None,
                         resume_dir=str(tmp_path))
    assert len(res.quantizers) == 3 * 7

    ids = jnp.asarray(np.random.default_rng(1).integers(0, 61, size=(1, 12)))
    a, _ = model_forward(SPEC, full, ids)
    b, _ = model_forward(SPEC, resumed, ids)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)
