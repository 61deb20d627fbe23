"""Sharding tests on the virtual 8-device CPU mesh: TP-sharded forward and
the dp+tp train step must match single-device results."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gptq_tpu.finetune import clm_loss, make_optimizer, make_train_step
from gptq_tpu.models.common import ArchSpec, init_params, model_forward
from gptq_tpu.parallel.mesh import make_mesh, param_specs, shard_params

SPEC = ArchSpec(arch="llama", n_layers=2, hidden=64, n_heads=4, n_kv_heads=4,
                ffn=128, vocab=97, max_pos=64, norm_eps=1e-5, act="silu",
                pos="rope", norm_type="rmsnorm", linear_bias=False,
                tie_embeddings=False)


def test_mesh_creation():
    mesh = make_mesh(tp=4, dp=2)
    assert mesh.shape == {"dp": 2, "tp": 4}


def test_tp_sharded_forward_matches_dense():
    params = init_params(SPEC, jax.random.PRNGKey(0))
    ids = np.random.default_rng(0).integers(0, 97, size=(2, 16))
    want, _ = model_forward(SPEC, params, jnp.asarray(ids))

    mesh = make_mesh(tp=4, dp=2)
    sharded = shard_params(SPEC, params, mesh)
    fwd = jax.jit(lambda p, i: model_forward(SPEC, p, i)[0])
    got = fwd(sharded, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_packed_weights_shard():
    """PackedWeight leaves must accept NamedShardings too."""
    from gptq_tpu.config import QuantConfig
    from gptq_tpu.pipeline import pack_model, quantize_model

    params = init_params(SPEC, jax.random.PRNGKey(1))
    calib = jnp.asarray(
        np.random.default_rng(1).integers(0, 97, size=(4, 16))
    )
    cfg = QuantConfig(wbits=4, nsamples=4)
    res = quantize_model(SPEC, params, calib, cfg, log=lambda s: None)

    ids = np.random.default_rng(2).integers(0, 97, size=(2, 16))
    want, _ = model_forward(SPEC, params, jnp.asarray(ids))  # fake-quant dense

    pack_model(SPEC, params, res.quantizers, cfg)
    mesh = make_mesh(tp=4, dp=2)
    sharded = shard_params(SPEC, params, mesh)
    fwd = jax.jit(lambda p, i: model_forward(SPEC, p, i)[0])
    got = fwd(sharded, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=5e-3, atol=5e-3)


def test_train_step_sharded_matches_single():
    params = init_params(SPEC, jax.random.PRNGKey(2))
    batch = jnp.asarray(np.random.default_rng(3).integers(0, 97, size=(4, 16)))
    opt = make_optimizer("adamw", lr=1e-3)

    init, step1 = make_train_step(SPEC, opt, mesh=None)
    st = init(params)
    p1, _, loss1 = step1(params, st, batch)

    mesh = make_mesh(tp=4, dp=2)
    sparams = shard_params(SPEC, params, mesh)
    init_m, step_m = make_train_step(SPEC, opt, mesh=mesh)
    st_m = init_m(sparams)
    p2, _, loss2 = step_m(sparams, st_m, batch)

    assert abs(float(loss1) - float(loss2)) < 1e-4
    d = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))),
            jax.tree.leaves(p1), jax.tree.leaves(p2),
        ),
    )
    assert d < 1e-2


def test_loss_decreases_under_training():
    params = init_params(SPEC, jax.random.PRNGKey(4))
    batch = jnp.asarray(np.random.default_rng(5).integers(0, 97, size=(4, 16)))
    opt = make_optimizer("adafactor", lr=1e-2)
    init, step = make_train_step(SPEC, opt)
    st = init(params)
    losses = []
    for _ in range(5):
        params, st, loss = step(params, st, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
