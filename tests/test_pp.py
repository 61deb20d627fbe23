"""Pipeline-parallel (GPipe microbatch schedule over a "pp" mesh axis)
tests on the virtual CPU mesh: the pipelined loss/grads must match the
single-device computation exactly (same math, different schedule)."""

import numpy as np
import optax
import pytest
import jax
import jax.numpy as jnp

from gptq_tpu.finetune import clm_loss
from gptq_tpu.models.common import ArchSpec, init_params, model_forward
from gptq_tpu.parallel.pp import (make_pp_loss, make_pp_mesh,
                                  make_pp_train_step, stack_stage_params,
                                  unstack_stage_params)

SPEC = ArchSpec(arch="llama", n_layers=4, hidden=48, n_heads=4, n_kv_heads=4,
                ffn=96, vocab=89, max_pos=64, norm_eps=1e-5, act="silu",
                pos="rope", norm_type="rmsnorm", linear_bias=False,
                tie_embeddings=False)

OPT_SPEC = ArchSpec(arch="opt", n_layers=4, hidden=48, n_heads=4,
                    n_kv_heads=4, ffn=96, vocab=89, max_pos=64,
                    norm_eps=1e-5, act="relu", pos="learned",
                    norm_type="layernorm", linear_bias=True,
                    tie_embeddings=True)


def _batch(spec, B=4, T=16, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).integers(0, spec.vocab, size=(B, T)))


def test_stack_roundtrip():
    params = init_params(SPEC, jax.random.PRNGKey(0))
    stacked = stack_stage_params(SPEC, params, pp=2)
    back = unstack_stage_params(SPEC, stacked)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("spec,pp,n_micro", [
    (SPEC, 2, 2), (SPEC, 4, 2), (OPT_SPEC, 2, 4),
])
def test_pp_loss_matches_single_device(spec, pp, n_micro):
    """The pipelined forward is the same math as the flat forward: loss
    must match to float tolerance for llama (rope) and OPT (learned
    positions + biases + tied head)."""
    params = init_params(spec, jax.random.PRNGKey(1))
    batch = _batch(spec)
    want = float(clm_loss(spec, params, batch))

    mesh = make_pp_mesh(pp)
    stacked = stack_stage_params(spec, params, pp, mesh)
    loss_fn = make_pp_loss(spec, mesh, n_micro=n_micro)
    got = float(jax.jit(loss_fn)(stacked, batch))
    # the flat loss is one mean over B*T tokens; the pipeline averages
    # per-micro means — equal because micro-batches are equal-sized
    assert abs(got - want) < 5e-5, (got, want)


def test_pp_grads_match_single_device():
    """One SGD step through the pipeline schedule == one SGD step on a
    single device (autodiff through ppermute/scan)."""
    pp, n_micro, lr = 2, 2, 0.05
    params = init_params(SPEC, jax.random.PRNGKey(2))
    batch = _batch(SPEC, seed=3)

    opt = optax.sgd(lr)
    state = opt.init(params)
    loss_ref, grads = jax.value_and_grad(
        lambda p: clm_loss(SPEC, p, batch))(params)
    updates, _ = opt.update(grads, state, params)
    want = optax.apply_updates(params, updates)

    mesh = make_pp_mesh(pp)
    stacked = stack_stage_params(SPEC, params, pp, mesh)
    init, step = make_pp_train_step(SPEC, optax.sgd(lr), mesh, n_micro)
    opt_state = init(stacked)
    stacked2, _, loss_pp = step(stacked, opt_state, batch)
    assert abs(float(loss_pp) - float(loss_ref)) < 5e-5

    got = unstack_stage_params(SPEC, stacked2)
    for a, b in zip(jax.tree_util.tree_leaves(want),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_pp_training_reduces_loss():
    mesh = make_pp_mesh(4)
    params = init_params(SPEC, jax.random.PRNGKey(4))
    stacked = stack_stage_params(SPEC, params, 4, mesh)
    init, step = make_pp_train_step(SPEC, optax.adam(1e-2), mesh, n_micro=2)
    opt_state = init(stacked)
    batch = _batch(SPEC, seed=5)
    losses = []
    for _ in range(8):
        stacked, opt_state, loss = step(stacked, opt_state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0] - 0.1, losses


def test_pp_checkpoint_resume_roundtrip(tmp_path):
    """The finetune driver's pp flow: checkpoints store the FLAT layout
    (interchangeable with every other consumer); resuming re-stacks and
    training continues bit-identically."""
    from gptq_tpu.io import load_checkpoint, save_checkpoint

    mesh = make_pp_mesh(2)
    params = init_params(SPEC, jax.random.PRNGKey(8))
    stacked = stack_stage_params(SPEC, params, 2, mesh)
    init, step = make_pp_train_step(SPEC, optax.sgd(0.05), mesh, n_micro=2)
    opt_state = init(stacked)
    b1, b2 = _batch(SPEC, seed=9), _batch(SPEC, seed=10)
    stacked, opt_state, _ = step(stacked, opt_state, b1)

    save_checkpoint(str(tmp_path / "ck"), SPEC,
                    unstack_stage_params(SPEC, stacked))
    _, flat, _ = load_checkpoint(str(tmp_path / "ck"))
    restacked = stack_stage_params(SPEC, flat, 2, mesh)
    s_cont, _, loss_a = step(stacked, opt_state, b2)
    s_resume, _, loss_b = step(restacked, init(restacked), b2)
    # sgd has no moments, so a fresh opt_state continues identically
    assert abs(float(loss_a) - float(loss_b)) < 1e-6
    for a, b in zip(jax.tree_util.tree_leaves(s_cont),
                    jax.tree_util.tree_leaves(s_resume)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


def test_pp_eval_logits_via_unstack():
    """A pipeline-trained model evaluates through the standard flat
    forward after unstacking (checkpoint interchange)."""
    mesh = make_pp_mesh(2)
    params = init_params(SPEC, jax.random.PRNGKey(6))
    stacked = stack_stage_params(SPEC, params, 2, mesh)
    flat = unstack_stage_params(SPEC, stacked)
    ids = _batch(SPEC, B=2, T=8, seed=7)
    want, _ = model_forward(SPEC, params, ids)
    got, _ = model_forward(SPEC, flat, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_pp_eval_matches_flat():
    """make_pp_eval (stage-sharded loss + accuracy, never gathering the
    full model onto one device) matches the flat clm_loss/clm_accuracy."""
    from gptq_tpu.finetune import clm_accuracy
    from gptq_tpu.parallel.pp import make_pp_eval

    params = init_params(SPEC, jax.random.PRNGKey(9))
    batch = _batch(SPEC, B=4, T=16, seed=11)
    want_loss = float(clm_loss(SPEC, params, batch))
    want_acc = float(clm_accuracy(SPEC, params, batch))

    mesh = make_pp_mesh(2)
    stacked = stack_stage_params(SPEC, params, 2, mesh)
    loss, acc = jax.jit(make_pp_eval(SPEC, mesh, n_micro=2))(stacked, batch)
    assert abs(float(loss) - want_loss) < 5e-5, (float(loss), want_loss)
    assert abs(float(acc) - want_acc) < 1e-6, (float(acc), want_acc)


def test_dp_pp_grads_match_flat():
    """(dp, pp) 2-D mesh: dp pipeline replicas on batch shards, grads
    psum over dp — one SGD step equals the flat single-device step on the
    FULL batch, and the loss equals the flat full-batch loss."""
    pp, dp, n_micro, lr = 2, 2, 2, 0.05
    params = init_params(SPEC, jax.random.PRNGKey(7))
    batch = _batch(SPEC, B=8, T=16, seed=8)

    opt = optax.sgd(lr)
    loss_ref, grads = jax.value_and_grad(
        lambda p: clm_loss(SPEC, p, batch))(params)
    updates, _ = opt.update(grads, opt.init(params), params)
    want = optax.apply_updates(params, updates)

    mesh = make_pp_mesh(pp, dp=dp)
    assert mesh.shape == {"dp": dp, "pp": pp}
    stacked = stack_stage_params(SPEC, params, pp, mesh)
    init, step = make_pp_train_step(SPEC, optax.sgd(lr), mesh, n_micro)
    stacked2, _, loss_pp = step(stacked, init(stacked), batch)
    assert abs(float(loss_pp) - float(loss_ref)) < 5e-5

    got = unstack_stage_params(SPEC, stacked2)
    for a, b in zip(jax.tree_util.tree_leaves(want),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_dp_pp_eval_matches_flat():
    from gptq_tpu.finetune import clm_accuracy
    from gptq_tpu.parallel.pp import make_pp_eval

    params = init_params(SPEC, jax.random.PRNGKey(8))
    batch = _batch(SPEC, B=8, T=16, seed=9)
    want_loss = float(clm_loss(SPEC, params, batch))
    want_acc = float(clm_accuracy(SPEC, params, batch))

    mesh = make_pp_mesh(2, dp=2)
    stacked = stack_stage_params(SPEC, params, 2, mesh)
    loss, acc = jax.jit(make_pp_eval(SPEC, mesh, n_micro=2))(stacked, batch)
    assert abs(float(loss) - want_loss) < 5e-5, (float(loss), want_loss)
    assert abs(float(acc) - want_acc) < 1e-6, (float(acc), want_acc)


def test_dp_pp_tp_grads_match_flat():
    """The full 3-D training mesh (dp, pp, tp): dp pipeline replicas, pp
    stage sharding, Megatron tp shards inside each stage — one SGD step
    still equals the flat single-device step on the full batch."""
    params = init_params(SPEC, jax.random.PRNGKey(10))
    batch = _batch(SPEC, B=8, T=16, seed=11)
    lr = 0.05

    opt = optax.sgd(lr)
    loss_ref, grads = jax.value_and_grad(
        lambda p: clm_loss(SPEC, p, batch))(params)
    updates, _ = opt.update(grads, opt.init(params), params)
    want = optax.apply_updates(params, updates)

    mesh = make_pp_mesh(2, dp=2, tp=2)
    assert mesh.shape == {"dp": 2, "pp": 2, "tp": 2}
    stacked = stack_stage_params(SPEC, params, 2, mesh)
    init, step = make_pp_train_step(SPEC, optax.sgd(lr), mesh, n_micro=2)
    stacked2, _, loss_pp = step(stacked, init(stacked), batch)
    assert abs(float(loss_pp) - float(loss_ref)) < 5e-5

    got = unstack_stage_params(SPEC, stacked2)
    for a, b in zip(jax.tree_util.tree_leaves(want),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)
