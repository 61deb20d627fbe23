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


def test_shardmap_tp_forward_matches_single():
    """Explicit shard_map TP (local kernels + psum epilogues) must equal
    the single-device forward — packed weights included."""
    from gptq_tpu.config import QuantConfig
    from gptq_tpu.parallel.tp import make_tp_forward
    from gptq_tpu.pipeline import pack_model, quantize_model

    # row-sharded packed weights need K/tp to cover whole subblocks
    # (512-aligned), so this test uses serving-scale dims: 1024 / tp=2.
    # vocab 96 % tp == 0 also engages the vocab-sharded lm_head +
    # all-gather path.
    spec = ArchSpec(arch="llama", n_layers=1, hidden=1024, n_heads=4,
                    n_kv_heads=4, ffn=1024, vocab=96, max_pos=64,
                    norm_eps=1e-5, act="silu", pos="rope",
                    norm_type="rmsnorm", linear_bias=False,
                    tie_embeddings=False)
    params = init_params(spec, jax.random.PRNGKey(3))
    calib = jnp.asarray(
        np.random.default_rng(3).integers(0, 96, size=(2, 16)))
    cfg = QuantConfig(wbits=4, nsamples=2)
    res = quantize_model(spec, params, calib, cfg, log=lambda s: None)
    pack_model(spec, params, res.quantizers, cfg, tp=2)

    ids = jnp.asarray(np.random.default_rng(4).integers(0, 96, size=(2, 16)))
    want, _ = model_forward(spec, params, ids)

    mesh = make_mesh(tp=2, dp=1)
    local, fwd = make_tp_forward(spec, params, mesh)
    got = fwd(local, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_shardmap_tp_decode_matches_single():
    from gptq_tpu.models.common import KVCache
    from gptq_tpu.parallel.tp import make_tp_decode_step

    params = init_params(SPEC, jax.random.PRNGKey(5))
    mesh = make_mesh(tp=2, dp=1)
    local, step = make_tp_decode_step(SPEC, params, mesh)

    cache = KVCache.init(SPEC, 1, 8, jnp.float32)
    tok = jnp.asarray([[3]])
    logits_tp, cache_tp = step(local, cache, tok)
    want, _ = model_forward(SPEC, params, tok, KVCache.init(SPEC, 1, 8,
                                                            jnp.float32))
    np.testing.assert_allclose(np.asarray(logits_tp),
                               np.asarray(want[:, -1]), rtol=2e-3, atol=2e-3)
    # second step continues from the sharded cache
    tok2 = jnp.asarray([[7]])
    logits2, _ = step(local, cache_tp, tok2)
    c1 = KVCache.init(SPEC, 1, 8, jnp.float32)
    _, c1 = model_forward(SPEC, params, tok, c1)
    want2, _ = model_forward(SPEC, params, tok2, c1)
    np.testing.assert_allclose(np.asarray(logits2),
                               np.asarray(want2[:, -1]), rtol=2e-3, atol=2e-3)


def test_shardmap_tp_int8_cache_matches_single():
    """int8 KV cache composed with shard_map TP: the per-token-head scale
    planes shard on the head axis (cache_pspec(int8=True)); two decode
    steps must match the single-device int8-cache forward."""
    from gptq_tpu.models.common import KVCache
    from gptq_tpu.parallel.tp import make_tp_decode_step

    params = init_params(SPEC, jax.random.PRNGKey(11))
    mesh = make_mesh(tp=2, dp=1)
    local, step = make_tp_decode_step(SPEC, params, mesh, int8_cache=True)

    cache = KVCache.init(SPEC, 1, 8, jnp.int8)
    tok, tok2 = jnp.asarray([[3]]), jnp.asarray([[7]])
    logits_tp, cache_tp = step(local, cache, tok)
    logits2_tp, _ = step(local, cache_tp, tok2)

    c1 = KVCache.init(SPEC, 1, 8, jnp.int8)
    want, c1 = model_forward(SPEC, params, tok, c1)
    want2, _ = model_forward(SPEC, params, tok2, c1)
    np.testing.assert_allclose(np.asarray(logits_tp),
                               np.asarray(want[:, -1]), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(logits2_tp),
                               np.asarray(want2[:, -1]), rtol=2e-3, atol=2e-3)


def test_shardmap_tp_alibi_bloom():
    """BLOOM path: alibi slopes must slice per shard's heads."""
    from gptq_tpu.parallel.tp import make_tp_forward

    bspec = ArchSpec(arch="bloom", n_layers=2, hidden=64, n_heads=8,
                     n_kv_heads=8, ffn=128, vocab=97, max_pos=64,
                     act="gelu_tanh", pos="alibi", norm_type="layernorm",
                     linear_bias=True, tie_embeddings=True)
    params = init_params(bspec, jax.random.PRNGKey(6))
    ids = jnp.asarray(np.random.default_rng(6).integers(0, 97, size=(2, 12)))
    want, _ = model_forward(bspec, params, ids)
    mesh = make_mesh(tp=4, dp=1)
    local, fwd = make_tp_forward(bspec, params, mesh)
    got = fwd(local, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


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


def _packed_serving_model(act_order=True, groupsize=128, tp=2, seed=7):
    from gptq_tpu.config import QuantConfig
    from gptq_tpu.pipeline import pack_model, quantize_model

    spec = ArchSpec(arch="llama", n_layers=1, hidden=1024, n_heads=4,
                    n_kv_heads=4, ffn=1024, vocab=96, max_pos=64,
                    norm_eps=1e-5, act="silu", pos="rope",
                    norm_type="rmsnorm", linear_bias=False,
                    tie_embeddings=False)
    params = init_params(spec, jax.random.PRNGKey(seed))
    calib = jnp.asarray(
        np.random.default_rng(seed).integers(0, 96, size=(2, 16)))
    cfg = QuantConfig(wbits=4, nsamples=2, groupsize=groupsize,
                      act_order=act_order, static_groups=act_order)
    res = quantize_model(spec, params, calib, cfg, log=lambda s: None)
    pack_model(spec, params, res.quantizers, cfg, tp=tp)
    return spec, params


def test_shardmap_tp_actorder_packed_matches_single():
    """Act-order packed weights (stored permuted, run-time x gather) under
    shard_map TP: col shards use the replicated perm, row shards all_gather
    x and take their perm slice — logits must match single-device."""
    from gptq_tpu.parallel.tp import make_tp_forward

    spec, params = _packed_serving_model(act_order=True)
    assert params["layers"][0]["o"]["w"].perm is not None  # row + perm
    ids = jnp.asarray(np.random.default_rng(8).integers(0, 96, size=(2, 16)))
    want, _ = model_forward(spec, params, ids)
    mesh = make_mesh(tp=2, dp=1)
    local, fwd = make_tp_forward(spec, params, mesh)
    got = fwd(local, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_shardmap_tp_fused_a8_decode_matches_single():
    """The fastest serving config — q/k/v + gate/up fusion with dynamic
    int8 activations — under shard_map TP (shard-interleaved fused layout)
    must produce the same tokens as the single-device fused a8 engine."""
    from gptq_tpu.models.common import KVCache, fuse_serving
    from gptq_tpu.parallel.tp import make_tp_decode_step

    spec, params = _packed_serving_model(act_order=True)
    mesh = make_mesh(tp=2, dp=1)
    local, step = make_tp_decode_step(spec, params, mesh, fuse=True, a8=True)
    assert "qkv_fused" in local["layers"][0]
    assert "gateup_fused" in local["layers"][0]

    single = fuse_serving(spec, params, a8=True)
    cache_tp = KVCache.init(spec, 1, 8, jnp.float32)
    cache_1 = KVCache.init(spec, 1, 8, jnp.float32)
    toks = [3, 7, 11]
    for t in toks:
        tok = jnp.asarray([[t]])
        logits_tp, cache_tp = step(local, cache_tp, tok)
        want_full, cache_1 = model_forward(spec, single, tok, cache_1)
        # row-sharded linears quantize activations per SHARD-local row
        # slice (a finer grid than the single-device full-row absmax), so
        # logits differ at the int8-rounding level; tokens must agree
        want = np.asarray(want_full[:, -1])
        rel = np.abs(np.asarray(logits_tp) - want).max() / np.abs(want).max()
        assert rel < 0.05, rel
        assert int(jnp.argmax(logits_tp)) == int(
            jnp.argmax(want_full[:, -1]))


def test_lr_schedule_and_grad_accum():
    """HF-Trainer-parity knobs: warmup+decay schedules and MultiSteps
    gradient accumulation (params update once every k micro-steps)."""
    import jax.numpy as jnp
    from gptq_tpu.finetune import make_optimizer, make_schedule

    s = make_schedule(1e-3, "linear", total_steps=100, warmup_steps=10)
    assert float(s(0)) == 0.0
    assert abs(float(s(10)) - 1e-3) < 1e-9
    assert float(s(100)) < float(s(50)) < float(s(10))
    c = make_schedule(1e-3, "cosine", total_steps=100, warmup_steps=0)
    assert abs(float(c(0)) - 1e-3) < 1e-9 and float(c(99)) < 1e-4

    params = init_params(SPEC, jax.random.PRNGKey(9))
    batch = jnp.asarray(np.random.default_rng(9).integers(0, 97, size=(2, 16)))
    opt = make_optimizer("adamw", lr=1e-3, grad_accum=2)
    from gptq_tpu.finetune import make_train_step

    init, step = make_train_step(SPEC, opt)
    st = init(params)
    p1, st, _ = step(params, st, batch)
    # first micro-step: gradients accumulate, params unchanged
    d0 = max(float(jnp.max(jnp.abs(a - b)))
             for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p1)))
    assert d0 == 0.0
    p2, st, _ = step(p1, st, batch)
    d1 = max(float(jnp.max(jnp.abs(a - b)))
             for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)))
    assert d1 > 0.0


def test_opt_state_checkpoint_roundtrip(tmp_path):
    """Resume must restore the optax state (schedule count, moments,
    accumulation counter) — a fresh init would restart LR warmup from 0
    (reference Trainer restores optimizer.pt, finetune/train.py:601-607)."""
    import jax.numpy as jnp
    from gptq_tpu.finetune import (load_opt_state, make_optimizer,
                                   make_train_step, save_opt_state)

    params = init_params(SPEC, jax.random.PRNGKey(3))
    batch = jnp.asarray(np.random.default_rng(3).integers(0, 97, size=(2, 16)))
    opt = make_optimizer("adafactor", lr=1e-3, schedule="linear",
                         total_steps=50, warmup_steps=10, grad_accum=2)
    init, step = make_train_step(SPEC, opt)
    st = init(params)
    p, st, _ = step(params, st, batch)
    p, st, _ = step(p, st, batch)
    p, st, _ = step(p, st, batch)

    path = str(tmp_path / "opt_state.npz")
    save_opt_state(path, st)
    restored = load_opt_state(path, init(params))
    for a, b in zip(jax.tree.leaves(st), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # continuing from the restored state matches continuing from the live
    # state exactly (schedule step included)
    p1, _, _ = step(p, st, batch)
    p2, _, _ = step(p, restored, batch)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_clm_accuracy_metric():
    import jax.numpy as jnp
    from gptq_tpu.finetune import clm_accuracy

    params = init_params(SPEC, jax.random.PRNGKey(10))
    batch = jnp.asarray(np.random.default_rng(10).integers(0, 97, size=(2, 16)))
    acc = float(clm_accuracy(SPEC, params, batch))
    assert 0.0 <= acc <= 1.0


def test_shardmap_tp_prefill_then_decode_matches_single():
    """Serving under TP: one multi-token PREFILL dispatch fills the
    sharded cache (model_forward appends T tokens at cache.length), then
    single-token decode continues — no token-by-token prompt loop."""
    from gptq_tpu.models.common import KVCache
    from gptq_tpu.parallel.tp import make_tp_decode_step

    params = init_params(SPEC, jax.random.PRNGKey(21))
    mesh = make_mesh(tp=2, dp=1)
    local, step = make_tp_decode_step(SPEC, params, mesh)

    prompt = jnp.asarray([[3, 1, 4, 1, 5, 9]])
    tok = jnp.asarray([[2]])
    cache = KVCache.init(SPEC, 1, 16, jnp.float32)
    logits_tp, cache_tp = step(local, cache, prompt)
    logits2_tp, _ = step(local, cache_tp, tok)

    c1 = KVCache.init(SPEC, 1, 16, jnp.float32)
    want, c1 = model_forward(SPEC, params, prompt, c1)
    want2, _ = model_forward(SPEC, params, tok, c1)
    np.testing.assert_allclose(np.asarray(logits_tp),
                               np.asarray(want[:, -1]), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(logits2_tp),
                               np.asarray(want2[:, -1]), rtol=2e-3, atol=2e-3)
