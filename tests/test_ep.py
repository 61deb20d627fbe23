"""Mixture-of-experts + expert parallelism tests on the virtual CPU mesh:
the GShard-style capacity dispatch (models/moe.py), the shard_map EP paths
(parallel/ep.py — experts sharded, one psum), the GSPMD training path, and
GPTQ quantization of MoE models' attention linears."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gptq_tpu.models.common import (ArchSpec, KVCache, init_params,
                                    model_forward)

MOE_SPEC = ArchSpec(arch="llama", n_layers=2, hidden=48, n_heads=4,
                    n_kv_heads=2, ffn=64, vocab=89, max_pos=64,
                    norm_eps=1e-5, act="silu", pos="rope",
                    norm_type="rmsnorm", linear_bias=False,
                    tie_embeddings=False, n_experts=4, expert_top_k=2,
                    expert_capacity=2.0)


def _ids(spec, B=2, T=16, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).integers(0, spec.vocab, size=(B, T)))


def test_route_capacity_and_slot_priority():
    """Every expert receives at most C tokens; when capacity binds, all
    tokens' first choices are placed before any second choice."""
    from gptq_tpu.models.moe import expert_capacity, route

    spec = MOE_SPEC
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(12, spec.hidden)), jnp.float32)
    rw = jnp.asarray(rng.normal(size=(spec.n_experts, spec.hidden)),
                     jnp.float32)
    dispatch, combine, aux = route(spec, rw, x)
    C = expert_capacity(spec, 12)
    d = np.asarray(dispatch)
    assert d.shape == (12, spec.n_experts, C)
    # one token per (expert, slot)
    assert (d.sum(axis=0) <= 1.0 + 1e-6).all()
    # each token occupies at most top_k slots
    assert (d.sum(axis=(1, 2)) <= spec.expert_top_k + 1e-6).all()
    # combine weights live only where dispatch does, and are positive there
    c = np.asarray(combine)
    assert ((c > 0) <= (d > 0)).all()

    # force capacity pressure: identical tokens all route identically, so
    # with C < N only C first choices fit and no second choice may evict a
    # first choice
    tight = ArchSpec(**{**MOE_SPEC.__dict__, "expert_capacity": 0.5})
    x1 = jnp.broadcast_to(x[:1], (8, spec.hidden))
    d1, c1, _ = route(tight, rw, x1)
    from gptq_tpu.models.moe import expert_capacity as cap

    C1 = cap(tight, 8)
    d1 = np.asarray(d1)
    top1 = int(np.argmax(np.asarray(c1).sum(axis=2).sum(axis=0)))
    # the top-1 expert is filled to capacity with first choices
    assert d1[:, top1].sum() == C1


def test_moe_forward_runs_and_differs_from_uniform_routing():
    """MoE model forward produces finite logits, and the router actually
    differentiates tokens (different tokens select different experts)."""
    from gptq_tpu.models.moe import route

    params = init_params(MOE_SPEC, jax.random.PRNGKey(0))
    ids = _ids(MOE_SPEC)
    logits, _ = model_forward(MOE_SPEC, params, ids)
    assert np.isfinite(np.asarray(logits)).all()

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(16, MOE_SPEC.hidden)), jnp.float32)
    dispatch, _, _ = route(MOE_SPEC, params["layers"][0]["router"]["w"], x)
    used = (np.asarray(dispatch).sum(axis=(0, 2)) > 0).sum()
    assert used >= 2  # more than one expert in play


def test_ep_forward_matches_dense():
    """shard_map EP (experts sharded over "ep", one psum) == the dense
    single-device forward."""
    from gptq_tpu.parallel.ep import make_ep_forward, make_ep_mesh

    params = init_params(MOE_SPEC, jax.random.PRNGKey(1))
    ids = _ids(MOE_SPEC, seed=2)
    want, _ = model_forward(MOE_SPEC, params, ids)

    for ep in (2, 4):
        mesh = make_ep_mesh(ep)
        fwd = make_ep_forward(MOE_SPEC, params, mesh)
        got = fwd(params, ids)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)


def test_ep_decode_matches_dense():
    """Prefill + decode through the EP step: logits match the dense
    cache path token for token."""
    from gptq_tpu.parallel.ep import make_ep_decode_step, make_ep_mesh

    params = init_params(MOE_SPEC, jax.random.PRNGKey(2))
    prompt = _ids(MOE_SPEC, B=1, T=6, seed=4)
    tok = jnp.asarray([[3]])

    c_ref = KVCache.init(MOE_SPEC, 1, 16, jnp.float32)
    want1, c_ref = model_forward(MOE_SPEC, params, prompt, c_ref)
    want2, _ = model_forward(MOE_SPEC, params, tok, c_ref)

    mesh = make_ep_mesh(2)
    step = make_ep_decode_step(MOE_SPEC, params, mesh)
    cache = KVCache.init(MOE_SPEC, 1, 16, jnp.float32)
    got1, cache = step(params, cache, prompt)
    got2, _ = step(params, cache, tok)
    np.testing.assert_allclose(np.asarray(got1), np.asarray(want1[:, -1]),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2[:, -1]),
                               rtol=2e-4, atol=2e-4)


def test_ep_tp_forward_matches_dense():
    """2-D composition: attention sharded over tp, experts over ep."""
    from gptq_tpu.parallel.ep import make_ep_tp_forward

    params = init_params(MOE_SPEC, jax.random.PRNGKey(3))
    ids = _ids(MOE_SPEC, seed=6)
    want, _ = model_forward(MOE_SPEC, params, ids)

    from jax.sharding import Mesh

    devs = np.asarray(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devs, ("ep", "tp"))
    local, fwd = make_ep_tp_forward(MOE_SPEC, params, mesh)
    got = fwd(local, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-4, atol=3e-4)


def test_moe_gspmd_train_step_decreases_loss():
    """The standard GSPMD train step handles MoE params (expert stacks
    shard over "tp" via param_specs; grads flow through the routed FFN)."""
    from gptq_tpu.finetune import make_optimizer, make_train_step
    from gptq_tpu.parallel.mesh import make_mesh, shard_params

    params = init_params(MOE_SPEC, jax.random.PRNGKey(4))
    mesh = make_mesh(tp=4, dp=2)
    params = shard_params(MOE_SPEC, params, mesh)
    opt = make_optimizer("adafactor", lr=3e-3)
    init, step = make_train_step(MOE_SPEC, opt, mesh=mesh)
    st = init(params)
    batch = _ids(MOE_SPEC, B=4, T=16, seed=7)
    losses = []
    for _ in range(5):
        params, st, loss = step(params, st, batch)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_moe_model_quantizes_attention_linears():
    """GPTQ pipeline on an MoE model: attention linears quantize/pack,
    router + experts stay dense, and the packed model still serves."""
    from gptq_tpu.config import QuantConfig
    from gptq_tpu.ops.pack import PackedWeight
    from gptq_tpu.pipeline import pack_model, quantize_model

    spec = ArchSpec(**{**MOE_SPEC.__dict__, "hidden": 64, "ffn": 64})
    params = init_params(spec, jax.random.PRNGKey(5))
    calib = _ids(spec, B=2, T=16, seed=8)
    cfg = QuantConfig(wbits=4, nsamples=2)
    res = quantize_model(spec, params, calib, cfg, log=lambda s: None)
    assert any(".q_proj" in k for k in res.quantizers)
    assert not any("gate" in k or "expert" in k or "router" in k
                   for k in res.quantizers)
    pack_model(spec, params, res.quantizers, cfg)
    bp = params["layers"][0]
    assert isinstance(bp["q"]["w"], PackedWeight)
    assert isinstance(bp["experts"]["gate"], jax.Array)  # untouched
    logits, _ = model_forward(spec, params, _ids(spec, seed=9))
    assert np.isfinite(np.asarray(logits)).all()


def test_moe_aux_loss_collected_and_trains():
    """clm_loss with moe_aux_weight adds the Switch load-balancing term
    (>= 1.0 by Cauchy-Schwarz, == 1.0 under uniform routing) and the
    train step drives expert usage toward balance."""
    from gptq_tpu.finetune import clm_loss
    from gptq_tpu.models.moe import route

    params = init_params(MOE_SPEC, jax.random.PRNGKey(6))
    batch = _ids(MOE_SPEC, B=2, T=16, seed=10)
    pure = float(clm_loss(MOE_SPEC, params, batch))
    with_aux = float(clm_loss(MOE_SPEC, params, batch, moe_aux_weight=0.5))
    assert with_aux > pure  # aux > 0
    # the aux term itself is >= 1 (perfect balance == 1)
    aux = (with_aux - pure) / 0.5 * MOE_SPEC.n_layers / MOE_SPEC.n_layers
    assert aux >= 1.0 - 1e-4

    # uniform router (zero weights -> uniform probs; top_k ties) gives
    # f_e = P_e = 1/E per selected expert -> aux == 1 exactly
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(64, MOE_SPEC.hidden)), jnp.float32)
    _, _, a = route(MOE_SPEC,
                    jnp.zeros((MOE_SPEC.n_experts, MOE_SPEC.hidden)), x)
    assert abs(float(a) - 1.0) < 1e-5


def test_quantize_experts_int8_serving():
    """int8-RTN expert stacks: codes + per-row scales replace the dense
    stacks in place, logits stay within RTN rounding of the dense model,
    and the quantized experts still shard under EP (scale planes shard
    their expert dim too)."""
    from gptq_tpu.models.moe import quantize_experts
    from gptq_tpu.parallel.ep import make_ep_forward, make_ep_mesh

    params = init_params(MOE_SPEC, jax.random.PRNGKey(7))
    ids = _ids(MOE_SPEC, seed=12)
    want, _ = model_forward(MOE_SPEC, params, ids)

    import copy

    qparams = copy.deepcopy(params)
    quantize_experts(qparams)
    ex = qparams["layers"][0]["experts"]
    assert ex["gate"].dtype == jnp.int8 and "gate_scale" in ex
    got, _ = model_forward(MOE_SPEC, qparams, ids)
    rel = (np.abs(np.asarray(got) - np.asarray(want)).max()
           / np.abs(np.asarray(want)).max())
    assert rel < 0.02, rel  # int8 rounding on the expert weights only

    mesh = make_ep_mesh(2)
    fwd = make_ep_forward(MOE_SPEC, qparams, mesh)
    got_ep = fwd(qparams, ids)
    np.testing.assert_allclose(np.asarray(got_ep), np.asarray(got),
                               rtol=2e-4, atol=2e-4)


def test_gptq_experts_beat_rtn():
    """Hessian-aware expert quantization (per-expert Hessians from
    dispatched calibration tokens, true-sequential gate/up -> down) must
    beat same-grid RTN on output error over the calibration distribution
    — the reference's own DEBUG invariant (gptq.py:278-282) lifted to the
    routed-FFN stacks."""
    import copy

    from gptq_tpu.config import QuantConfig
    from gptq_tpu.models.moe import gptq_quantize_experts
    from gptq_tpu.quant.rtn import rtn_quantize_weight

    params = init_params(MOE_SPEC, jax.random.PRNGKey(9))
    calib = _ids(MOE_SPEC, B=8, T=16, seed=14)
    want, _ = model_forward(MOE_SPEC, params, calib)

    rtn = copy.deepcopy(params)
    for bp in rtn["layers"]:
        ex = bp["experts"]
        for name in ("gate", "up", "down"):
            w = np.asarray(ex[name])
            ex[name] = jnp.asarray(np.stack([
                np.asarray(rtn_quantize_weight(jnp.asarray(w[e]), bits=3))
                for e in range(MOE_SPEC.n_experts)]))
    got_rtn, _ = model_forward(MOE_SPEC, rtn, calib)
    mse_rtn = float(jnp.mean((got_rtn - want) ** 2))

    gptq = copy.deepcopy(params)
    losses = gptq_quantize_experts(
        MOE_SPEC, gptq, calib.reshape(-1, 16),
        QuantConfig(wbits=3, nsamples=8))
    assert losses and all(np.isfinite(v) for v in losses.values())
    got_gptq, _ = model_forward(MOE_SPEC, gptq, calib)
    mse_gptq = float(jnp.mean((got_gptq - want) ** 2))
    assert mse_gptq < mse_rtn, (mse_gptq, mse_rtn)


def test_mixtral_state_dict_conversion():
    """HF Mixtral checkpoints (llama attention + block_sparse_moe routed
    experts) convert: gate.weight -> router, experts.N.{w1,w3,w2} ->
    stacked gate/up/down, and the converted model forwards finitely. The
    spec derives num_local_experts / num_experts_per_tok from the HF
    config."""
    from types import SimpleNamespace

    from gptq_tpu.models.convert import params_from_state_dict
    from gptq_tpu.models.registry import spec_from_hf_config

    cfg = SimpleNamespace(
        model_type="mixtral", num_hidden_layers=2, hidden_size=48,
        num_attention_heads=4, num_key_value_heads=2, head_dim=None,
        intermediate_size=64, vocab_size=89, max_position_embeddings=64,
        rms_norm_eps=1e-5, rope_theta=10000.0, tie_word_embeddings=False,
        num_local_experts=4, num_experts_per_tok=2)
    spec = spec_from_hf_config(cfg)
    assert spec.arch == "llama" and spec.n_experts == 4
    assert spec.expert_top_k == 2

    rng = np.random.default_rng(23)

    def t(*shape):
        return (rng.normal(size=shape) * 0.05).astype(np.float32)

    sd = {"model.embed_tokens.weight": t(89, 48),
          "model.norm.weight": np.ones(48, np.float32),
          "lm_head.weight": t(89, 48)}
    for i in range(2):
        lp = f"model.layers.{i}."
        sd[lp + "self_attn.q_proj.weight"] = t(48, 48)
        sd[lp + "self_attn.k_proj.weight"] = t(24, 48)
        sd[lp + "self_attn.v_proj.weight"] = t(24, 48)
        sd[lp + "self_attn.o_proj.weight"] = t(48, 48)
        sd[lp + "input_layernorm.weight"] = np.ones(48, np.float32)
        sd[lp + "post_attention_layernorm.weight"] = np.ones(48, np.float32)
        sd[lp + "block_sparse_moe.gate.weight"] = t(4, 48)
        for e in range(4):
            ep = f"{lp}block_sparse_moe.experts.{e}."
            sd[ep + "w1.weight"] = t(64, 48)
            sd[ep + "w3.weight"] = t(64, 48)
            sd[ep + "w2.weight"] = t(48, 64)

    params = params_from_state_dict(sd, spec)
    bp = params["layers"][0]
    assert bp["router"]["w"].shape == (4, 48)
    assert bp["experts"]["gate"].shape == (4, 64, 48)
    assert bp["experts"]["down"].shape == (4, 48, 64)
    logits, _ = model_forward(spec, params, _ids(spec, seed=24))
    assert np.isfinite(np.asarray(logits)).all()


def test_moe_full_quantization_recipe():
    """The complete MoE quantization recipe end-to-end: GPTQ the
    attention linears (pipeline), GPTQ the expert stacks (per-expert
    Hessians), compress experts to int8 codes for serving, pack the
    attention linears — and the result still serves (prefill + cached
    decode) with finite logits close to the dense model."""
    import copy

    from gptq_tpu.config import QuantConfig
    from gptq_tpu.models.moe import gptq_quantize_experts, quantize_experts
    from gptq_tpu.ops.pack import PackedWeight
    from gptq_tpu.pipeline import pack_model, quantize_model

    spec = ArchSpec(**{**MOE_SPEC.__dict__, "hidden": 64, "ffn": 64})
    params = init_params(spec, jax.random.PRNGKey(10))
    calib = _ids(spec, B=4, T=16, seed=16).reshape(-1, 16)
    want, _ = model_forward(spec, params, calib)

    q = copy.deepcopy(params)
    cfg = QuantConfig(wbits=4, nsamples=4)
    res = quantize_model(spec, q, calib, cfg, log=lambda s: None)
    gptq_quantize_experts(spec, q, calib, cfg)
    quantize_experts(q, bits=8)
    pack_model(spec, q, res.quantizers, cfg)
    assert isinstance(q["layers"][0]["q"]["w"], PackedWeight)
    assert q["layers"][0]["experts"]["gate"].dtype == jnp.int8

    got, _ = model_forward(spec, q, calib)
    rel = (np.abs(np.asarray(got) - np.asarray(want)).max()
           / np.abs(np.asarray(want)).max())
    assert np.isfinite(np.asarray(got)).all()
    assert rel < 0.25, rel  # 4-bit everything on a random tiny model

    cache = KVCache.init(spec, 1, 16, jnp.float32)
    l1, cache = model_forward(spec, q, calib[:1, :8], cache)
    l2, _ = model_forward(spec, q, jnp.asarray([[3]]), cache)
    assert np.isfinite(np.asarray(l2)).all()


def test_decode_engine_serves_moe_model():
    """DecodeEngine (fusion on, greedy generate) serves a quantized MoE
    model: qkv fusion applies, gateup fusion skips the routed layers, and
    generation matches the unfused model_forward stream."""
    import copy

    from gptq_tpu.config import QuantConfig
    from gptq_tpu.engine.decode import DecodeEngine
    from gptq_tpu.models.moe import quantize_experts
    from gptq_tpu.pipeline import pack_model, quantize_model

    spec = ArchSpec(**{**MOE_SPEC.__dict__, "hidden": 64, "ffn": 64})
    params = init_params(spec, jax.random.PRNGKey(11))
    calib = _ids(spec, B=2, T=16, seed=18)
    cfg = QuantConfig(wbits=4, nsamples=2)
    res = quantize_model(spec, params, calib, cfg, log=lambda s: None)
    quantize_experts(params)
    pack_model(spec, params, res.quantizers, cfg)

    ref = copy.deepcopy(params)
    prompt = np.asarray([[5, 3, 8, 1]])
    eng = DecodeEngine(spec, params, max_len=32, cache_dtype=jnp.float32)
    toks = eng.generate(prompt, max_new_tokens=5)

    cache = KVCache.init(spec, 1, 32, jnp.float32)
    logits, cache = model_forward(spec, ref, jnp.asarray(prompt), cache)
    want = []
    for _ in range(5):
        nxt = int(jnp.argmax(logits[0, -1]))
        want.append(nxt)
        logits, cache = model_forward(spec, ref, jnp.asarray([[nxt]]), cache)
    assert list(np.asarray(toks)[0][-5:]) == want, (toks, want)


def test_ep_tp_decode_packed_attention_int8_experts():
    """MoE serving composition: packed fused-a8 ATTENTION over tp, int8
    EXPERT stacks over ep, on one (ep, tp) mesh — prefill + decode track
    the single-device stream of the same quantized model."""
    import copy

    from gptq_tpu.config import QuantConfig
    from gptq_tpu.models.moe import quantize_experts
    from gptq_tpu.parallel.ep import make_ep_tp_decode_step
    from gptq_tpu.pipeline import pack_model, quantize_model
    from jax.sharding import Mesh

    spec = ArchSpec(arch="llama", n_layers=1, hidden=1024, n_heads=4,
                    n_kv_heads=4, ffn=256, vocab=96, max_pos=64,
                    norm_eps=1e-5, act="silu", pos="rope",
                    norm_type="rmsnorm", linear_bias=False,
                    tie_embeddings=False, n_experts=4, expert_top_k=2,
                    expert_capacity=2.0)
    params = init_params(spec, jax.random.PRNGKey(12))
    calib = _ids(spec, B=2, T=16, seed=20)
    cfg = QuantConfig(wbits=4, nsamples=2)
    res = quantize_model(spec, params, calib, cfg, log=lambda s: None)
    quantize_experts(params)
    pack_model(spec, params, res.quantizers, cfg, tp=2)
    single = copy.deepcopy(params)

    prompt = _ids(spec, B=1, T=6, seed=21)
    tok = jnp.asarray([[3]])
    c_ref = KVCache.init(spec, 1, 16, jnp.float32)
    want1, c_ref = model_forward(spec, single, prompt, c_ref)
    want2, _ = model_forward(spec, single, tok, c_ref)

    devs = np.asarray(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devs, ("ep", "tp"))
    local, step = make_ep_tp_decode_step(spec, params, mesh,
                                         fuse=True, a8=True)
    cache = KVCache.init(spec, 1, 16, jnp.float32)
    got1, cache = step(local, cache, prompt)
    got2, _ = step(local, cache, tok)
    for got, want in ((got1, want1[:, -1]), (got2, want2[:, -1])):
        rel = (np.abs(np.asarray(got) - np.asarray(want)).max()
               / np.abs(np.asarray(want)).max())
        assert rel < 0.05, rel  # per-shard int8 act grids


def test_pp_training_moe_model():
    """GPipe pipeline training composes with MoE layers: the pp loss
    matches the flat clm_loss (both pure CE) and a train step runs."""
    import optax

    from gptq_tpu.finetune import clm_loss
    from gptq_tpu.parallel.pp import (make_pp_loss, make_pp_mesh,
                                      make_pp_train_step,
                                      stack_stage_params)

    params = init_params(MOE_SPEC, jax.random.PRNGKey(13))
    batch = _ids(MOE_SPEC, B=4, T=16, seed=22)
    want = float(clm_loss(MOE_SPEC, params, batch))

    mesh = make_pp_mesh(2)
    stacked = stack_stage_params(MOE_SPEC, params, 2, mesh)
    got = float(jax.jit(make_pp_loss(MOE_SPEC, mesh, n_micro=2))(
        stacked, batch))
    assert abs(got - want) < 5e-5, (got, want)

    # the aux-inclusive pp objective matches the flat train objective:
    # every stage contributes its layers' Switch terms through the
    # schedule (a pp run must not silently train a different loss). The
    # aux is a mean of PER-MICRO-BATCH estimates — nonlinear in the token
    # grouping, so it differs from the whole-batch aux at the estimator
    # level (standard Switch behavior), not to float tolerance.
    want_aux = float(clm_loss(MOE_SPEC, params, batch,
                              moe_aux_weight=0.01))
    got_aux = float(jax.jit(make_pp_loss(
        MOE_SPEC, mesh, n_micro=2, moe_aux_weight=0.01))(stacked, batch))
    assert abs(got_aux - want_aux) < 2e-3, (got_aux, want_aux)
    assert got_aux > got + 5e-3  # the aux term is actually present

    init, step = make_pp_train_step(
        MOE_SPEC, optax.adam(1e-3), mesh, n_micro=2)
    stacked, _, loss = step(stacked, init(stacked), batch)
    assert np.isfinite(float(loss))


def test_sp_prefill_moe_dropless_matches_flat():
    """Sequence-parallel prefill of an MoE model: each sp chunk routes
    its own tokens, so per-chunk capacity differs from the flat model's
    whole-sequence capacity — under a DROPLESS spec (capacity factor
    E/k, what converted HF Mixtral checkpoints get) both drop nothing
    and the logits match exactly."""
    from gptq_tpu.parallel.sp import make_sp_mesh, make_sp_prefill

    spec = ArchSpec(**{**MOE_SPEC.__dict__,
                       "expert_capacity": MOE_SPEC.n_experts
                       / MOE_SPEC.expert_top_k})
    params = init_params(spec, jax.random.PRNGKey(14))
    ids = _ids(spec, B=2, T=16, seed=23)
    want, _ = model_forward(spec, params, ids)

    mesh = make_sp_mesh(2)
    prefill, _ = make_sp_prefill(spec, params, mesh,
                                 cache_dtype=jnp.float32, max_len=16)
    got, _ = prefill(ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_ep_decode_int8_cache():
    """The int8 KV cache composes with EP decode (scale planes replicate
    like the values — attention is dense under ep-only)."""
    from gptq_tpu.parallel.ep import make_ep_decode_step, make_ep_mesh

    params = init_params(MOE_SPEC, jax.random.PRNGKey(15))
    prompt = _ids(MOE_SPEC, B=1, T=6, seed=26)
    tok = jnp.asarray([[4]])

    c_ref = KVCache.init(MOE_SPEC, 1, 16, jnp.int8)
    want1, c_ref = model_forward(MOE_SPEC, params, prompt, c_ref)
    want2, _ = model_forward(MOE_SPEC, params, tok, c_ref)

    mesh = make_ep_mesh(2)
    step = make_ep_decode_step(MOE_SPEC, params, mesh, int8_cache=True)
    cache = KVCache.init(MOE_SPEC, 1, 16, jnp.int8)
    got1, cache = step(params, cache, prompt)
    got2, _ = step(params, cache, tok)
    np.testing.assert_allclose(np.asarray(got1), np.asarray(want1[:, -1]),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2[:, -1]),
                               rtol=2e-4, atol=2e-4)


def test_ep_forward_matches_dense_capacity_bound():
    """The capacity-bound GShard path (C < N, tokens can drop) under EP
    must still match the dense single-device forward — the drops are
    deterministic, so both paths drop identically."""
    from gptq_tpu.parallel.ep import make_ep_forward, make_ep_mesh

    tight = ArchSpec(**{**MOE_SPEC.__dict__, "expert_capacity": 0.75})
    from gptq_tpu.models.moe import expert_capacity

    assert expert_capacity(tight, 32) < 32  # really capacity-bound
    params = init_params(tight, jax.random.PRNGKey(16))
    ids = _ids(tight, seed=27)
    want, _ = model_forward(tight, params, ids)

    mesh = make_ep_mesh(2)
    fwd = make_ep_forward(tight, params, mesh)
    got = fwd(params, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
