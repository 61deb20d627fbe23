"""Collective-pattern regression (VERDICT r3 #6): the compiled SPMD step
programs must communicate exactly what the designs promise — tp decode
pays 2 psums/layer (o + down row-parallel epilogues, the Megatron
pattern), sp SPCache decode pays 1 pmax + 2 psums/layer (the exact
online-softmax combine), ep decode pays 1 psum/MoE-layer (replicated-
activation expert merge), and GPipe training moves activations by
collective-permute only. Parsed from the compiled HLO via
gptq_tpu/parallel/hlo_report.py — the same extraction that produces
results/scaling_hlo.json (scripts/scaling_hlo.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gptq_tpu.models.common import ArchSpec, KVCache, init_params
from gptq_tpu.parallel.hlo_report import collective_report, parse_collectives


def tiny_spec(n_layers, **kw):
    d = dict(arch="llama", n_layers=n_layers, hidden=128, n_heads=4,
             n_kv_heads=4, ffn=256, vocab=256, max_pos=64, act="silu",
             pos="rope", norm_type="rmsnorm", linear_bias=False,
             tie_embeddings=False)
    d.update(kw)
    return ArchSpec(**d)


def _per_layer_counts(rep2, rep4):
    ops = set(rep2["counts"]) | set(rep4["counts"])
    return {op: (rep4["counts"].get(op, 0) - rep2["counts"].get(op, 0)) // 2
            for op in ops}


def test_parse_collectives_shapes_and_groups():
    txt = """
  %ar = f32[4,128]{1,0} all-reduce(f32[4,128]{1,0} %x), replica_groups={{0,1,2,3}}, to_apply=%add
  %ag = bf16[32,64]{1,0} all-gather(bf16[8,64]{1,0} %y), replica_groups=[2,4]<=[8], dimensions={0}
  %cp = s8[16]{0} collective-permute(s8[16]{0} %z), source_target_pairs={{0,1},{1,0}}
"""
    ops = parse_collectives(txt, 8)
    assert [o["op"] for o in ops] == ["all-reduce", "all-gather",
                                      "collective-permute"]
    assert ops[0]["payload_bytes"] == 4 * 128 * 4 and ops[0]["group"] == 4
    assert ops[0]["sent_bytes"] == pytest.approx(2 * 4 * 128 * 4 * 3 / 4)
    assert ops[1]["payload_bytes"] == 32 * 64 * 2 and ops[1]["group"] == 4
    assert ops[2]["payload_bytes"] == 16 and ops[2]["group"] == 8
    assert ops[2]["sent_bytes"] == 16


def test_tp_decode_two_psums_per_layer():
    from gptq_tpu.parallel.mesh import make_mesh
    from gptq_tpu.parallel.tp import make_tp_decode_step

    devs = jax.devices()[:4]
    mesh = make_mesh(tp=4, dp=1, devices=devs)
    tok = jnp.asarray([[1]])
    reps = {}
    for nl in (2, 4):
        spec = tiny_spec(nl)
        params = init_params(spec, jax.random.PRNGKey(0))
        local, step = make_tp_decode_step(spec, params, mesh)
        cache = KVCache.init(spec, 1, 32, jnp.float32)
        reps[nl] = collective_report(step, local, cache, tok, n_devices=4)
    per_layer = _per_layer_counts(reps[2], reps[4])
    # Megatron: one psum after o, one after down — nothing else scales
    # with depth
    assert per_layer.pop("all-reduce") == 2, reps
    assert all(v == 0 for v in per_layer.values()), per_layer
    # fixed part: the vocab-sharded head all-gathers logits once
    fixed_ag = (reps[2]["counts"].get("all-gather", 0))
    assert fixed_ag == 1, reps[2]["counts"]


def test_sp_decode_exact_combine_per_layer():
    from gptq_tpu.parallel.sp import (SPCache, _chunk_positions,
                                      make_sp_decode_step, make_sp_mesh)

    devs = jax.devices()[:4]
    mesh = make_sp_mesh(4, devices=devs)
    tok = jnp.asarray([[1]])
    ml_total, prefix = 64, 32
    ml = ml_total // 4
    reps = {}
    for nl in (2, 4):
        spec = tiny_spec(nl)
        params = init_params(spec, jax.random.PRNGKey(0))
        kvh, hd = spec.kv_heads, spec.hd
        spc = SPCache(
            k=jnp.zeros((nl, 1, ml_total, kvh, hd), jnp.float32),
            v=jnp.zeros((nl, 1, ml_total, kvh, hd), jnp.float32),
            pos=jnp.asarray(_chunk_positions(prefix, 4, ml)),
            length=jnp.asarray(prefix, jnp.int32),
            meta=(prefix // 4, ml))
        step = make_sp_decode_step(spec, params, mesh, spc.meta,
                                   check_capacity=False)
        reps[nl] = collective_report(step, spc, tok, n_devices=4)
    # the r5 deferred-write sp step unrolls layers as a Python loop (the
    # partial-attention kernel needs STATIC layer indices into the
    # unmodified slab stack), so the combine appears once PER LAYER in
    # program text: exact cross-device online-softmax combine =
    # pmax(m) + psum(l, acc) (XLA merges the same-shape psums into one
    # variadic all-reduce -> 2 all-reduces/layer); the cache itself
    # NEVER moves — no all-gather/permute of slots, nothing else scales
    # with depth
    per_layer = _per_layer_counts(reps[2], reps[4])
    assert per_layer.pop("all-reduce") == 2, (reps[2], reps[4])
    assert all(v == 0 for v in per_layer.values()), per_layer
    fixed = {op: reps[2]["counts"].get(op, 0) - 2 * 2
             for op in ("all-reduce",)}
    assert fixed["all-reduce"] == 0, reps[2]  # no depth-independent comms
    H, hd = 4, 32
    combine_bytes = (H * hd * 4) + 2 * (H * 4)  # acc + (m, l) per head
    # payload_bytes sums over the program: nl=4 layers x one combine each
    assert reps[4]["payload_bytes"]["all-reduce"] == pytest.approx(
        4 * combine_bytes), reps[4]["payload_bytes"]


def test_ep_decode_one_psum_per_layer():
    from gptq_tpu.parallel.ep import make_ep_decode_step, make_ep_mesh

    devs = jax.devices()[:4]
    mesh = make_ep_mesh(4, devices=devs)
    tok = jnp.asarray([[1]])
    reps = {}
    for nl in (2, 4):
        spec = tiny_spec(nl, n_experts=4, expert_top_k=2)
        params = init_params(spec, jax.random.PRNGKey(0))
        step = make_ep_decode_step(spec, params, mesh)
        cache = KVCache.init(spec, 1, 32, jnp.float32)
        reps[nl] = collective_report(step, params, cache, tok, n_devices=4)
    per_layer = _per_layer_counts(reps[2], reps[4])
    # replicated-activation expert merge: ONE psum per MoE layer, no
    # all_to_all (GShard dispatch stays local)
    assert per_layer.pop("all-reduce") == 1, reps
    assert all(v == 0 for v in per_layer.values()), per_layer


def test_pp_train_moves_activations_by_permute_only():
    import optax

    from gptq_tpu.parallel.pp import (make_pp_mesh, make_pp_train_step,
                                      stack_stage_params)

    devs = jax.devices()[:2]
    mesh = make_pp_mesh(pp=2, devices=devs)
    spec = tiny_spec(4)
    params = init_params(spec, jax.random.PRNGKey(0))
    stacked = stack_stage_params(spec, params, 2, mesh)
    init_state, step = make_pp_train_step(spec, optax.sgd(1e-2), mesh,
                                          n_micro=2)
    opt_state = init_state(stacked)
    batch = jnp.asarray(np.random.default_rng(0).integers(
        0, spec.vocab, size=(2, 16)))
    rep = collective_report(step, stacked, opt_state, batch, n_devices=2)
    # activations (and their grads) move stage-to-stage by ppermute;
    # psums only reduce scalar metrics/loss across stages
    assert rep["counts"].get("collective-permute", 0) >= 2, rep["counts"]
    assert rep["counts"].get("all-to-all", 0) == 0
    assert rep["counts"].get("all-gather", 0) == 0
    ar_payload = rep["payload_bytes"].get("all-reduce", 0.0)
    # psums carry only the replicated (non-stage) params' grads —
    # embed/head/final_ln, each stage holds a copy — plus scalar
    # loss/metric reductions; never stage activations or stage grads
    replicated_bytes = sum(
        leaf.nbytes for key in ("embed", "final_ln", "lm_head")
        for leaf in jax.tree.leaves(params.get(key)))
    assert ar_payload <= replicated_bytes + 4096, (
        ar_payload, replicated_bytes)
