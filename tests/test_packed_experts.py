"""Sub-byte packed expert serving (VERDICT r2 #3): PackedExperts banks,
the batched-expert fused dequant kernel, moe_ffn integration, expert
parallelism, checkpoint round-trip, and the CLI --expert_bits surface."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gptq_tpu.models.common import ArchSpec, KVCache, init_params, model_forward
from gptq_tpu.models.moe import (_rtn_expert_grids, pack_experts,
                                 quantize_experts)
from gptq_tpu.ops.pack import PackedExperts, pack_expert_stack
from gptq_tpu.ops.qmatmul import dequant_experts, expert_dequant_matmul

MOE_SPEC = ArchSpec(arch="llama", n_layers=2, hidden=48, n_heads=4,
                    n_kv_heads=2, ffn=96, vocab=89, max_pos=64,
                    act="silu", pos="rope", norm_type="rmsnorm",
                    linear_bias=False, tie_embeddings=False,
                    n_experts=4, expert_top_k=2, expert_capacity=2.0)


def _bank(E=4, F=96, D=64, bits=4, groupsize=-1, seed=0):
    rng = np.random.default_rng(seed)
    W = jnp.asarray(rng.normal(size=(E, F, D)).astype(np.float32) * 0.2)
    s, z = _rtn_expert_grids(W, bits, groupsize)
    pe = pack_expert_stack(W, s, z, bits, groupsize)
    # the RTN-grid dequant of W (what the bank actually stores)
    g = D // s.shape[1]
    sr = jnp.repeat(s.transpose(0, 2, 1), g, axis=-1)  # (E, F, D)
    zr = jnp.repeat(z.transpose(0, 2, 1), g, axis=-1)
    maxq = (1 << bits) - 1
    q = jnp.clip(jnp.round(W / sr + zr), 0, maxq)
    Wq = sr * (q - zr)
    return pe, Wq


@pytest.mark.parametrize("bits,groupsize", [(4, -1), (3, -1), (2, 32), (8, -1)])
def test_pack_expert_stack_roundtrip(bits, groupsize):
    pe, Wq = _bank(bits=bits, groupsize=groupsize)
    got = dequant_experts(pe)  # (E, K, N) = (E, D, F)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(Wq).transpose(0, 2, 1),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("per_x", [False, True])
def test_expert_matmul_xla_matches_dense(per_x):
    pe, Wq = _bank()
    rng = np.random.default_rng(1)
    shape = (4, 3, 64) if per_x else (3, 64)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    got = expert_dequant_matmul(x, pe, impl="xla")
    eq = "emk,efk->emf" if per_x else "mk,efk->emf"
    want = jnp.einsum(eq, x, Wq)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("per_x,groupsize", [(False, -1), (True, -1),
                                             (False, 32)])
def test_expert_matmul_kernel_interpret_matches_dense(per_x, groupsize):
    """The batched-expert Pallas grid (expert = leading grid dim) in
    interpret mode — the chip compile is checked by the r3 experiment."""
    pe, Wq = _bank(groupsize=groupsize)
    rng = np.random.default_rng(2)
    shape = (4, 3, 64) if per_x else (3, 64)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    got = expert_dequant_matmul(x, pe, impl="pallas", interpret=True)
    eq = "emk,efk->emf" if per_x else "mk,efk->emf"
    want = jnp.einsum(eq, x, Wq)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_packed_expert_view():
    pe, Wq = _bank()
    from gptq_tpu.ops.qmatmul import dequant

    w2 = dequant(pe.expert(2))
    np.testing.assert_allclose(np.asarray(w2),
                               np.asarray(Wq[2]).T, rtol=1e-5, atol=1e-5)


def _close(a, b, tol):
    rel = np.abs(np.asarray(a) - np.asarray(b)).max() / \
        (np.abs(np.asarray(b)).max() + 1e-9)
    assert rel < tol, rel


@pytest.mark.parametrize("T", [1, 48])
def test_moe_forward_packed_matches_dequant_oracle(T):
    """moe_ffn serves PackedExperts through both paths (batched kernel at
    decode N <= 32, per-expert loop at prefill N): the output must EQUAL
    a dense forward whose experts are the bank's dequantized values —
    the packed path adds no error beyond the stored grid."""
    import copy

    params = init_params(MOE_SPEC, jax.random.PRNGKey(0))
    ids = jnp.asarray(np.random.default_rng(1).integers(
        0, MOE_SPEC.vocab, size=(1, T)))
    pp = copy.deepcopy(params)
    pack_experts(pp, bits=4)
    assert isinstance(pp["layers"][0]["experts"]["gate"], PackedExperts)
    got, _ = model_forward(MOE_SPEC, pp, ids)

    pd = copy.deepcopy(params)
    for bp, bq in zip(pd["layers"], pp["layers"]):
        ex = bp.get("experts")
        if ex is None:
            continue
        for name in ("gate", "up", "down"):
            ex[name] = dequant_experts(
                bq["experts"][name]).transpose(0, 2, 1)
    want, _ = model_forward(MOE_SPEC, pd, ids)
    _close(got, want, 1e-5)

    # decode continues from a cache through the batched-kernel path
    if T == 1:
        cache = KVCache.init(MOE_SPEC, 1, 8, jnp.float32)
        got_c, _ = model_forward(MOE_SPEC, pp, ids, cache)
        _close(got_c[:, -1], got[:, -1], 1e-4)


def test_moe_packed_matches_fake_quant_exactly_with_gptq_grids():
    """pack_experts reuses the solver grids stashed by
    gptq_quantize_experts(keep_grids=True): the packed bank must decode to
    EXACTLY the fake-quantized dense values (same codes), so packed
    serving equals the calibrated model, not an RTN re-rounding of it."""
    from gptq_tpu.config import QuantConfig
    from gptq_tpu.models.moe import gptq_quantize_experts

    params = init_params(MOE_SPEC, jax.random.PRNGKey(2))
    calib = jnp.asarray(np.random.default_rng(3).integers(
        0, MOE_SPEC.vocab, size=(2, 16)))
    cfg = QuantConfig(wbits=4, nsamples=2)
    gptq_quantize_experts(MOE_SPEC, params, calib, cfg, keep_grids=True)
    ex = params["layers"][0]["experts"]
    assert "_grids" in ex
    dense_vals = np.asarray(ex["gate"])  # fake-quantized
    import copy

    pp = copy.deepcopy(params)
    pack_experts(pp, bits=4)
    pe = pp["layers"][0]["experts"]["gate"]
    got = np.asarray(dequant_experts(pe)).transpose(0, 2, 1)
    np.testing.assert_allclose(got, dense_vals, rtol=2e-5, atol=2e-5)


def test_pack_experts_rejects_int8_compressed():
    params = init_params(MOE_SPEC, jax.random.PRNGKey(4))
    quantize_experts(params)
    with pytest.raises(ValueError, match="int8"):
        pack_experts(params, bits=4)


def test_ep_forward_packed_matches_flat():
    """Expert parallelism over a packed bank: shard_map slices the
    leading expert dim of every PackedExperts leaf; one psum merges."""
    from gptq_tpu.parallel.ep import make_ep_forward, make_ep_mesh

    params = init_params(MOE_SPEC, jax.random.PRNGKey(5))
    pack_experts(params, bits=4)
    ids = jnp.asarray(np.random.default_rng(6).integers(
        0, MOE_SPEC.vocab, size=(2, 16)))
    want, _ = model_forward(MOE_SPEC, params, ids)
    mesh = make_ep_mesh(2)
    fwd = make_ep_forward(MOE_SPEC, params, mesh)
    got = fwd(params, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_packed_experts_checkpoint_roundtrip(tmp_path):
    from gptq_tpu.io import load_checkpoint, save_checkpoint

    params = init_params(MOE_SPEC, jax.random.PRNGKey(7))
    pack_experts(params, bits=3)
    ids = jnp.asarray(np.random.default_rng(8).integers(
        0, MOE_SPEC.vocab, size=(1, 12)))
    want, _ = model_forward(MOE_SPEC, params, ids)
    save_checkpoint(str(tmp_path / "m.npz"), MOE_SPEC, params)
    spec2, params2, _ = load_checkpoint(str(tmp_path / "m.npz"))
    pe = params2["layers"][0]["experts"]["gate"]
    assert isinstance(pe, PackedExperts) and pe.bits == 3
    got, _ = model_forward(spec2, params2, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("groupsize", [-1, 32])
def test_expert_select_kernel_matches_dense(groupsize):
    """Scalar-prefetch expert selection: the kernel indexes the bank's
    leading dim inside the grid (no slice copy) — must equal the chosen
    expert's dense matmul."""
    from gptq_tpu.ops.qmatmul import expert_dequant_matmul_select

    pe, Wq = _bank(groupsize=groupsize)
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=(3, 64)).astype(np.float32))
    for e in (0, 2, 3):
        got = expert_dequant_matmul_select(x, pe, jnp.asarray(e),
                                           interpret=True)
        want = jnp.einsum("mk,fk->mf", x, Wq[e])
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)


def test_ep_tp_decode_packed_experts_matches_flat():
    """The 2-D (ep, tp) serving composition over a packed bank:
    attention over tp, PackedExperts leaves sliced on their leading
    expert dim over ep."""
    from jax.sharding import Mesh
    from gptq_tpu.parallel.ep import make_ep_tp_decode_step

    params = init_params(MOE_SPEC, jax.random.PRNGKey(10))
    pack_experts(params, bits=4)
    prompt = jnp.asarray(np.random.default_rng(11).integers(
        0, MOE_SPEC.vocab, size=(1, 6)))
    tok = jnp.asarray([[3]])

    c_ref = KVCache.init(MOE_SPEC, 1, 16, jnp.float32)
    want1, c_ref = model_forward(MOE_SPEC, params, prompt, c_ref)
    want2, _ = model_forward(MOE_SPEC, params, tok, c_ref)

    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2), ("ep", "tp"))
    local, step = make_ep_tp_decode_step(MOE_SPEC, params, mesh)
    cache = KVCache.init(MOE_SPEC, 1, 16, jnp.float32)
    got1, cache = step(local, cache, prompt)
    got2, _ = step(local, cache, tok)
    np.testing.assert_allclose(np.asarray(got1), np.asarray(want1[:, -1]),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2[:, -1]),
                               rtol=2e-4, atol=2e-4)
