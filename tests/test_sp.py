"""Sequence-parallel (ring attention over an "sp" mesh axis) prefill tests
on the virtual CPU mesh: the ring schedule is the same math as the flat
forward, so logits and the returned KV cache must match to float
tolerance, and decode must continue seamlessly from the sp-built cache."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gptq_tpu.models.common import (ArchSpec, KVCache, init_params,
                                    model_forward)
from gptq_tpu.parallel.sp import make_sp_mesh, make_sp_prefill

SPEC = ArchSpec(arch="llama", n_layers=3, hidden=48, n_heads=4, n_kv_heads=2,
                ffn=96, vocab=89, max_pos=64, norm_eps=1e-5, act="silu",
                pos="rope", norm_type="rmsnorm", linear_bias=False,
                tie_embeddings=False)

OPT_SPEC = ArchSpec(arch="opt", n_layers=2, hidden=48, n_heads=4,
                    n_kv_heads=4, ffn=96, vocab=89, max_pos=64,
                    norm_eps=1e-5, act="relu", pos="learned",
                    norm_type="layernorm", linear_bias=True,
                    tie_embeddings=True)

BLOOM_SPEC = ArchSpec(arch="bloom", n_layers=2, hidden=48, n_heads=4,
                      n_kv_heads=4, ffn=96, vocab=89, max_pos=64,
                      norm_eps=1e-5, act="gelu_tanh", pos="alibi",
                      norm_type="layernorm", linear_bias=True,
                      tie_embeddings=True)


def _ids(spec, B=2, T=16, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).integers(0, spec.vocab, size=(B, T)))


@pytest.mark.parametrize("spec,sp", [
    (SPEC, 2), (SPEC, 4), (OPT_SPEC, 2), (BLOOM_SPEC, 2),
])
def test_sp_prefill_matches_flat(spec, sp):
    """Ring-attention prefill == flat forward: logits AND the gathered KV
    cache (llama rope+GQA, OPT learned positions, BLOOM alibi)."""
    params = init_params(spec, jax.random.PRNGKey(1))
    ids = _ids(spec)
    want, ref_cache = model_forward(
        spec, params, ids, KVCache.init(spec, ids.shape[0], ids.shape[1],
                                        jnp.float32))

    mesh = make_sp_mesh(sp)
    prefill, _ = make_sp_prefill(spec, params, mesh, cache_dtype=jnp.float32)
    got, cache = prefill(ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    assert int(cache.length) == ids.shape[1]
    np.testing.assert_allclose(np.asarray(cache.k), np.asarray(ref_cache.k),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(cache.v), np.asarray(ref_cache.v),
                               rtol=2e-4, atol=2e-4)


def test_sp_prefill_then_decode_matches_flat():
    """Serving flow: sp prefill builds the cache (padded to max_len), then
    standard single-device decode appends tokens — logits must match a
    flat prefill+decode of the same stream."""
    params = init_params(SPEC, jax.random.PRNGKey(3))
    ids = _ids(SPEC, B=1, T=8, seed=5)
    tok = jnp.asarray([[7]])

    c_ref = KVCache.init(SPEC, 1, 16, jnp.float32)
    _, c_ref = model_forward(SPEC, params, ids, c_ref)
    want, _ = model_forward(SPEC, params, tok, c_ref)

    mesh = make_sp_mesh(2)
    prefill, _ = make_sp_prefill(SPEC, params, mesh,
                                 cache_dtype=jnp.float32, max_len=16)
    _, cache = prefill(ids)
    got, _ = model_forward(SPEC, params, tok, cache)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_sp_prefill_rejects_bad_lengths():
    params = init_params(SPEC, jax.random.PRNGKey(0))
    mesh = make_sp_mesh(2)
    prefill, _ = make_sp_prefill(SPEC, params, mesh)
    with pytest.raises(ValueError, match="divide"):
        prefill(_ids(SPEC, T=9))
    with pytest.raises(ValueError, match="max_pos"):
        prefill(_ids(SPEC, T=128))
