"""Continuous batching: concurrent requests must produce exactly the tokens
that sequential single-request greedy decoding produces."""

import numpy as np
import jax
import jax.numpy as jnp

from gptq_tpu.engine.batching import ContinuousBatcher
from gptq_tpu.engine.decode import DecodeEngine
from gptq_tpu.models.common import ArchSpec, init_params

SPEC = ArchSpec(arch="llama", n_layers=2, hidden=32, n_heads=4, n_kv_heads=2,
                ffn=64, vocab=61, max_pos=128, act="silu", pos="rope",
                norm_type="rmsnorm", linear_bias=False, tie_embeddings=False)


def test_continuous_batching_matches_sequential():
    params = init_params(SPEC, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    prompts = [rng.integers(1, 61, size=(n,)) for n in (4, 7, 5, 9, 3)]

    engine = DecodeEngine(SPEC, params, max_len=64, cache_dtype=jnp.float32)
    want = [engine.generate(p[None], max_new_tokens=6)[0].tolist()
            for p in prompts]

    cb = ContinuousBatcher(SPEC, params, batch_slots=2, max_len=64,
                           cache_dtype=jnp.float32, prefill_buckets=(4, 8, 16))
    uids = [cb.submit(p, max_new_tokens=6) for p in prompts]
    results = cb.run()
    assert [r.uid for r in results] == uids
    got = [r.output for r in results]
    assert got == want


def test_dp_sharded_batcher_matches_unsharded():
    """Slot dim sharded over a dp mesh must produce identical tokens."""
    from gptq_tpu.parallel.mesh import make_mesh

    params = init_params(SPEC, jax.random.PRNGKey(1))
    rng = np.random.default_rng(1)
    prompts = [rng.integers(1, 61, size=(n,)) for n in (5, 6, 4, 8)]

    cb0 = ContinuousBatcher(SPEC, params, batch_slots=4, max_len=64,
                            cache_dtype=jnp.float32,
                            prefill_buckets=(8, 16))
    for p in prompts:
        cb0.submit(p, max_new_tokens=5)
    want = [r.output for r in cb0.run()]

    mesh = make_mesh(tp=1, dp=4)
    cb = ContinuousBatcher(SPEC, params, batch_slots=4, max_len=64,
                           cache_dtype=jnp.float32, prefill_buckets=(8, 16),
                           mesh=mesh)
    for p in prompts:
        cb.submit(p, max_new_tokens=5)
    got = [r.output for r in cb.run()]
    assert got == want


def test_int8_cache_batcher_close_to_f32():
    """Continuous batching with the int8 KV cache: same argmax tokens on
    the test model (per-token-head scales keep quantization error small)."""
    params = init_params(SPEC, jax.random.PRNGKey(2))
    rng = np.random.default_rng(2)
    prompts = [rng.integers(1, 61, size=(n,)) for n in (5, 7)]

    def run(dtype):
        cb = ContinuousBatcher(SPEC, params, batch_slots=2, max_len=64,
                               cache_dtype=dtype, prefill_buckets=(8, 16))
        for p in prompts:
            cb.submit(p, max_new_tokens=5)
        return [r.output for r in cb.run()]

    ref = run(jnp.float32)
    got = run(jnp.int8)
    assert got == ref


def test_more_requests_than_slots_all_complete():
    params = init_params(SPEC, jax.random.PRNGKey(1))
    rng = np.random.default_rng(1)
    cb = ContinuousBatcher(SPEC, params, batch_slots=3, max_len=64,
                           cache_dtype=jnp.float32, prefill_buckets=(8,))
    n = 7
    for _ in range(n):
        cb.submit(rng.integers(1, 61, size=(5,)), max_new_tokens=4)
    results = cb.run()
    assert len(results) == n
    assert all(len(r.output) == 4 for r in results)


def test_batched_refill_one_dispatch_per_bucket():
    """A churning pool must refill with ONE prefill dispatch per bucket per
    wave, not one per freed slot (30 ms RTT each on the relayed chip)."""
    params = init_params(SPEC, jax.random.PRNGKey(3))
    rng = np.random.default_rng(3)
    # 8 same-bucket prompts into 4 slots: wave 1 = 1 call (4 slots stacked),
    # wave 2 = 1 call; plus every request still completes correctly
    prompts = [rng.integers(1, 61, size=(5,)) for _ in range(8)]
    cb = ContinuousBatcher(SPEC, params, batch_slots=4, max_len=64,
                           cache_dtype=jnp.float32, prefill_buckets=(8,))
    for p in prompts:
        cb.submit(p, max_new_tokens=4)
    results = cb.run()
    assert len(results) == 8
    assert cb.prefill_calls == 2, cb.prefill_calls

    # mixed buckets in one wave: one dispatch per bucket
    cb2 = ContinuousBatcher(SPEC, params, batch_slots=4, max_len=64,
                            cache_dtype=jnp.float32, prefill_buckets=(4, 16))
    for n in (3, 4, 9, 12):
        cb2.submit(rng.integers(1, 61, size=(n,)), max_new_tokens=3)
    res2 = cb2.run()
    assert len(res2) == 4
    assert cb2.prefill_calls == 2, cb2.prefill_calls


def test_windowed_run_matches_stepwise():
    """run(window=n) — n lock-steps per host round-trip via one on-device
    scan — must produce exactly the window=1 outputs, for both cache
    dtypes, including mid-window finishes and slot refills."""
    import pytest

    params = init_params(SPEC, jax.random.PRNGKey(5))
    rng = np.random.default_rng(5)
    prompts = [rng.integers(1, 61, size=(n,)) for n in (4, 6, 5, 7, 3)]

    for dtype in (jnp.float32, jnp.int8):
        def run(window):
            cb = ContinuousBatcher(SPEC, params, batch_slots=2, max_len=64,
                                   cache_dtype=dtype, prefill_buckets=(8,))
            for p in prompts:
                cb.submit(p, max_new_tokens=6)
            return [r.output for r in cb.run(window=window)]

        if run(4) != run(1):
            pytest.fail(f"windowed outputs diverge for {dtype}")


def test_submit_rejects_overlong_request():
    """prompt + max_new_tokens beyond the cache max_len must fail loudly at
    submit time, not scribble past the KV buffer during prefill."""
    import pytest

    params = init_params(SPEC, jax.random.PRNGKey(4))
    cb = ContinuousBatcher(SPEC, params, batch_slots=2, max_len=16,
                           cache_dtype=jnp.float32, prefill_buckets=(8,))
    with pytest.raises(ValueError, match="max_len"):
        cb.submit(np.arange(1, 15), max_new_tokens=8)
    cb.submit(np.arange(1, 9), max_new_tokens=4)  # fits: 8 + 4 <= 16


def test_prefill_group_cap_splits_dispatches():
    """prefill_group caps rows per batched-prefill dispatch (the relay's
    compile helper crashes on the 32-row 7B prefill program; 16-row
    programs compile reliably — r5 bisect). Oversized refill groups
    split into chunks; outputs must be identical to the uncapped run."""
    params = init_params(SPEC, jax.random.PRNGKey(9))
    rng = np.random.default_rng(9)
    prompts = [rng.integers(1, 61, size=(5,)) for _ in range(4)]

    def serve(cap):
        cb = ContinuousBatcher(SPEC, params, batch_slots=4, max_len=64,
                               cache_dtype=jnp.float32,
                               prefill_buckets=(8,), prefill_group=cap)
        for p in prompts:
            cb.submit(p, max_new_tokens=4)
        out = [r.output for r in cb.run()]
        return out, cb.prefill_calls

    full, calls_full = serve(None)   # one 4-row dispatch
    split, calls_split = serve(2)    # two 2-row dispatches
    assert calls_full == 1, calls_full
    assert calls_split == 2, calls_split
    assert split == full
