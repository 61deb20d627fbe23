"""Autotune table plumbing (measurement itself is chip-only)."""

import jax.numpy as jnp
import numpy as np

from gptq_tpu.ops import autotune
from gptq_tpu.ops.pack import PackedWeight, pack_codes
from gptq_tpu.ops.qmatmul import dequant_matmul


def _pw(K=512, N=512, bits=4):
    codes = jnp.zeros((K, N), jnp.int32)
    words = pack_codes(codes, bits)
    scale = jnp.ones((1, N), jnp.float32)
    return PackedWeight(words=words, scale=scale, zoff=scale * 0, bits=bits,
                        K=K, N=N, groupsize=-1, fmt="uniform")


def test_best_tiles_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setattr(autotune, "_PATH", str(tmp_path / "at.json"))
    monkeypatch.setattr(autotune, "_TABLE", {})
    monkeypatch.setattr(autotune, "_LOADED", False)
    key = autotune._key(512, 512, 4, -1, "uniform", 8)
    autotune._TABLE[key] = (1024, 512)
    autotune._save()

    monkeypatch.setattr(autotune, "_TABLE", {})
    monkeypatch.setattr(autotune, "_LOADED", False)
    assert autotune.best_tiles(512, 512, 4, -1, "uniform", 8) == (1024, 512)
    assert autotune.best_tiles(999, 999, 4, -1, "uniform", 8) is None


def test_tuned_tiles_still_correct(monkeypatch):
    """A (possibly stale) tuned tile must never change results — the
    matmul path clamps it to valid divisors."""
    pw = _pw()
    key = autotune._key(512, 512, 4, -1, "uniform", 8)
    monkeypatch.setattr(autotune, "_LOADED", True)
    monkeypatch.setattr(autotune, "_TABLE", {key: (4096, 4096)})
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 512)),
                    jnp.float32)
    y = dequant_matmul(x, pw, impl="pallas", interpret=True)
    assert y.shape == (2, 512)
    np.testing.assert_allclose(np.asarray(y), 0.0, atol=1e-6)


def test_table_schema_with_bandwidth(tmp_path, monkeypatch):
    """New entries carry [tk, tn, gbps]; legacy 2-entry rows still load;
    tk=-1 encodes the streamed impl."""
    monkeypatch.setattr(autotune, "_PATH", str(tmp_path / "at.json"))
    monkeypatch.setattr(autotune, "_TABLE", {})
    monkeypatch.setattr(autotune, "_LOADED", False)
    k3 = autotune._key(256, 256, 4, -1, "uniform", 8)
    autotune._TABLE[k3] = (1024, 512, 733.5)
    k2 = autotune._key(128, 128, 4, -1, "uniform", 8)
    autotune._TABLE[k2] = (512, 256)
    ks = autotune._key(64, 64, 4, -1, "uniform", 8)
    autotune._TABLE[ks] = (-1, -1, 810.0)
    autotune._save()
    monkeypatch.setattr(autotune, "_TABLE", {})
    monkeypatch.setattr(autotune, "_LOADED", False)
    assert autotune.best_tiles(256, 256, 4, -1, "uniform", 8) == (1024, 512)
    assert autotune.best_tiles(128, 128, 4, -1, "uniform", 8) == (512, 256)
    assert autotune.best_tiles(64, 64, 4, -1, "uniform", 8) == (-1, -1)


def test_deadline_caps_candidate_sweep(tmp_path, monkeypatch):
    """An already-expired deadline must stop the sweep after the first
    measured candidate (one shape's full sweep is ~9 candidates x 2
    compiles — minutes on a cold relayed chip — and previously could eat
    the whole tune_model budget inside one shape)."""
    import time

    monkeypatch.setattr(autotune, "_PATH", str(tmp_path / "at.json"))
    monkeypatch.setattr(autotune, "_TABLE", {})
    monkeypatch.setattr(autotune, "_LOADED", True)
    calls = []

    def fake_time(fn, x, iters=64, reps=3):
        calls.append(1)
        return 1e-4

    monkeypatch.setattr(autotune, "_time_eager", fake_time)
    pw = _pw(K=4096, N=2048)  # shape where the static default divides
    best = autotune.tune_packed(pw, M=8, deadline=time.perf_counter() - 1)
    assert len(calls) == 1  # default measured, sweep then stopped
    assert best == (2048, 1024)  # the static decode default
    # and without a deadline the sweep measures multiple candidates
    autotune._TABLE.clear()
    calls.clear()
    autotune.tune_packed(pw, M=8)
    assert len(calls) > 3


def test_expand_candidates():
    from gptq_tpu.ops.kernel_bench import make_random_packed
    import jax

    pw = make_random_packed(jax.random.PRNGKey(0), 1024, 2048, 4, -1)
    assert autotune._expand(512, autotune.FULL_N, pw) == (512, 2048)
    assert autotune._expand(autotune.STREAMED, autotune.STREAMED, pw) == (
        autotune.STREAMED, autotune.STREAMED)
    assert autotune._expand(768, 512, pw) is None  # doesn't divide
    # VMEM budget: 4-bit words block 2*(tk/8)*tn*4 bytes
    assert autotune._expand(1024, autotune.FULL_N, pw) is not None


def test_truncated_sweep_not_persisted(tmp_path, monkeypatch):
    """A deadline-truncated sweep serves its partial winner to THIS
    process but must not reach the on-disk table — otherwise a cold
    first run locks the shape to a 1-candidate 'winner' forever."""
    import json
    import time

    path = tmp_path / "at.json"
    monkeypatch.setattr(autotune, "_PATH", str(path))
    monkeypatch.setattr(autotune, "_TABLE", {})
    monkeypatch.setattr(autotune, "_EPHEMERAL", set())
    monkeypatch.setattr(autotune, "_LOADED", True)
    monkeypatch.setattr(autotune, "_time_eager",
                        lambda fn, x, iters=64, reps=3: 1e-4)

    pw = _pw(K=4096, N=2048)
    autotune.tune_packed(pw, M=8, deadline=time.perf_counter() - 1)
    key = autotune._key(pw.K, pw.N, pw.bits, pw.groupsize, pw.fmt, 8)
    assert key in autotune._TABLE  # in-process cache serves the winner
    # a later full sweep on ANOTHER shape persists the table: the
    # truncated entry must be filtered out of what lands on disk
    pw2 = _pw(K=2048, N=1024)
    autotune.tune_packed(pw2, M=8)
    saved = json.loads(path.read_text())
    assert key not in saved
    key2 = autotune._key(pw2.K, pw2.N, pw2.bits, pw2.groupsize, pw2.fmt, 8)
    assert key2 in saved
    # a fresh full sweep of the truncated shape upgrades it to persistent
    del autotune._TABLE[key]
    autotune.tune_packed(pw, M=8)
    assert key in json.loads(path.read_text())
