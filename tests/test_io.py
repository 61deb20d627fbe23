"""Checkpoint roundtrip: quantize -> pack -> save -> load -> same logits
(reference --save / load_quant3 counterpart, opt.py:375-402,719-721)."""

import numpy as np
import jax
import jax.numpy as jnp

from gptq_tpu.config import QuantConfig
from gptq_tpu.io import load_checkpoint, save_checkpoint
from gptq_tpu.models.common import ArchSpec, init_params, model_forward
from gptq_tpu.pipeline import pack_model, quantize_model

SPEC = ArchSpec(arch="llama", n_layers=2, hidden=32, n_heads=4, n_kv_heads=4,
                ffn=64, vocab=61, max_pos=64, act="silu", pos="rope",
                norm_type="rmsnorm", linear_bias=False, tie_embeddings=False)


def test_packed_checkpoint_roundtrip(tmp_path):
    params = init_params(SPEC, jax.random.PRNGKey(0))
    calib = jnp.asarray(np.random.default_rng(0).integers(0, 61, size=(4, 16)))
    cfg = QuantConfig(wbits=4, nsamples=4)
    res = quantize_model(SPEC, params, calib, cfg, log=lambda s: None)
    pack_model(SPEC, params, res.quantizers, cfg)

    ids = jnp.asarray(np.random.default_rng(1).integers(0, 61, size=(1, 12)))
    want, _ = model_forward(SPEC, params, ids)

    path = str(tmp_path / "ckpt")
    save_checkpoint(path, SPEC, params, cfg)
    spec2, params2, cfg2 = load_checkpoint(path)
    assert spec2 == SPEC
    assert cfg2.wbits == 4
    got, _ = model_forward(spec2, params2, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_bf16_params_roundtrip(tmp_path):
    """npz cannot hold bfloat16 natively; the header's bf16_keys view must
    restore it (serving checkpoints are bf16)."""
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        init_params(SPEC, jax.random.PRNGKey(5)))
    ids = jnp.asarray(np.random.default_rng(5).integers(0, 61, size=(1, 8)))
    want, _ = model_forward(SPEC, params, ids)
    path = str(tmp_path / "bf16")
    save_checkpoint(path, SPEC, params, None)
    spec2, params2, _ = load_checkpoint(path)
    assert params2["layers"][0]["q"]["w"].dtype == jnp.bfloat16
    got, _ = model_forward(spec2, params2, ids)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=1e-5, atol=1e-5)


def test_stale_pack_format_rejected(tmp_path):
    """A packed checkpoint from the pre-byteplane layout must fail loudly,
    not decode scrambled weights."""
    import json

    import pytest

    params = init_params(SPEC, jax.random.PRNGKey(2))
    calib = jnp.asarray(np.random.default_rng(2).integers(0, 61, size=(2, 8)))
    cfg = QuantConfig(wbits=4, nsamples=2)
    res = quantize_model(SPEC, params, calib, cfg, log=lambda s: None)
    pack_model(SPEC, params, res.quantizers, cfg)
    path = str(tmp_path / "old.npz")
    save_checkpoint(path, SPEC, params, cfg)

    # rewrite the header as a v1 checkpoint
    z = dict(np.load(path, allow_pickle=False))
    header = json.loads(bytes(z["__header__"]).decode())
    header.pop("pack_format")
    z["__header__"] = np.frombuffer(json.dumps(header).encode(),
                                    dtype=np.uint8)
    np.savez(path[:-4], **z)
    with pytest.raises(ValueError, match="layout v1"):
        load_checkpoint(path)


def test_dense_checkpoint_roundtrip(tmp_path):
    params = init_params(SPEC, jax.random.PRNGKey(1))
    ids = jnp.asarray(np.random.default_rng(2).integers(0, 61, size=(1, 12)))
    want, _ = model_forward(SPEC, params, ids)
    path = str(tmp_path / "dense")
    save_checkpoint(path, SPEC, params)
    spec2, params2, _ = load_checkpoint(path)
    got, _ = model_forward(spec2, params2, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)


def test_conform_params_fills_none_leaves_silently():
    """The legitimate conform case: npz checkpoints drop None leaves (no
    linear biases), so the loaded tree lacks keys whose template value is
    None — that must pass without complaint."""
    from gptq_tpu.io import conform_params

    template = {"layers": [{"w": np.ones((2, 2)), "b": None}],
                "final_ln": None}
    loaded = {"layers": [{"w": np.zeros((2, 2))}]}
    out = conform_params(template, loaded)
    np.testing.assert_array_equal(out["layers"][0]["w"], np.zeros((2, 2)))
    assert out["layers"][0]["b"] is None
    assert out["final_ln"] is None


def test_conform_params_missing_weights_raise():
    """A checkpoint missing REAL array leaves (wrong config for this
    output_dir, truncated file) must fail loudly instead of silently
    resuming from a chimera of trained and random weights."""
    import pytest

    from gptq_tpu.io import conform_params

    template = {"layers": [{"w": np.ones(2)}, {"w": np.ones(2)}]}
    loaded = {"layers": [{"w": np.zeros(2)}]}  # one layer short
    with pytest.raises(ValueError, match="missing 1 weight"):
        conform_params(template, loaded)
    # strict=False downgrades to a warning and substitutes live values
    out = conform_params(template, loaded, strict=False)
    np.testing.assert_array_equal(out["layers"][1]["w"], np.ones(2))


def test_conform_params_extra_weights_raise():
    """The reverse mismatch — the checkpoint carries weights the live
    model lacks (e.g. more layers) — is equally a wrong-config resume."""
    import pytest

    from gptq_tpu.io import conform_params

    template = {"layers": [{"w": np.ones(2)}]}
    loaded = {"layers": [{"w": np.zeros(2)}, {"w": np.zeros(2)}],
              "extra_head": np.zeros(3)}
    with pytest.raises(ValueError, match="lacks"):
        conform_params(template, loaded)
