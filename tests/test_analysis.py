"""Sensitivity analysis tests (reference: opt_analysis.py, draw_*.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from gptq_tpu.analysis import (
    analyse_model,
    derive_quant_config,
    plot_sensitivity,
    plot_sensitivity_diff,
    save_sensitivity_log,
)
from gptq_tpu.models.common import ArchSpec, init_params

SPEC = ArchSpec(arch="opt", n_layers=2, hidden=32, n_heads=4, ffn=64,
                vocab=61, max_pos=64, act="relu", pos="learned",
                norm_type="layernorm", linear_bias=True, tie_embeddings=False)


def test_analyse_model_and_config(tmp_path):
    params = init_params(SPEC, jax.random.PRNGKey(0))
    calib = jnp.asarray(np.random.default_rng(0).integers(0, 61, size=(2, 16)))
    st = analyse_model(SPEC, params, calib, log=lambda s: None)
    assert len(st) == 12  # 2 layers x 6 linears
    key = "model.decoder.layers.0.fc1"
    assert st[key]["rowwise"]["w"]["max"].shape == (64,)
    cfg = derive_quant_config(st, bits=3, out_path=str(tmp_path / "qc.json"))
    assert all(set(v) == {"bits", "columnwise"} for v in cfg.values())
    assert (tmp_path / "qc.json").exists()


def test_logs_and_plots(tmp_path):
    losses = {f"model.decoder.layers.0.{n}": float(i)
              for i, n in enumerate(["self_attn.q_proj", "fc1", "fc2"])}
    save_sensitivity_log(losses, str(tmp_path / "sens.txt"))
    text = (tmp_path / "sens.txt").read_text()
    assert "fc1: 1.0" in text
    ok = plot_sensitivity(losses, str(tmp_path / "s.png"))
    ok2 = plot_sensitivity_diff(losses, {k: v + 1 for k, v in losses.items()},
                                str(tmp_path / "d.png"))
    if ok:
        assert (tmp_path / "s.png").exists()
    if ok2:
        assert (tmp_path / "d.png").exists()


def test_distribution_plots(tmp_path):
    from gptq_tpu.analysis import plot_distribution2d, plot_distribution3d

    W = np.random.default_rng(0).normal(size=(130, 200))
    ok2d = plot_distribution2d(W, str(tmp_path / "w2.png"))
    ok3d = plot_distribution3d(W, str(tmp_path / "w3.png"), max_cells=32)
    if ok2d:
        assert (tmp_path / "w2.png").exists()
    if ok3d:
        assert (tmp_path / "w3.png").exists()
