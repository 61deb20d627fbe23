"""Offline end-to-end test of the finetune driver loop (finetune_cli.main):
dataset/tokenizer/model loading are stubbed (HF hub unreachable in CI), so
what's exercised is the real training loop — schedule, train steps, eval,
checkpoint save, resume with optimizer state, and the --pp pipeline path."""

import json
import os

import numpy as np
import pytest
import jax

import gptq_tpu.finetune_cli as ft_cli
from gptq_tpu.models.common import ArchSpec, init_params


SPEC = ArchSpec(arch="llama", n_layers=2, hidden=32, n_heads=4, n_kv_heads=4,
                ffn=64, vocab=61, max_pos=64, norm_eps=1e-5, act="silu",
                pos="rope", norm_type="rmsnorm", linear_bias=False,
                tie_embeddings=False)


class _StubTokenizer:
    def __call__(self, text):
        class R:
            input_ids = list(np.random.default_rng(0).integers(
                1, 61, size=4000))

        return R()


def _install_stubs(monkeypatch):
    import types

    monkeypatch.setattr(
        "gptq_tpu.models.convert.params_from_dir",
        lambda path, *a, **k: (SPEC, init_params(SPEC, jax.random.PRNGKey(0))))
    import transformers

    monkeypatch.setattr(transformers.AutoTokenizer, "from_pretrained",
                        classmethod(lambda cls, *a, **k: _StubTokenizer()))

    def fake_load_dataset(*a, **k):
        rows = {"text": ["hello world"] * 4}
        ds = types.SimpleNamespace(column_names=["text"])
        return {"train": type("D", (), {"column_names": ["text"],
                                        "__getitem__": lambda s, c: rows[c]})(),
                "validation": type("D", (), {
                    "column_names": ["text"],
                    "__getitem__": lambda s, c: rows[c]})()}

    import datasets

    monkeypatch.setattr(datasets, "load_dataset", fake_load_dataset)


@pytest.mark.parametrize("extra", [[], ["--pp", "2", "--pp_microbatches", "2"]])
def test_finetune_cli_end_to_end(tmp_path, monkeypatch, extra):
    _install_stubs(monkeypatch)
    out = str(tmp_path / "run")
    argv = ["--model_name_or_path", "stub", "--block_size", "16",
            "--batch_size", "2", "--max_steps", "3", "--save_steps", "2",
            "--eval_steps", "2", "--learning_rate", "1e-3",
            "--lr_scheduler_type", "linear", "--warmup_steps", "1",
            "--output_dir", out] + extra
    assert ft_cli.main(argv) == 0
    cks = sorted(os.listdir(out))
    assert cks == ["checkpoint-2", "checkpoint-3"]
    for ck in cks:
        assert os.path.exists(os.path.join(out, ck, "model.npz")) or \
            os.path.exists(os.path.join(out, ck, "model"))
        assert os.path.exists(os.path.join(out, ck, "opt_state.npz"))
        with open(os.path.join(out, ck, "state.json")) as f:
            assert json.load(f)["step"] in (2, 3)


def test_finetune_cli_resume(tmp_path, monkeypatch, capsys):
    """A second invocation resumes from the saved step (and restores the
    optimizer state) instead of restarting."""
    _install_stubs(monkeypatch)
    out = str(tmp_path / "run")
    argv = ["--model_name_or_path", "stub", "--block_size", "16",
            "--batch_size", "2", "--max_steps", "2", "--save_steps", "2",
            "--eval_steps", "100", "--output_dir", out]
    assert ft_cli.main(argv) == 0
    argv2 = [a for a in argv]
    argv2[argv2.index("--max_steps") + 1] = "4"
    assert ft_cli.main(argv2) == 0
    text = capsys.readouterr().out
    assert "resumed from" in text and "at step 2" in text
    assert "checkpoint-4" in os.listdir(out)


MOE_SPEC = ArchSpec(arch="llama", n_layers=2, hidden=32, n_heads=4,
                    n_kv_heads=4, ffn=64, vocab=61, max_pos=64,
                    norm_eps=1e-5, act="silu", pos="rope",
                    norm_type="rmsnorm", linear_bias=False,
                    tie_embeddings=False, n_experts=4, expert_top_k=2)


def test_finetune_cli_moe_model(tmp_path, monkeypatch):
    """Recovery-finetuning a routed-MoE (Mixtral-style) model through the
    driver: the train step applies the load-balancing aux loss, eval
    stays pure cross-entropy, checkpoints round-trip the expert stacks."""
    import types

    monkeypatch.setattr(
        "gptq_tpu.models.convert.params_from_dir",
        lambda path, *a, **k: (MOE_SPEC,
                               init_params(MOE_SPEC, jax.random.PRNGKey(1))))
    import transformers

    monkeypatch.setattr(transformers.AutoTokenizer, "from_pretrained",
                        classmethod(lambda cls, *a, **k: _StubTokenizer()))

    def fake_load_dataset(*a, **k):
        rows = {"text": ["hello world"] * 4}
        mk = lambda: type("D", (), {"column_names": ["text"],  # noqa: E731
                                    "__getitem__": lambda s, c: rows[c]})()
        return {"train": mk(), "validation": mk()}

    import datasets

    monkeypatch.setattr(datasets, "load_dataset", fake_load_dataset)

    out = str(tmp_path / "run")
    argv = ["--model_name_or_path", "stub", "--block_size", "16",
            "--batch_size", "2", "--max_steps", "3", "--save_steps", "3",
            "--eval_steps", "3", "--learning_rate", "1e-3",
            "--output_dir", out]
    assert ft_cli.main(argv) == 0
    import glob

    from gptq_tpu.io import load_checkpoint

    ckpt = sorted(glob.glob(os.path.join(out, "checkpoint-*", "model.npz")))
    assert ckpt
    spec2, params2, _ = load_checkpoint(ckpt[-1])
    assert spec2.n_experts == 4
    assert params2["layers"][0]["experts"]["gate"].shape == (4, 64, 32)


def test_finetune_cli_reference_recipe(tmp_path, monkeypatch, capsys):
    """The reference recipe, offline-tiny (reference finetune/train.sh:
    wikitext-2, adafactor, bf16, epoch schedule + save_strategy=epoch +
    save_total_limit=1, lr 8e-4): epoch-based total steps, bf16 params,
    epoch-boundary checkpoints with only the newest kept."""
    _install_stubs(monkeypatch)
    out = str(tmp_path / "recipe")
    argv = ["--model_name_or_path", "facebook/opt-125m-stub",
            "--dataset_name", "wikitext",
            "--dataset_config_name", "wikitext-2-raw-v1",
            "--num_train_epochs", "2", "--block_size", "512",
            "--batch_size", "1", "--gradient_accumulation_steps", "1",
            "--optim", "adafactor", "--learning_rate", "8e-4",
            "--bf16", "--save_strategy", "epoch",
            "--save_total_limit", "1", "--eval_steps", "7",
            "--overwrite_output_dir", "--output_dir", out]
    assert ft_cli.main(argv) == 0
    txt = capsys.readouterr().out
    # 4000 stub tokens / block 512 = 7 blocks -> 7 steps/epoch, 2 epochs
    cks = sorted(os.listdir(out))
    assert cks == ["checkpoint-14"], cks  # epoch saves, older one pruned
    assert "pruned checkpoint-7 (save_total_limit)" in txt
    assert "eval ppl" in txt and "accuracy" in txt
    # checkpointed weights are bf16
    from gptq_tpu.io import load_checkpoint

    _, loaded, _ = load_checkpoint(os.path.join(out, "checkpoint-14",
                                                "model"))
    import jax.numpy as jnp

    assert loaded["layers"][0]["q"]["w"].dtype == jnp.bfloat16
