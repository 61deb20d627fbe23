"""End-to-end CLI main(): quantize -> eval -> save -> load -> re-eval with
mocked tokenizer/datasets and a real tiny HF model on disk (offline)."""

import sys
import types

import numpy as np
import pytest
import torch

from gptq_tpu.cli import main
from gptq_tpu.data import synthetic_stream

VOCAB = 99


class FakeTokenizer:
    """Text -> deterministic synthetic ids (offline stand-in)."""

    def __call__(self, text, **kw):
        n = max(64, min(len(text) // 3, 6000))
        return types.SimpleNamespace(
            input_ids=synthetic_stream(VOCAB, n, seed=len(text) % 97).tolist())


class FakeSplit:
    def __init__(self, rows, key):
        self.rows, self.key = rows, key

    def __len__(self):
        return len(self.rows)

    def __getitem__(self, i):
        if isinstance(i, str):
            return self.rows
        return {self.key: self.rows[i]}


@pytest.fixture()
def tiny_model_dir(tmp_path):
    from transformers import OPTConfig, OPTForCausalLM

    torch.manual_seed(0)
    cfg = OPTConfig(vocab_size=VOCAB, hidden_size=32, num_hidden_layers=2,
                    ffn_dim=64, num_attention_heads=4,
                    max_position_embeddings=64)
    model = OPTForCausalLM(cfg)
    d = tmp_path / "tiny-opt"
    model.save_pretrained(d)
    return str(d)


def test_cli_quantize_save_load_cycle(tiny_model_dir, tmp_path, monkeypatch,
                                      capsys):
    rows = [" ".join(f"w{i}_{j}" for j in range(30)) for i in range(50)]
    fake_ds = types.SimpleNamespace(
        load_dataset=lambda *a, **k: FakeSplit(rows, "text"))
    monkeypatch.setitem(sys.modules, "datasets", fake_ds)

    import transformers

    monkeypatch.setattr(
        transformers.AutoTokenizer, "from_pretrained",
        classmethod(lambda cls, *a, **k: FakeTokenizer()))

    ckpt = str(tmp_path / "q.npz")
    log = str(tmp_path / "ppl.txt")
    rc = main([tiny_model_dir, "wikitext2", "--wbits", "4", "--nsamples", "2",
               "--save", ckpt, "--results_log", log, "--quant_lm_head", "8"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "quantization done" in out
    assert "saved" in out
    with open(log) as f:
        lines = f.read().strip().splitlines()
    assert lines and "wbits = 4" in lines[0]
    ppl0 = float(lines[0].split(":")[-1])

    # reload the packed checkpoint and re-evaluate: identical model
    rc = main([tiny_model_dir, "wikitext2", "--load", ckpt,
               "--results_log", log])
    assert rc == 0
    with open(log) as f:
        lines = f.read().strip().splitlines()
    ppl1 = float(lines[-1].split(":")[-1])
    # packed serving vs fake-quant eval: same weights within pack rounding
    assert abs(ppl1 - ppl0) / ppl0 < 0.05


def test_cli_mixtral_quant_experts_cycle(tmp_path, monkeypatch, capsys):
    """Routed-MoE end-to-end through the CLI: a tiny HF Mixtral converts
    (block_sparse_moe -> router/experts), --quant_experts gptq runs the
    per-expert Hessian pass + int8 storage, the checkpoint round-trips,
    and the reloaded model re-evaluates within pack rounding."""
    from transformers import MixtralConfig, MixtralForCausalLM

    torch.manual_seed(1)
    cfg = MixtralConfig(vocab_size=VOCAB, hidden_size=32,
                        num_hidden_layers=2, intermediate_size=64,
                        num_attention_heads=4, num_key_value_heads=2,
                        max_position_embeddings=64, num_local_experts=4,
                        num_experts_per_tok=2)
    model = MixtralForCausalLM(cfg)
    d = tmp_path / "tiny-mixtral"
    model.save_pretrained(d)

    rows = [" ".join(f"w{i}_{j}" for j in range(30)) for i in range(50)]
    fake_ds = types.SimpleNamespace(
        load_dataset=lambda *a, **k: FakeSplit(rows, "text"))
    monkeypatch.setitem(sys.modules, "datasets", fake_ds)

    import transformers

    monkeypatch.setattr(
        transformers.AutoTokenizer, "from_pretrained",
        classmethod(lambda cls, *a, **k: FakeTokenizer()))

    ckpt = str(tmp_path / "moe.npz")
    log = str(tmp_path / "ppl.txt")
    rc = main([str(d), "wikitext2", "--wbits", "4", "--nsamples", "2",
               "--quant_experts", "gptq", "--save", ckpt,
               "--results_log", log])
    assert rc == 0
    out = capsys.readouterr().out
    assert "expert stacks quantized" in out
    with open(log) as f:
        ppl0 = float(f.read().strip().splitlines()[0].split(":")[-1])

    rc = main([str(d), "wikitext2", "--load", ckpt, "--results_log", log])
    assert rc == 0
    with open(log) as f:
        ppl1 = float(f.read().strip().splitlines()[-1].split(":")[-1])
    assert abs(ppl1 - ppl0) / ppl0 < 0.05


def test_cli_sp_tp_int8_spcache_benchmark(tmp_path, monkeypatch, capsys):
    """Long-context serving from the CLI (VERDICT r2 #1): quantize + pack
    a tiny llama for tp=2, then serve the packed checkpoint through
    --benchmark --sp 2 --tp 2 --int8_kv --faster-kernel — ring-attention
    prefill, never-gathered int8 SPCache decode, fused-a8 weights over tp,
    all entered through gptq_tpu.cli rather than the library."""
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(2)
    cfg = LlamaConfig(vocab_size=VOCAB, hidden_size=1024,
                      num_hidden_layers=1, intermediate_size=1024,
                      num_attention_heads=4, num_key_value_heads=4,
                      max_position_embeddings=64)
    model = LlamaForCausalLM(cfg)
    d = tmp_path / "tiny-llama"
    model.save_pretrained(d)

    rows = [" ".join(f"w{i}_{j}" for j in range(30)) for i in range(50)]
    fake_ds = types.SimpleNamespace(
        load_dataset=lambda *a, **k: FakeSplit(rows, "text"))
    monkeypatch.setitem(sys.modules, "datasets", fake_ds)

    import transformers

    monkeypatch.setattr(
        transformers.AutoTokenizer, "from_pretrained",
        classmethod(lambda cls, *a, **k: FakeTokenizer()))

    ckpt = str(tmp_path / "q.npz")
    log = str(tmp_path / "ppl.txt")
    rc = main([str(d), "wikitext2", "--wbits", "4", "--nsamples", "2",
               "--groupsize", "128", "--tp", "2", "--save", ckpt,
               "--results_log", log])
    assert rc == 0

    rc = main([str(d), "wikitext2", "--load", ckpt, "--benchmark", "24",
               "--sp", "2", "--tp", "2", "--int8_kv", "--faster-kernel",
               "--check", "--results_log", log])
    assert rc == 0
    out = capsys.readouterr().out
    assert "sp=2 tp=2 cache=int8" in out
    assert "PPL:" in out
    with open(log) as f:
        last = f.read().strip().splitlines()[-1]
    assert "protocol = chained-sp2xtp2" in last
    ppl = float(last.split(":")[-1])
    assert np.isfinite(ppl) and ppl > 0


def test_cli_ep_benchmark(tmp_path, monkeypatch, capsys):
    """MoE serving from the CLI: --quant_experts rtn checkpoint served
    through --benchmark --ep 2 (expert stacks sharded over the ep axis)."""
    from transformers import MixtralConfig, MixtralForCausalLM

    torch.manual_seed(3)
    cfg = MixtralConfig(vocab_size=VOCAB, hidden_size=32,
                        num_hidden_layers=2, intermediate_size=64,
                        num_attention_heads=4, num_key_value_heads=2,
                        max_position_embeddings=64, num_local_experts=4,
                        num_experts_per_tok=2)
    model = MixtralForCausalLM(cfg)
    d = tmp_path / "tiny-mixtral"
    model.save_pretrained(d)

    rows = [" ".join(f"w{i}_{j}" for j in range(30)) for i in range(50)]
    fake_ds = types.SimpleNamespace(
        load_dataset=lambda *a, **k: FakeSplit(rows, "text"))
    monkeypatch.setitem(sys.modules, "datasets", fake_ds)

    import transformers

    monkeypatch.setattr(
        transformers.AutoTokenizer, "from_pretrained",
        classmethod(lambda cls, *a, **k: FakeTokenizer()))

    ckpt = str(tmp_path / "moe.npz")
    log = str(tmp_path / "ppl.txt")
    rc = main([str(d), "wikitext2", "--wbits", "4", "--nsamples", "2",
               "--quant_experts", "rtn", "--save", ckpt,
               "--results_log", log])
    assert rc == 0

    rc = main([str(d), "wikitext2", "--load", ckpt, "--benchmark", "16",
               "--ep", "2", "--results_log", log])
    assert rc == 0
    out = capsys.readouterr().out
    assert "ep=2 tp=1:" in out
    with open(log) as f:
        last = f.read().strip().splitlines()[-1]
    assert "protocol = chained-ep2" in last


def test_cli_mixtral_packed_experts_cycle(tmp_path, monkeypatch, capsys):
    """--quant_experts gptq --expert_bits 4: per-expert-Hessian GPTQ with
    stashed grids, sub-byte PackedExperts banks, checkpoint round-trip,
    and re-eval of the packed bank within tolerance."""
    from transformers import MixtralConfig, MixtralForCausalLM

    torch.manual_seed(4)
    cfg = MixtralConfig(vocab_size=VOCAB, hidden_size=32,
                        num_hidden_layers=2, intermediate_size=64,
                        num_attention_heads=4, num_key_value_heads=2,
                        max_position_embeddings=64, num_local_experts=4,
                        num_experts_per_tok=2)
    model = MixtralForCausalLM(cfg)
    d = tmp_path / "tiny-mixtral"
    model.save_pretrained(d)

    rows = [" ".join(f"w{i}_{j}" for j in range(30)) for i in range(50)]
    fake_ds = types.SimpleNamespace(
        load_dataset=lambda *a, **k: FakeSplit(rows, "text"))
    monkeypatch.setitem(sys.modules, "datasets", fake_ds)

    import transformers

    monkeypatch.setattr(
        transformers.AutoTokenizer, "from_pretrained",
        classmethod(lambda cls, *a, **k: FakeTokenizer()))

    ckpt = str(tmp_path / "moe4.npz")
    log = str(tmp_path / "ppl.txt")
    rc = main([str(d), "wikitext2", "--wbits", "4", "--nsamples", "2",
               "--quant_experts", "gptq", "--expert_bits", "4",
               "--save", ckpt, "--results_log", log])
    assert rc == 0
    out = capsys.readouterr().out
    assert "expert stacks packed (gptq -> 4-bit byteplane banks)" in out
    with open(log) as f:
        ppl0 = float(f.read().strip().splitlines()[0].split(":")[-1])

    from gptq_tpu.io import load_checkpoint
    from gptq_tpu.ops.pack import PackedExperts

    _, params2, _ = load_checkpoint(ckpt)
    assert isinstance(params2["layers"][0]["experts"]["gate"],
                      PackedExperts)

    rc = main([str(d), "wikitext2", "--load", ckpt, "--results_log", log])
    assert rc == 0
    with open(log) as f:
        ppl1 = float(f.read().strip().splitlines()[-1].split(":")[-1])
    assert abs(ppl1 - ppl0) / ppl0 < 0.05


def test_cli_cfg_less_checkpoint_logs_inferred_bits(tmp_path, capsys):
    """A checkpoint saved WITHOUT a QuantConfig (programmatic
    save_checkpoint, e.g. bench harnesses) must still log its benchmark
    lines with the bits the packed weights actually carry, inferred from
    the PackedWeight leaves — not the argparse default wbits=16."""
    import dataclasses
    import os
    import sys as _sys

    _sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))))
    from bench import llama7b_spec, synth_packed_params
    from gptq_tpu.io import save_checkpoint

    spec = dataclasses.replace(llama7b_spec(), n_layers=2, hidden=256,
                               n_heads=2, n_kv_heads=2, ffn=512, vocab=128)
    params = synth_packed_params(spec, bits=3)
    ckpt = str(tmp_path / "cfgless.npz")
    save_checkpoint(ckpt, spec, params)  # no cfg on purpose
    log = str(tmp_path / "ppl.txt")
    rc = main(["dummy", "c4", "--load", ckpt, "--benchmark", "4",
               "--results_log", log])
    assert rc == 0
    with open(log) as f:
        line = f.read().strip().splitlines()[-1]
    assert "wbits = 3" in line, line
