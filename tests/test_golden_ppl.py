"""Hub-gated golden PPL (VERDICT r2 #4): reproduce the reference's own
recorded result logs (reference: quant_bit/ppl.txt, llama_ppl.txt) the
moment real checkpoints are reachable. This container has no HF hub
egress, so these SKIP here — they exist so the claim becomes testable
the instant the environment allows (scripts/golden_ppl.sh is the manual
counterpart). Two ways checkpoints become reachable (VERDICT r3 #7):
  * the HF hub (online host), or
  * a mounted local directory: set GPTQ_TPU_CKPT_DIR=/path and each test
    fires for any model id whose weights exist at
    $GPTQ_TPU_CKPT_DIR/<org>/<name> (gptq_tpu resolves the id there
    automatically, models/convert.resolve_model_path).
Calibration windows are RNG-parity with the reference (gptq_tpu/data.py),
so the numbers must land within noise."""

import os
import socket
from urllib.parse import urlparse

import pytest


def _hub_reachable(timeout: float = 3.0) -> bool:
    host = urlparse(
        os.environ.get("HF_ENDPOINT") or "https://huggingface.co"
    ).hostname or "huggingface.co"
    try:
        socket.create_connection((host, 443), timeout=timeout).close()
        return True
    except OSError:
        return False


def _local_ckpt(model_id: str) -> bool:
    from gptq_tpu.models.convert import resolve_model_path

    return resolve_model_path(model_id) != model_id


_HUB = _hub_reachable()


def needs_model(model_id: str):
    """Skip unless the model's weights are reachable (hub OR a mounted
    GPTQ_TPU_CKPT_DIR directory)."""
    return pytest.mark.skipif(
        not (_HUB or _local_ckpt(model_id)),
        reason=f"{model_id} unreachable: HF hub offline and no "
               f"$GPTQ_TPU_CKPT_DIR/{model_id} mount (run via "
               f"scripts/golden_ppl.sh when weights are available)")

full = pytest.mark.skipif(os.environ.get("GPTQ_TPU_GOLDEN_FULL") != "1",
                          reason="7B-scale golden run: set "
                                 "GPTQ_TPU_GOLDEN_FULL=1 (needs TPU + "
                                 "~30 GB of downloads)")


def _run_and_read(args, tmp_path):
    from gptq_tpu.cli import main

    log = str(tmp_path / "golden.txt")
    rc = main(args + ["--results_log", log])
    assert rc == 0
    with open(log) as f:
        for line in f.read().splitlines():
            if "dataset = wikitext2" in line:
                return float(line.split(":")[-1])
    raise AssertionError("no wikitext2 result line")


@needs_model("facebook/opt-125m")
def test_golden_opt125m_3bit_columnwise(tmp_path):
    """reference quant_bit/ppl.txt:4 — opt-125m 3-bit columnwise APoT(2)
    bcq_round 10 wiki2 = 40.99 (the fork's own recorded run)."""
    ppl = _run_and_read(["facebook/opt-125m", "wikitext2", "--wbits", "3",
                         "--columnwise", "--apot_nums", "2",
                         "--bcq_round", "10"], tmp_path)
    assert abs(ppl - 40.99) / 40.99 < 0.05, ppl


@needs_model("facebook/opt-125m")
def test_golden_opt125m_3bit_columnwise_apot3(tmp_path):
    """reference quant_bit/ppl.txt:6 — APoT(3) variant, wiki2 = 39.26."""
    ppl = _run_and_read(["facebook/opt-125m", "wikitext2", "--wbits", "3",
                         "--columnwise", "--apot_nums", "3",
                         "--bcq_round", "10"], tmp_path)
    assert abs(ppl - 39.26) / 39.26 < 0.05, ppl


@needs_model("facebook/opt-125m")
def test_golden_opt125m_4bit(tmp_path):
    """Original GPTQ table (the reference forked it): OPT-125m 4-bit
    GPTQ wiki2 = 31.12 (fp16 27.65)."""
    ppl = _run_and_read(["facebook/opt-125m", "c4", "--wbits", "4"],
                        tmp_path)
    assert abs(ppl - 31.12) / 31.12 < 0.05, ppl


@needs_model("meta-llama/Llama-2-7b-hf")
@full
def test_golden_llama2_7b_4bit(tmp_path):
    """reference quant_bit/llama_ppl.txt:11 — LLaMa-2-7B 4-bit (groupsize
    -1, no act-order) wiki2 = 7.77."""
    ppl = _run_and_read(["meta-llama/Llama-2-7b-hf", "c4", "--wbits", "4"],
                        tmp_path)
    assert abs(ppl - 7.77) / 7.77 < 0.05, ppl


@needs_model("bigscience/bloom-7b1")
@full
def test_golden_bloom7b_3bit_columnwise(tmp_path):
    """reference quant_bit/bloom_ppl.txt:25 — BLOOM-7b1 3-bit columnwise
    APoT(2) wiki2 = 13.34."""
    ppl = _run_and_read(["bigscience/bloom-7b1", "c4", "--wbits", "3",
                         "--columnwise", "--apot_nums", "2"], tmp_path)
    assert abs(ppl - 13.34) / 13.34 < 0.05, ppl


def test_ckpt_dir_override_resolves(tmp_path, monkeypatch):
    """GPTQ_TPU_CKPT_DIR maps hub ids onto mounted directories (this is
    what arms every golden test above without code changes)."""
    from gptq_tpu.models.convert import resolve_model_path

    (tmp_path / "facebook" / "opt-125m").mkdir(parents=True)
    (tmp_path / "bloom-7b1").mkdir()
    monkeypatch.setenv("GPTQ_TPU_CKPT_DIR", str(tmp_path))
    assert resolve_model_path("facebook/opt-125m") == str(
        tmp_path / "facebook" / "opt-125m")
    # falls back to the bare name when the org subdir is absent
    assert resolve_model_path("bigscience/bloom-7b1") == str(
        tmp_path / "bloom-7b1")
    # unknown ids pass through to the hub untouched
    assert resolve_model_path("org/unknown") == "org/unknown"
    # an existing local path always wins, even without the env
    monkeypatch.delenv("GPTQ_TPU_CKPT_DIR")
    assert resolve_model_path(str(tmp_path)) == str(tmp_path)
