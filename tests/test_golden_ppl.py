"""Hub-gated golden PPL (VERDICT r2 #4): reproduce the reference's own
recorded result logs (reference: quant_bit/ppl.txt, llama_ppl.txt) the
moment real checkpoints are reachable. This container has no HF hub
egress, so these SKIP here — they exist so the claim becomes testable
the instant the environment allows (scripts/golden_ppl.sh is the manual
counterpart). Calibration windows are RNG-parity with the reference
(gptq_tpu/data.py), so the numbers must land within noise."""

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


hub = pytest.mark.skipif(not _hub_reachable(),
                         reason="HF hub unreachable — golden PPL needs "
                                "real checkpoints (run via "
                                "scripts/golden_ppl.sh when online)")

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


@hub
def test_golden_opt125m_3bit_columnwise(tmp_path):
    """reference quant_bit/ppl.txt:4 — opt-125m 3-bit columnwise APoT(2)
    bcq_round 10 wiki2 = 40.99 (the fork's own recorded run)."""
    ppl = _run_and_read(["facebook/opt-125m", "wikitext2", "--wbits", "3",
                         "--columnwise", "--apot_nums", "2",
                         "--bcq_round", "10"], tmp_path)
    assert abs(ppl - 40.99) / 40.99 < 0.05, ppl


@hub
def test_golden_opt125m_3bit_columnwise_apot3(tmp_path):
    """reference quant_bit/ppl.txt:6 — APoT(3) variant, wiki2 = 39.26."""
    ppl = _run_and_read(["facebook/opt-125m", "wikitext2", "--wbits", "3",
                         "--columnwise", "--apot_nums", "3",
                         "--bcq_round", "10"], tmp_path)
    assert abs(ppl - 39.26) / 39.26 < 0.05, ppl


@hub
def test_golden_opt125m_4bit(tmp_path):
    """Original GPTQ table (the reference forked it): OPT-125m 4-bit
    GPTQ wiki2 = 31.12 (fp16 27.65)."""
    ppl = _run_and_read(["facebook/opt-125m", "c4", "--wbits", "4"],
                        tmp_path)
    assert abs(ppl - 31.12) / 31.12 < 0.05, ppl


@hub
@full
def test_golden_llama2_7b_4bit(tmp_path):
    """reference quant_bit/llama_ppl.txt:11 — LLaMa-2-7B 4-bit (groupsize
    -1, no act-order) wiki2 = 7.77."""
    ppl = _run_and_read(["meta-llama/Llama-2-7b-hf", "c4", "--wbits", "4"],
                        tmp_path)
    assert abs(ppl - 7.77) / 7.77 < 0.05, ppl


@hub
@full
def test_golden_bloom7b_3bit_columnwise(tmp_path):
    """reference quant_bit/bloom_ppl.txt:25 — BLOOM-7b1 3-bit columnwise
    APoT(2) wiki2 = 13.34."""
    ppl = _run_and_read(["bigscience/bloom-7b1", "c4", "--wbits", "3",
                         "--columnwise", "--apot_nums", "2"], tmp_path)
    assert abs(ppl - 13.34) / 13.34 < 0.05, ppl
