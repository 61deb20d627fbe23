#!/bin/bash
# Golden-PPL reproduction against the reference's own recorded results
# (VERDICT r2 #4). Requires HF hub access (this container has none) and,
# for the 7B rows, a real TPU + disk for the checkpoints. Expected
# numbers come from the reference's result logs; the calibration windows
# are RNG-parity (gptq_tpu/data.py) so runs should land within ~5%.
# The pytest twin is tests/test_golden_ppl.py (skip-marked offline).
set -ex

PY=${PY:-/opt/venv/bin/python}

# reference quant_bit/ppl.txt:4 -> 40.99
$PY -m gptq_tpu.cli facebook/opt-125m wikitext2 --wbits 3 --columnwise \
    --apot_nums 2 --bcq_round 10 --results_log results/golden_ppl.txt

# reference quant_bit/ppl.txt:6 -> 39.26
$PY -m gptq_tpu.cli facebook/opt-125m wikitext2 --wbits 3 --columnwise \
    --apot_nums 3 --bcq_round 10 --results_log results/golden_ppl.txt

# reference README.md OPT-125m 4-bit -> 31.12 (fp16 27.65)
$PY -m gptq_tpu.cli facebook/opt-125m c4 --wbits 4 \
    --results_log results/golden_ppl.txt

# reference quant_bit/llama_ppl.txt:11 -> 7.77 (LLaMa-2-7B 4-bit)
$PY -m gptq_tpu.cli meta-llama/Llama-2-7b-hf c4 --wbits 4 \
    --results_log results/golden_ppl.txt

# reference quant_bit/llama_ppl.txt:25,27 -> 10.68 / 5.40 (13B 3/4-bit)
# $PY -m gptq_tpu.cli meta-llama/Llama-2-13b-hf c4 --wbits 3 ...
# reference quant_bit/bloom_ppl.txt:25 -> 13.34
$PY -m gptq_tpu.cli bigscience/bloom-7b1 c4 --wbits 3 --columnwise \
    --apot_nums 2 --results_log results/golden_ppl.txt

# reference quant_bit/gemma_ppl.txt:9 -> 40.93 (gemma-2b 4-bit)
$PY -m gptq_tpu.cli google/gemma-2b c4 --wbits 4 \
    --results_log results/golden_ppl.txt

grep "dataset = wikitext2" results/golden_ppl.txt
