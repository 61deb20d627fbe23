#!/bin/bash
# Gemma recipes (reference: script/eval_gemma.sh)
MODEL=${1:-google/gemma-2b}
python -m gptq_tpu.cli "$MODEL" c4 --wbits 4 --true-sequential
python -m gptq_tpu.cli "$MODEL" c4 --wbits 3 --true-sequential --act-order
