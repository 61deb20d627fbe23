#!/bin/bash
# Canonical OPT recipes (reference: script/eval_opt.sh)
MODEL=${1:-facebook/opt-125m}

# plain GPTQ at 2/3/4 bits
python -m gptq_tpu.cli "$MODEL" c4 --wbits 4
python -m gptq_tpu.cli "$MODEL" c4 --wbits 3
python -m gptq_tpu.cli "$MODEL" c4 --wbits 2 --groupsize 64

# RTN baseline
python -m gptq_tpu.cli "$MODEL" c4 --wbits 4 --nearest

# columnwise BCQ shift (ShiftAddLLM-style)
python -m gptq_tpu.cli "$MODEL" c4 --wbits 3 --columnwise --bcq_round 50 \
    --apot_nums 2 --use_bst
python -m gptq_tpu.cli "$MODEL" c4 --wbits 3 --columnwise --bcq_round 50 \
    --apot_nums 3 --use_bst

# BCQ LUT eval
python -m gptq_tpu.cli "$MODEL" c4 --wbits 3 --lut_eval --bcq_round 20

# non-linear grids
python -m gptq_tpu.cli "$MODEL" c4 --wbits 3 --non_linear --hyperbits 5 \
    --exploreBits 1 --exploreSplit 20

# mixed precision
python -m gptq_tpu.cli "$MODEL" c4 --wbits 3 --layermix
python -m gptq_tpu.cli "$MODEL" c4 --wbits 3 --linearmix

# save packed + decode benchmark
python -m gptq_tpu.cli "$MODEL" c4 --wbits 4 --save opt4.npz
python -m gptq_tpu.cli "$MODEL" c4 --load opt4.npz --benchmark 128 --check
