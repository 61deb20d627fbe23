#!/bin/bash
# LLaMa recipes (reference: script/eval_llama.sh)
MODEL=${1:-meta-llama/Llama-2-7b-hf}
python -m gptq_tpu.cli "$MODEL" c4 --wbits 4 --true-sequential --act-order --new-eval
python -m gptq_tpu.cli "$MODEL" c4 --wbits 3 --true-sequential --act-order --new-eval
python -m gptq_tpu.cli "$MODEL" c4 --wbits 3 --groupsize 128 --true-sequential \
    --act-order --static-groups --new-eval
python -m gptq_tpu.cli "$MODEL" c4 --wbits 4 --save llama4.npz
python -m gptq_tpu.cli "$MODEL" c4 --load llama4.npz --benchmark 128 --check
