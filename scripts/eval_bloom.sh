#!/bin/bash
# BLOOM recipes (reference: script/eval_bloom.sh)
MODEL=${1:-bigscience/bloom-560m}
python -m gptq_tpu.cli "$MODEL" c4 --wbits 4
python -m gptq_tpu.cli "$MODEL" c4 --wbits 3 --columnwise --bcq_round 50 --apot_nums 2
python -m gptq_tpu.cli "$MODEL" c4 --wbits 3 --columnwise --bcq_round 50 --apot_nums 3
