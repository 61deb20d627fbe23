#!/bin/bash
# whole-model BCQ RTN path (reference: script/bcq_quant.sh)
MODEL=${1:-facebook/opt-125m}
python -m gptq_tpu.cli "$MODEL" c4 --wbits 3 --bcq --bcq_round 50
