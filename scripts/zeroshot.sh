#!/bin/bash
# zero-shot task suite after 4-bit quantization (reference: zeroShot/main.py)
MODEL=${1:-facebook/opt-125m}
python -m gptq_tpu.cli "$MODEL" c4 --wbits 4 \
    --task lambada,piqa,arc_easy,arc_challenge,boolq,cb,copa,wic,wsc,multirc,rte,record,storycloze
