#!/usr/bin/env bash
# Fastest serving configurations (counterpart of the reference's
# --benchmark recipes in script/eval_opt.sh / README.md:100-105).
#
# The decode path serves each llama-family layer as TWO fused Pallas
# launches (ln+qkv; o+norm+FFN) when --faster-kernel (w4a8) is on;
# OPT/BLOOM get the layernorm/bias variants automatically.
set -e

MODEL=${1:-meta-llama/Llama-2-7b-hf}
CKPT=${2:-llama7b-4bit.npz}

# quantize + save once
python -m gptq_tpu.cli "$MODEL" c4 --wbits 4 --save "$CKPT"

# batch-1 decode benchmark, fastest single-chip config:
# dynamic int8 activations + 8-bit packed lm_head
python -m gptq_tpu.cli "$MODEL" c4 --load "$CKPT" --benchmark 128 --check \
    --faster-kernel --quant_lm_head 8

# long-context serving: int8 KV cache (half the cache HBM; fused
# dequant attention kernel)
python -m gptq_tpu.cli "$MODEL" c4 --load "$CKPT" --benchmark 128 \
    --faster-kernel --quant_lm_head 8 --int8_kv

# batched lock-step decode (weight streaming amortizes across requests)
python -m gptq_tpu.cli "$MODEL" c4 --load "$CKPT" --benchmark 96 \
    --benchmark_batch 32 --faster-kernel --quant_lm_head 8
