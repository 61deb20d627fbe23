"""gptq_tpu — a TPU-native GPTQ quantization and low-bit inference framework.

A from-scratch JAX/XLA/Pallas re-design with the capability surface of the
reference GPTQ research fork (layer-wise second-order quantization, BCQ
binary-coding + additive-power-of-2 "shift" quantization, LUT-GEMM-class
low-bit serving kernels, non-uniform grid quantization, mixed precision,
sensitivity analysis, model drivers for OPT/BLOOM/LLaMa/Gemma, PPL +
zero-shot eval, decode benchmarking and a finetune harness).

Layout:
    gptq_tpu.quant     — quantization algorithms (pure functional jnp)
    gptq_tpu.ops       — Pallas TPU kernels + packed-weight formats
    gptq_tpu.models    — functional model zoo (OPT, BLOOM, LLaMa, Gemma)
    gptq_tpu.parallel  — mesh / sharding rules (tp/dp over ICI+DCN)
    gptq_tpu.engine    — KV-cache decode engine + benchmarking
    gptq_tpu.eval      — perplexity + zero-shot task harness
    gptq_tpu.data      — calibration/eval dataset loaders (reference-parity RNG)
"""

__version__ = "0.1.0"

from gptq_tpu.config import QuantConfig  # noqa: F401
