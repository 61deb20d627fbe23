"""Packed low-bit weight formats and TPU kernels.

    pack.py       — bit-packing into int32 words (uniform grids + BCQ bitplanes)
    qmatmul.py    — fused dequant-matmul (XLA-fusion path + Pallas kernel)
    bcq_matmul.py — BCQ bitplane matmul (sign-select formulation of LUT-GEMM)
"""

from gptq_tpu.ops.pack import (  # noqa: F401
    FIELD_SPLITS,
    PackedWeight,
    pack_bcq,
    pack_codes,
    pack_quantized,
    unpack_codes,
)
from gptq_tpu.ops.qmatmul import dequant, dequant_matmul  # noqa: F401
from gptq_tpu.ops.bcq_matmul import bcq_dequant, bcq_matmul  # noqa: F401
