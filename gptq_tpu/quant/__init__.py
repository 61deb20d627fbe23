"""Quantization algorithm core (pure-functional jnp).

Semantics-parity re-designs of the reference algorithms:
    uniform.py   — min-max/MSE uniform grids + ternary (reference: quant.py:6-131)
    gptq.py      — layer-wise second-order GPTQ solver (reference: gptq.py)
    bcq.py       — binary-coding quantization (reference: bcq_quant/bcq.py)
    shift.py     — additive-power-of-2 alpha rounding (reference: bcq_quant/bcq_shift.py)
    nonlinear.py — non-uniform grid search (reference: nonLinear_quant.py)
    rtn.py       — round-to-nearest baselines (reference: opt.py:289-300)
"""

from gptq_tpu.quant.uniform import UniformQuantizer, quantize_uniform, find_params  # noqa: F401
from gptq_tpu.quant.gptq import GPTQ, gptq_quantize, hessian_init, hessian_update  # noqa: F401
from gptq_tpu.quant.bcq import bcq_quantize, quantize_shift  # noqa: F401
from gptq_tpu.quant.nonlinear import NonLinearQuantizer  # noqa: F401
