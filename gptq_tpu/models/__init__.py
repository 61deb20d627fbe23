"""Functional model zoo: OPT, BLOOM, LLaMa(-2), Gemma.

One decoder-block interface shared by all architectures (SURVEY.md §7
"one model zoo, one driver"); per-arch quirks (OPT projections, BLOOM
alibi, LLaMa/Gemma rotary + true-sequential groups) live in the arch
definitions, not the driver.
"""

from gptq_tpu.models.common import (  # noqa: F401
    ArchSpec,
    KVCache,
    block_forward,
    embed_forward,
    head_forward,
    init_params,
    linear_apply,
    model_forward,
)
from gptq_tpu.models.registry import ARCHS, get_arch, spec_from_hf_config  # noqa: F401
from gptq_tpu.models.convert import params_from_hf_torch  # noqa: F401
