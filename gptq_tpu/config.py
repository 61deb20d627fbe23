"""Typed configuration shared by every driver.

Replaces the 4x-duplicated argparse surface of the reference drivers
(reference: opt.py:514-658, llama.py:340-488, bloom.py:421-467) with one
dataclass. Field names and defaults mirror the reference flags so that
recipes in the reference's script/*.sh translate 1:1.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass
from typing import Any


@dataclass
class QuantConfig:
    """Capability surface of the reference CLI (reference: opt.py:514-658)."""

    # Core GPTQ
    wbits: int = 16                  # {1,2,3,4,8,16}
    trits: bool = False              # ternary grid (reference: quant.py:34-35)
    groupsize: int = -1              # -1 = whole-row groups
    sym: bool = False
    percdamp: float = 0.01
    blocksize: int = 128
    act_order: bool = False
    static_groups: bool = False
    true_sequential: bool = False    # llama/gemma sub-block ordering
    nearest: bool = False            # RTN baseline instead of GPTQ
    mse: bool = False                # grid-shrink search in find_params

    # Calibration
    dataset: str = "c4"              # wikitext2 | ptb | c4 (+-new variants)
    nsamples: int = 128
    seed: int = 0
    seqlen: int | None = None        # None -> model max_position_embeddings

    # BCQ / shift (APoT) path (reference: bcq_quant/)
    lut_eval: bool = False           # BCQ alphas fit once per layer
    columnwise: bool = False         # re-fit alpha every 8 columns w/ APoT
    bcq_round: int = 5               # alternating-refinement rounds
    use_bst: bool = True             # binary-search B assignment
    apot_nums: int = 2               # #signed powers of two per alpha
    bcq: bool = False                # Hessian-free whole-model BCQ (RTN-style)

    # Non-linear (non-uniform grid) path (reference: nonLinear_quant.py)
    non_linear: bool = False
    hyperbits: int = 5
    exploreBits: int = 1
    exploreSplit: int = 20

    # Mixed precision
    layermix: bool = False           # per-layer bits from layerwise.json
    linearmix: bool = False          # per-linear-type bits from linearwise.json
    quant_config: str | None = None  # per-module {bits, columnwise} JSON

    # Serving / io
    save: str | None = None
    load: str | None = None
    benchmark: int = 0
    check: bool = False
    faster_kernel: bool = False      # serve with dynamic int8 activations
    # (w4a8): the int8 MXU mode runs 2x — the reference flag selects its
    # half2 LUT kernel (quant.py:195-200), this selects our fast path
    new_eval: bool = False

    def __post_init__(self) -> None:
        if self.wbits not in (1, 2, 3, 4, 8, 16):
            raise ValueError(f"wbits must be one of 1,2,3,4,8,16, got {self.wbits}")
        if self.trits and self.wbits != 16:
            # trits replaces the uniform grid; wbits is ignored in that case
            pass

    @property
    def maxq(self) -> int:
        """Grid max for the uniform quantizer; -1 selects the ternary branch."""
        return -1 if self.trits else (1 << self.wbits) - 1

    def replace(self, **kw: Any) -> "QuantConfig":
        return dataclasses.replace(self, **kw)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, s: str) -> "QuantConfig":
        return cls(**json.loads(s))


@dataclass
class MixedPrecision:
    """Per-module bit allocation (reference: quant_bit/{layerwise,linearwise}.json,
    --quant_config consumed at opt.py:94-99,193-204)."""

    layer_bits: list[int] | None = None          # bits[i] for decoder layer i
    linear_bits: dict[str, int] | None = None     # bits per linear type name
    module_config: dict[str, dict] | None = None  # full module path -> {bits, columnwise}

    def bits_for(self, layer_idx: int, linear_name: str, default: int) -> int:
        short = linear_name.split(".")[-1]
        if self.module_config is not None:
            for key, cfg in self.module_config.items():
                if key.endswith(f"{layer_idx}.{linear_name}") or key.endswith(
                    f"{layer_idx}.{short}"
                ):
                    return int(cfg["bits"])
        if self.linear_bits is not None and short in self.linear_bits:
            return int(self.linear_bits[short])
        if self.layer_bits is not None:
            return int(self.layer_bits[layer_idx])
        return default

    def columnwise_for(self, layer_idx: int, linear_name: str, default: bool) -> bool:
        if self.module_config is not None:
            short = linear_name.split(".")[-1]
            for key, cfg in self.module_config.items():
                if key.endswith(f"{layer_idx}.{linear_name}") or key.endswith(
                    f"{layer_idx}.{short}"
                ):
                    return bool(cfg.get("columnwise", default))
        return default
