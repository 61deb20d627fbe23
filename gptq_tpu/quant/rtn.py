"""Round-to-nearest baselines.

Covers the reference's two Hessian-free paths:
  * uniform RTN applied inline during eval (reference: opt.py:289-300)
  * whole-model BCQ compress/decompress, the `--bcq` flag
    (reference: bcq_quant/quant_model_bcq.py:78-97, bcq_parameter.py:9-55)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gptq_tpu.quant.bcq import quantize_shift
from gptq_tpu.quant.uniform import find_params, quantize_uniform


def rtn_quantize_weight(W: jax.Array, bits: int, sym: bool = False, mse: bool = False,
                        groupsize: int = -1) -> jax.Array:
    """Per-channel uniform RTN of a (out, in) weight (reference: opt.py:289-300;
    grouped variant mirrors find_params on column slices)."""
    W32 = W.astype(jnp.float32)
    if groupsize <= 0:
        p = find_params(W32, bits=bits, perchannel=True, sym=sym, mse=mse, weight=True)
        return quantize_uniform(W32, p.scale, p.zero, (1 << bits) - 1).astype(W.dtype)
    rows, cols = W.shape
    ng = cols // groupsize
    Wg = W32.reshape(rows, ng, groupsize).transpose(1, 0, 2)  # (ng, rows, g)

    def one(x):
        p = find_params(x, bits=bits, perchannel=True, sym=sym, mse=mse, weight=True)
        return quantize_uniform(x, p.scale, p.zero, (1 << bits) - 1)

    Qg = jax.vmap(one)(Wg)
    return Qg.transpose(1, 0, 2).reshape(rows, cols).astype(W.dtype)


def bcq_rtn_weight(
    W: jax.Array,
    bits: int,
    rounds: int = 50,
    groupsize: int = -1,
    apot_nums: int = 2,
    use_bst: bool = True,
    in_ch_wise: bool = False,
) -> jax.Array:
    """Whole-weight BCQ compress->decompress (reference:
    bcq_parameter.py:9-55 with quantize_shift rounds=50 at
    quant_model_bcq.py:88-94). `in_ch_wise` groups along input channels by
    transposing first, as BCQParameter.compress does."""
    x = W.T if in_ch_wise else W
    ret, _, _ = quantize_shift(
        x.astype(jnp.float32), qbits=bits, rounds=rounds, group_size=groupsize,
        use_bst=use_bst, apot_nums=apot_nums,
    )
    ret = ret.T if in_ch_wise else ret
    return ret.astype(W.dtype)
