"""Perplexity evaluation with reference-identical semantics.

Replicates the reference eval loop (reference: opt.py:230-334): the test
stream is cut into non-overlapping seqlen windows, per-window mean
cross-entropy over the seqlen-1 shifted targets is scaled by seqlen, and
PPL = exp(sum_nll / (nsamples * seqlen)). No layer streaming is needed on
TPU — the whole forward fits; each window is one jitted call.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from gptq_tpu.models.common import ArchSpec, model_forward


def eval_ppl(
    spec: ArchSpec,
    params: dict,
    test_ids: np.ndarray,  # (1, total_tokens) token stream
    seqlen: int,
    log=print,
) -> float:
    total = test_ids.shape[1] if test_ids.ndim == 2 else test_ids.shape[0]
    ids = np.asarray(test_ids).reshape(-1)
    nsamples = total // seqlen

    # params pass as a jit ARGUMENT, not a closure: closed-over 7B-scale
    # weights overflow the relayed compile service's request body
    # (HTTP 413; see pipeline._layer_scan)
    @jax.jit
    def window_nll(p, window):
        logits, _ = model_forward(spec, p, window[None])
        logits = logits[0, :-1].astype(jnp.float32)
        targets = window[1:]
        logz = jax.nn.logsumexp(logits, axis=-1)
        tok = jnp.take_along_axis(logits, targets[:, None], axis=-1)[:, 0]
        # mean CE over seqlen-1 tokens, scaled by seqlen
        # (reference: opt.py:329-331 uses CrossEntropyLoss mean * seqlen)
        return jnp.mean(logz - tok) * seqlen

    nlls = []
    for i in range(nsamples):
        w = jnp.asarray(ids[i * seqlen : (i + 1) * seqlen])
        nlls.append(float(window_nll(params, w)))
    ppl = float(np.exp(np.sum(nlls) / (nsamples * seqlen)))
    log(f"ppl = {ppl:.4f} over {nsamples} windows")
    return ppl
