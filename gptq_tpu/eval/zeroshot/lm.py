"""Batched loglikelihood scoring against a gptq_tpu model.

Counterpart of the reference BaseLM (reference:
zeroShot/models/models_utils.py:190-409): requests are length-sorted
(Reorderer), right-padded into buckets, run through one jitted forward per
bucket shape, and each continuation's token logprobs are summed; is_greedy
records whether the continuation is the argmax rollout. The reference's
layer-streamed CPU-offloaded `_model_logits_on_dataset` is unnecessary on
TPU — the model is resident.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from gptq_tpu.models.common import ArchSpec, model_forward


def _bucket(n: int, buckets=(32, 64, 128, 256, 512, 1024, 2048)) -> int:
    for b in buckets:
        if n <= b:
            return b
    return n


class JaxLM:
    def __init__(self, spec: ArchSpec, params: dict, tokenizer,
                 max_length: int = 2048, batch_size: int = 8,
                 eot_token_id: int | None = None):
        self.spec = spec
        self.params = params
        self.tok = tokenizer
        self.max_length = min(max_length, spec.max_pos)
        self.batch_size = batch_size
        self.eot = eot_token_id if eot_token_id is not None else getattr(
            tokenizer, "eos_token_id", 0) or 0

        @partial(jax.jit, static_argnames=())
        def _logprobs(params, ids):
            logits, _ = model_forward(spec, params, ids)
            return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

        self._logprobs = _logprobs

    def _encode(self, s: str) -> list[int]:
        ids = self.tok(s).input_ids if callable(self.tok) else self.tok.encode(s)
        # strip a leading BOS if the tokenizer adds one mid-sequence
        return list(ids)

    def _encode_pair(self, ctx: str, cont: str):
        """(reference: models_utils.py:208-221): tokenize whole=ctx+cont and
        split at len(tok(ctx)) so merged-boundary tokens go to the
        continuation."""
        n_spaces = len(cont) - len(cont.lstrip())
        if n_spaces:
            ctx = ctx + cont[:n_spaces]
            cont = cont[n_spaces:]
        whole = self._encode(ctx + cont)
        ctx_enc = self._encode(ctx)
        cont_enc = whole[len(ctx_enc):]
        if not cont_enc:  # merged entirely; fall back to direct encoding
            cont_enc = self._encode(cont)
            ctx_enc = whole[: len(whole) - len(cont_enc)]
        return ctx_enc, cont_enc

    def loglikelihood(self, pairs: list[tuple[str, str]]) -> list[tuple[float, bool]]:
        prepared = []
        for i, (ctx, cont) in enumerate(pairs):
            if ctx == "":
                ctx_enc, cont_enc = [self.eot], self._encode(cont)
            else:
                ctx_enc, cont_enc = self._encode_pair(ctx, cont)
            prepared.append((i, ctx_enc, cont_enc))

        # sort by total length descending (reference Reorderer,
        # models_utils.py:244-268) so batches share bucket shapes
        order = sorted(range(len(prepared)),
                       key=lambda j: -(len(prepared[j][1]) + len(prepared[j][2])))
        results: list = [None] * len(prepared)

        for start in range(0, len(order), self.batch_size):
            chunk = [prepared[j] for j in order[start : start + self.batch_size]]
            inps, cont_lens, tot_lens = [], [], []
            for _, ctx_enc, cont_enc in chunk:
                seq = (ctx_enc + cont_enc)[-(self.max_length + 1):]
                inp = seq[:-1]
                inps.append(inp)
                cont_lens.append(len(cont_enc))
                tot_lens.append(len(inp))
            L = _bucket(max(tot_lens))
            batch = np.zeros((len(chunk), L), dtype=np.int32)
            for r, inp in enumerate(inps):
                batch[r, : len(inp)] = inp
            lp = np.asarray(self._logprobs(self.params, jnp.asarray(batch)))

            for r, (j, ctx_enc, cont_enc) in enumerate(chunk):
                n_cont = cont_lens[r]
                n_tot = tot_lens[r]
                # positions predicting the continuation tokens
                pos = np.arange(n_tot - n_cont, n_tot)
                tgt = np.asarray((ctx_enc + cont_enc)[-(self.max_length + 1):][1:])
                token_lp = lp[r, pos, tgt[pos]]
                greedy = bool((np.argmax(lp[r, pos], axis=-1) == tgt[pos]).all())
                results[j] = (float(token_lp.sum()), greedy)
        return results
