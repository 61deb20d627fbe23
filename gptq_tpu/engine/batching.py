"""Continuous batching decode engine.

Beyond-reference capability (the reference serves batch 1 only —
Quant3Linear.forward raises on multi-token input, quant.py:203): a fixed
pool of batch slots decodes in lock-step while finished slots are refilled
with queued prompts, keeping the chip's weight-streaming amortized across
requests. Per-slot cache offsets ride the vmapped dynamic_update_slice in
models.common.block_forward.
"""

from __future__ import annotations

import functools

from dataclasses import dataclass, field
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from gptq_tpu.models.common import (
    ArchSpec,
    NEG_INF,
    block_forward,
    embed_forward,
    head_forward,
)


@dataclass
class Request:
    uid: int
    prompt: np.ndarray  # (T,) token ids
    max_new_tokens: int
    eos_id: int | None = None
    output: list = field(default_factory=list)
    done: bool = False


def _decode_fns(spec: ArchSpec):
    """Deferred-write lock-step decode: single step + windowed scan.
    The GPTQ_TPU_DONATE gate is resolved here so it participates in the
    trace-cache key (see _decode_fns_cached)."""
    import os

    donate_on = (jax.default_backend() == "tpu"
                 and os.environ.get("GPTQ_TPU_DONATE", "1") != "0")
    return _decode_fns_cached(spec, donate_on)


@functools.lru_cache(maxsize=None)
def _decode_fns_cached(spec: ArchSpec, donate_on: bool):
    """Deferred-write lock-step decode: single step + windowed scan.

    Cached per (frozen, hashable) spec: every ContinuousBatcher used to
    build fresh jit wrappers, so each batcher instance re-TRACED the
    32-layer window program (~seconds per trace on a 1-core host even
    when the XLA compile itself hits the persistent cache) — a serving
    benchmark constructing one batcher per repetition paid that tax
    three times over.

    Each step attends slots strictly below the slot's filled length plus
    the token's own k/v (the deferred-cache-write path of
    models.common.block_forward), then writes ALL layers' fresh rows with
    ONE per-slot scatter into the (L, B, S, kvh, hd) stack. The per-layer
    read-modify-write this replaces defeated XLA's in-place analysis and
    copied the whole cache every step (chip: 5.8 ms/step write chain at
    b32 S=256, experiments/r4_batch_decomp.py).

    The window variant runs `n` lock-steps in one on-device lax.scan and
    returns the (n, B) token matrix — ONE host round-trip per n tokens,
    so continuous batching runs at chip rate on a relayed device (~30 ms
    RTT per dispatch). Lengths advance for every slot each step (idle /
    just-finished slots decode junk into their own rows until the host
    refills them; junk is never read — a slot's attention covers only
    positions below its own length, each rewritten before it is read)."""

    from gptq_tpu.models.common import (
        _quantize_kv,
        alibi_slopes,
        rope_tables,
    )

    def body(params, kc, vc, ks, vs, tokens, lengths):
        # tokens/lengths: (B,); kc/vc: (L, B, S, kvh, hd);
        # ks/vs: int8-cache scale planes (L, B, S, kvh) or None
        B = tokens.shape[0]
        S = kc.shape[2]
        positions = lengths[:, None]  # (B, 1)
        h = embed_forward(spec, params, tokens[:, None], positions)
        k_pos = jnp.arange(S)[None, None, None, :]
        q_pos = lengths[:, None, None, None]
        valid = k_pos < q_pos  # STRICT: the fresh pair merges separately
        mask = jnp.where(valid, 0.0, NEG_INF).astype(jnp.float32)
        if spec.pos == "alibi":
            slopes = jnp.asarray(alibi_slopes(spec.n_heads))
            rel = (k_pos - q_pos).astype(jnp.float32)
            mask = mask + jnp.where(valid, slopes[None, :, None, None] * rel,
                                    0.0)
        rope = rope_tables(spec, positions) if spec.pos == "rope" else None
        fresh = []
        for i, bp in enumerate(params["layers"]):
            layer_cache = (kc[i], vc[i],
                           None if ks is None else ks[i],
                           None if vs is None else vs[i])
            h, new_kv, _ = block_forward(
                spec, bp, h, positions=positions, mask=mask,
                cache=layer_cache, cache_len=lengths, rope=rope,
                defer_write=True, full_cache=(kc, vc, ks, vs, i),
            )
            fresh.append(new_kv)
        fk = jnp.stack([f[0] for f in fresh])  # (L, B, 1, kvh, hd)
        fv = jnp.stack([f[1] for f in fresh])
        b_idx = jnp.arange(B)
        if ks is not None:
            kq, ksn = jax.vmap(_quantize_kv)(fk)
            vq, vsn = jax.vmap(_quantize_kv)(fv)
            kc = kc.at[:, b_idx, lengths].set(kq[:, :, 0])
            vc = vc.at[:, b_idx, lengths].set(vq[:, :, 0])
            ks = ks.at[:, b_idx, lengths].set(ksn[:, :, 0])
            vs = vs.at[:, b_idx, lengths].set(vsn[:, :, 0])
        else:
            kc = kc.at[:, b_idx, lengths].set(fk[:, :, 0].astype(kc.dtype))
            vc = vc.at[:, b_idx, lengths].set(fv[:, :, 0].astype(vc.dtype))
        logits = head_forward(spec, params, h)[:, 0]
        next_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        # clamp: slots decoding junk past a finished request must not
        # scatter out of bounds (their rows rewrite in place at S-1, which
        # no reader ever covers — q_pos tops out at S-1 so reads stay < S-1)
        lengths = jnp.minimum(lengths + 1, S - 1)
        return kc, vc, ks, vs, next_tok, lengths, logits

    # donation aliases the cache stacks across the jit boundary (no 4 GB
    # copy per call); CPU (tests) does not implement donation and warns.
    # GPTQ_TPU_DONATE=0 disables it (resolved by the _decode_fns wrapper
    # so it keys the cache): the un-donated variant pays one cache copy
    # per window call (~0.3 ms/token at window 16, bf16) but its program
    # has been observed to matter to the flaky relay compile helper.
    donate = (1, 2, 3, 4) if donate_on else ()

    @partial(jax.jit, donate_argnums=donate)
    def step(params, kc, vc, ks, vs, tokens, lengths):
        return body(params, kc, vc, ks, vs, tokens, lengths)

    @partial(jax.jit, static_argnames=("n",), donate_argnums=donate)
    def window(params, kc, vc, ks, vs, tokens, lengths, *, n):
        def s(carry, _):
            kc, vc, ks, vs, tokens, lengths = carry
            kc, vc, ks, vs, tok, lengths, _ = body(
                params, kc, vc, ks, vs, tokens, lengths)
            return (kc, vc, ks, vs, tok, lengths), tok

        (kc, vc, ks, vs, tokens, lengths), toks = jax.lax.scan(
            s, (kc, vc, ks, vs, tokens, lengths), None, length=n)
        return kc, vc, ks, vs, tokens, lengths, toks

    return step, window


@functools.lru_cache(maxsize=None)
def _prefill_fn(spec: ArchSpec):
    @partial(jax.jit, static_argnames=())
    def prefill(params, kc_slot, vc_slot, ks_slot, vs_slot, ids):
        # kc_slot: (L, 1, S, H, hd); ids: (1, T)
        T = ids.shape[1]
        S = kc_slot.shape[2]
        positions = jnp.arange(T)[None]
        k_pos = jnp.arange(S)[None, :]
        q_pos = jnp.arange(T)[:, None]
        mask = jnp.where(k_pos[None, None] <= q_pos[None, None], 0.0, NEG_INF)
        mask = mask.astype(jnp.float32)
        if spec.pos == "alibi":
            from gptq_tpu.models.common import alibi_slopes

            slopes = jnp.asarray(alibi_slopes(spec.n_heads))
            rel = (k_pos - q_pos).astype(jnp.float32)
            bias = slopes[None, :, None, None] * rel[None, None]
            mask = mask + jnp.where((k_pos <= q_pos)[None, None], bias, 0.0)
        h = embed_forward(spec, params, ids, positions)
        new_k, new_v, new_ks, new_vs = [], [], [], []
        zero = jnp.zeros((), jnp.int32)
        for i, bp in enumerate(params["layers"]):
            layer_cache = ((kc_slot[i], vc_slot[i]) if ks_slot is None else
                           (kc_slot[i], vc_slot[i], ks_slot[i], vs_slot[i]))
            h, kv, _ = block_forward(
                spec, bp, h, positions=positions, mask=mask,
                cache=layer_cache, cache_len=zero,
            )
            new_k.append(kv[0])
            new_v.append(kv[1])
            if len(kv) == 4:
                new_ks.append(kv[2])
                new_vs.append(kv[3])
        logits = head_forward(spec, params, h)[:, -1]
        return (jnp.stack(new_k), jnp.stack(new_v),
                jnp.stack(new_ks) if new_ks else None,
                jnp.stack(new_vs) if new_vs else None,
                jnp.argmax(logits, -1).astype(jnp.int32))

    return prefill


class ContinuousBatcher:
    def __init__(self, spec: ArchSpec, params: dict, batch_slots: int = 8,
                 max_len: int = 2048, cache_dtype=jnp.bfloat16,
                 prefill_buckets=(32, 64, 128, 256, 512, 1024),
                 mesh=None, prefill_group: int | None = None):
        """mesh: optional jax Mesh with a "dp" axis — the slot (request)
        dimension of the KV cache and token state shards across it, so one
        lock-step decode serves batch_slots requests data-parallel across
        chips/hosts (weights replicate over dp; combine with the "tp" axis
        via parallel.mesh.shard_params for tensor parallelism). GSPMD
        partitions the jitted step; the batch-level DCN communication
        pattern of SURVEY.md §2.3."""
        self.spec = spec
        self.params = params
        self.B = batch_slots
        self.S = max_len
        shape = (spec.n_layers, batch_slots, max_len, spec.kv_heads, spec.hd)
        self.kc = jnp.zeros(shape, cache_dtype)
        self.vc = jnp.zeros(shape, cache_dtype)
        # int8 cache: dynamic per-token-head scale planes ride alongside
        self.ks = self.vs = None
        if cache_dtype == jnp.int8:
            self.ks = jnp.zeros(shape[:-1], jnp.float32)
            self.vs = jnp.zeros(shape[:-1], jnp.float32)
        self.lengths = jnp.zeros((batch_slots,), jnp.int32)
        self.tokens = jnp.zeros((batch_slots,), jnp.int32)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            dp = mesh.shape.get("dp", 1)
            if batch_slots % max(1, dp):
                raise ValueError(
                    f"dp={dp} must divide batch_slots={batch_slots}")
            slot_sh = NamedSharding(mesh, P(None, "dp"))
            vec_sh = NamedSharding(mesh, P("dp"))
            self.kc = jax.device_put(self.kc, slot_sh)
            self.vc = jax.device_put(self.vc, slot_sh)
            if self.ks is not None:
                self.ks = jax.device_put(self.ks, slot_sh)
                self.vs = jax.device_put(self.vs, slot_sh)
            self.lengths = jax.device_put(self.lengths, vec_sh)
            self.tokens = jax.device_put(self.tokens, vec_sh)
        self.slot_req: list[Request | None] = [None] * batch_slots
        self.queue: list[Request] = []
        self.finished: list[Request] = []
        self._step, self._window = _decode_fns(spec)
        self._prefill = _prefill_fn(spec)
        self._buckets = prefill_buckets
        # cap on batched-prefill rows per dispatch: oversized groups
        # split into chunks of this many rows (the relay compile helper
        # crashes on the 32-row 7B prefill program while 16 rows compile
        # reliably, 2026-08-20 bisect; two dispatches cost one extra
        # ~30 ms round-trip per wave)
        self._prefill_group = prefill_group or batch_slots
        self._uid = 0
        self.prefill_calls = 0  # dispatch counter (batched-refill tests)

    def submit(self, prompt: np.ndarray, max_new_tokens: int = 64,
               eos_id: int | None = None) -> int:
        prompt = np.asarray(prompt).reshape(-1)
        if len(prompt) + max_new_tokens > self.S:
            raise ValueError(
                f"prompt ({len(prompt)} tokens) + max_new_tokens "
                f"({max_new_tokens}) exceeds the cache max_len ({self.S})")
        self._uid += 1
        self.queue.append(Request(self._uid, prompt, max_new_tokens, eos_id))
        return self._uid

    def _bucket(self, n: int) -> int:
        for b in self._buckets:
            if n <= b:
                return b
        return self.S

    def _fill_slots(self) -> None:
        """Refill every free slot, batching the prefill: prompts sharing a
        length bucket stack into ONE `_prefill` dispatch (the per-slot loop
        cost one ~30 ms dispatch round-trip per freed slot; refilling all 8
        slots of a churning pool serially wasted ~a quarter second per
        wave). prefill_calls counts dispatches for the throughput test."""
        assign: list[tuple[int, Request]] = []
        for slot in range(self.B):
            if self.slot_req[slot] is not None or not self.queue:
                continue
            assign.append((slot, self.queue.pop(0)))
        if not assign:
            return
        by_bucket: dict[int, list[tuple[int, Request]]] = {}
        for slot, req in assign:
            by_bucket.setdefault(self._bucket(len(req.prompt)), []).append(
                (slot, req))
        cap = self._prefill_group
        chunks = [(Tp, full_group[g0:g0 + cap])
                  for Tp, full_group in by_bucket.items()
                  for g0 in range(0, len(full_group), cap)]
        for Tp, group in chunks:
            # pad the group to a power-of-two row count so the jitted
            # prefill compiles at most log2(batch_slots)+1 shapes per
            # bucket (each compile is ~minutes on a relayed chip — far
            # more than the 30 ms dispatch the batching saves). Pad rows
            # re-gather slot 0 (reads tolerate duplicates); only the real
            # rows scatter back.
            n_real = len(group)
            gp = 1
            while gp < n_real:
                gp *= 2
            gp = min(gp, self.B, cap)
            slots = np.asarray([s for s, _ in group]
                               + [group[0][0]] * (gp - n_real))
            ids = np.zeros((gp, Tp), np.int32)
            for row, (_, req) in enumerate(group):
                ids[row, : len(req.prompt)] = req.prompt
            kc_g = self.kc[:, slots]
            vc_g = self.vc[:, slots]
            ks_g = None if self.ks is None else self.ks[:, slots]
            vs_g = None if self.vs is None else self.vs[:, slots]
            nk, nv, nks, nvs, _ = self._prefill(
                self.params, kc_g, vc_g, ks_g, vs_g, jnp.asarray(ids))
            self.prefill_calls += 1
            real = slots[:n_real]
            self.kc = self.kc.at[:, real].set(nk[:, :n_real])
            self.vc = self.vc.at[:, real].set(nv[:, :n_real])
            if nks is not None:
                self.ks = self.ks.at[:, real].set(nks[:, :n_real])
                self.vs = self.vs.at[:, real].set(nvs[:, :n_real])
            # re-decode from each true prompt end (padding wrote junk
            # beyond T, but lengths masks it out). ONE batched state
            # update per group — per-slot .at[] calls cost a ~30 ms relay
            # dispatch each
            sl = jnp.asarray([s for s, _ in group])
            self.lengths = self.lengths.at[sl].set(jnp.asarray(
                [len(req.prompt) - 1 for _, req in group], jnp.int32))
            self.tokens = self.tokens.at[sl].set(jnp.asarray(
                [int(req.prompt[-1]) for _, req in group], jnp.int32))
            for slot, req in group:
                self.slot_req[slot] = req

    def step(self) -> None:
        (self.kc, self.vc, self.ks, self.vs, next_tok, self.lengths,
         _) = self._step(self.params, self.kc, self.vc, self.ks, self.vs,
                         self.tokens, self.lengths)
        self.tokens = next_tok
        self._harvest(np.asarray(next_tok)[None])

    def _harvest(self, tok_rows: np.ndarray) -> None:
        """Fold (n_steps, B) generated tokens into the per-request outputs;
        retire requests at eos/max_new_tokens (later window rows for a
        retired slot are the junk the lock-step kept decoding — dropped).
        Freed slots reset lengths in ONE batched update."""
        freed: list[int] = []
        for row in tok_rows:
            for slot, req in enumerate(self.slot_req):
                if req is None:
                    continue
                t = int(row[slot])
                req.output.append(t)
                if (req.eos_id is not None and t == req.eos_id) or (
                    len(req.output) >= req.max_new_tokens
                ):
                    req.done = True
                    self.finished.append(req)
                    self.slot_req[slot] = None
                    freed.append(slot)
        if freed:
            self.lengths = self.lengths.at[jnp.asarray(freed)].set(0)

    def run(self, progress: Callable[[int, int], None] | None = None,
            window: int = 1) -> list[Request]:
        """Drain the queue. window > 1 runs that many lock-steps per host
        round-trip (one on-device lax.scan + one token fetch): slots
        refill only on window boundaries and a request finishing
        mid-window idles its slot until the boundary — the standard
        lock-step amortization; outputs are identical to window=1
        (greedy argmax per slot depends only on that slot's own cache)."""
        while self.queue or any(r is not None for r in self.slot_req):
            self._fill_slots()
            if window == 1:
                self.step()
            else:
                (self.kc, self.vc, self.ks, self.vs, self.tokens,
                 self.lengths, toks) = self._window(
                     self.params, self.kc, self.vc, self.ks, self.vs,
                     self.tokens, self.lengths, n=window)
                self._harvest(np.asarray(toks))
            if progress:
                progress(len(self.finished), len(self.queue))
        out = sorted(self.finished, key=lambda r: r.uid)
        self.finished = []
        return out
