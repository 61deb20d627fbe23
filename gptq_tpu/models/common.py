"""Shared functional decoder core.

Replaces the reference's four copy-pasted HF drivers (reference: opt.py,
bloom.py, llama.py, gemma.py) with one parameterized block function. Params
are plain nested dicts (pytrees); a "linear" is {"w": (out,in) [, "b"]} and
`linear_apply` transparently serves PackedWeight low-bit weights through the
fused dequant kernels, the TPU counterpart of make_quant3's module swap
(reference: quant.py:205-216).

Every block forward can also return the calibration captures — the inputs
seen by each linear — which replaces torch forward hooks
(reference: opt.py:177-187) in the functional setting.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gptq_tpu.ops.bcq_matmul import bcq_matmul
from gptq_tpu.ops.pack import PackedWeight
from gptq_tpu.ops.qmatmul import StagedWeight, dequant_matmul, resident_matmul

NEG_INF = -1e9


@dataclass(frozen=True)
class ArchSpec:
    """Static architecture description (derived from an HF config)."""

    arch: str  # opt | bloom | llama | gemma
    n_layers: int
    hidden: int
    n_heads: int
    ffn: int
    vocab: int
    max_pos: int
    n_kv_heads: int = -1  # -1 -> = n_heads
    head_dim: int = -1  # -1 -> hidden // n_heads
    norm_eps: float = 1e-5
    act: str = "relu"  # relu | gelu | silu | gelu_tanh
    pos: str = "learned"  # learned | alibi | rope
    rope_theta: float = 10000.0
    norm_type: str = "layernorm"  # layernorm | rmsnorm | rmsnorm1p
    qk_scale: float = -1.0  # -1 -> 1/sqrt(head_dim)
    embed_scale: float = 1.0  # gemma scales embeddings by sqrt(hidden)
    do_layer_norm_before: bool = True  # OPT variant flag
    tie_embeddings: bool = False
    linear_bias: bool = True  # per-block linears have bias terms
    # projections between embed dim and hidden (OPT project_in/out)
    word_embed_dim: int = -1  # -1 -> = hidden
    # mixture-of-experts (Mixtral-style routed GLU FFN; llama-family only).
    # 0 = dense FFN. See models/moe.py for the dispatch formulation.
    n_experts: int = 0
    expert_top_k: int = 2
    expert_capacity: float = 1.25  # capacity factor (static per-expert slots)

    @property
    def kv_heads(self) -> int:
        return self.n_kv_heads if self.n_kv_heads > 0 else self.n_heads

    @property
    def hd(self) -> int:
        return self.head_dim if self.head_dim > 0 else self.hidden // self.n_heads

    @property
    def scale(self) -> float:
        return self.qk_scale if self.qk_scale > 0 else 1.0 / float(np.sqrt(self.hd))


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def linear_apply(lin: dict, x: jax.Array) -> jax.Array:
    aq = lin.get("act_q")
    if aq is not None:
        # activation quantization (reference ActQuantWrapper,
        # zeroShot/models/quant.py:127-141): per-feature grid on the input
        q = jnp.clip(jnp.round(x / aq["scale"]) + aq["zero"], 0, aq["maxq"])
        x = (aq["scale"] * (q - aq["zero"])).astype(x.dtype)
    w = lin["w"]
    if isinstance(w, PackedWeight):
        flags = lin.get("serve")
        a8 = bool(flags and flags.a8)
        if w.fmt == "bcq":
            y = bcq_matmul(x, w, a8=a8)
        else:
            y = dequant_matmul(x, w, a8=a8)
        # PackedWeight carries its own bias when packed with one; a separate
        # "b" entry (from the original linear) still applies.
    elif isinstance(w, StagedWeight):
        # resident-s4 serving mode (stage_serving): XLA-native signed
        # codes, plain dots the compiler schedules freely
        flags = lin.get("serve")
        y = resident_matmul(x, w, a8=bool(flags and flags.a8))
    else:
        y = jnp.einsum("...k,nk->...n", x, w)
    if lin.get("b") is not None:
        y = y + lin["b"]
    return y


def norm_apply(spec: ArchSpec, p: dict, x: jax.Array) -> jax.Array:
    x32 = x.astype(jnp.float32)
    if spec.norm_type == "layernorm":
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.var(x32, axis=-1, keepdims=True)
        y = (x32 - mu) * jax.lax.rsqrt(var + spec.norm_eps)
        y = y * p["w"] + p["b"]
    else:
        var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
        y = x32 * jax.lax.rsqrt(var + spec.norm_eps)
        w = p["w"].astype(jnp.float32)
        y = y * (1.0 + w) if spec.norm_type == "rmsnorm1p" else y * w
    return y.astype(x.dtype)


def activation(spec: ArchSpec, x: jax.Array) -> jax.Array:
    if spec.act == "relu":
        return jax.nn.relu(x)
    if spec.act == "gelu":
        return jax.nn.gelu(x, approximate=False)
    if spec.act == "gelu_tanh":
        return jax.nn.gelu(x, approximate=True)
    return jax.nn.silu(x)


def rope_tables(spec: ArchSpec, positions: jax.Array) -> tuple[jax.Array, jax.Array]:
    """positions: (B, T) -> cos/sin (B, T, hd)."""
    hd = spec.hd
    inv_freq = 1.0 / (spec.rope_theta ** (jnp.arange(0, hd, 2, dtype=jnp.float32) / hd))
    ang = positions[..., None].astype(jnp.float32) * inv_freq  # (B, T, hd/2)
    ang = jnp.concatenate([ang, ang], axis=-1)
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: (B, T, H, hd); HF 'rotate_half' convention
    (reference checkpoint converter permutes accordingly,
    script/convert_llama_weights_to_hf.py:134)."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rot = jnp.concatenate([-x2, x1], axis=-1)
    return x * cos[:, :, None, :] + rot * sin[:, :, None, :]


def alibi_slopes(n_heads: int) -> np.ndarray:
    """BLOOM alibi slopes (HF formula)."""
    closest = 2 ** int(np.floor(np.log2(n_heads)))
    base = 2.0 ** (-(2.0 ** -(np.log2(closest) - 3)))
    slopes = base ** np.arange(1, closest + 1)
    if closest != n_heads:
        extra_base = 2.0 ** (-(2.0 ** -(np.log2(2 * closest) - 3)))
        extra = extra_base ** np.arange(1, 2 * (n_heads - closest) + 1, 2)
        slopes = np.concatenate([slopes, extra])
    return slopes.astype(np.float32)


class KVCache(NamedTuple):
    """Per-layer preallocated cache; `length` is the filled prefix.

    With dtype=int8 the cache stores dynamically quantized keys/values
    (per-token, per-head absmax scales in k_scale/v_scale) — half the
    HBM footprint and stream bandwidth of bf16, a serving capability the
    reference has no counterpart for (its cache is torch fp16)."""

    k: jax.Array  # (L, B, max_len, kv_heads, hd)
    v: jax.Array
    length: jax.Array  # scalar int32
    k_scale: Optional[jax.Array] = None  # (L, B, max_len, kv_heads) f32
    v_scale: Optional[jax.Array] = None

    @staticmethod
    def init(spec: ArchSpec, batch: int, max_len: int, dtype=jnp.bfloat16) -> "KVCache":
        shape = (spec.n_layers, batch, max_len, spec.kv_heads, spec.hd)
        scales = None
        if dtype == jnp.int8:
            scales = jnp.zeros(shape[:-1], jnp.float32)
        return KVCache(
            k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype),
            length=jnp.zeros((), jnp.int32),
            k_scale=scales, v_scale=scales,
        )


def _quantize_kv(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(B, T, H, hd) -> int8 values + (B, T, H) per-token-head scales."""
    xf = x.astype(jnp.float32)
    s = jnp.max(jnp.abs(xf), axis=-1) / 127.0 + 1e-12
    q = jnp.clip(jnp.round(xf / s[..., None]), -127, 127).astype(jnp.int8)
    return q, s


# ---------------------------------------------------------------------------
# attention
# ---------------------------------------------------------------------------

def attention(
    spec: ArchSpec,
    q: jax.Array,  # (B, T, n_heads, hd)
    k: jax.Array,  # (B, S, kv_heads, hd)
    v: jax.Array,
    mask: jax.Array,  # (B, 1, T, S) additive bias (0 / -inf, + alibi)
    plain_causal: bool = False,
) -> jax.Array:
    """Contract: `plain_causal=True` asserts that `mask` is EXACTLY the
    causal mask for T==S (no cache offset, no padding, no alibi) — the
    flash-attention fast path then ignores `mask` and applies causality
    internally. Callers passing any other mask must pass
    plain_causal=False or attention is silently wrong."""
    B, T, H, hd = q.shape
    kvh = k.shape[2]
    if kvh != H:
        rep = H // kvh
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    if (plain_causal and T == k.shape[1] and T >= 512 and T % 128 == 0
            and hd % 128 == 0 and jax.default_backend() == "tpu"):
        # prefill at scale: the einsum path materializes (H, T, S) f32
        # scores (537 MB/layer at T=2048, llama-7B); blocked online-softmax
        # flash attention keeps them in VMEM tiles
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            flash_attention)

        out = flash_attention(
            q.transpose(0, 2, 1, 3),
            k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3),
            causal=True, sm_scale=float(spec.scale),
        )
        return out.transpose(0, 2, 1, 3).reshape(B, T, H * hd).astype(q.dtype)
    qf = q.astype(jnp.float32) * spec.scale
    scores = jnp.einsum("bthd,bshd->bhts", qf, k.astype(jnp.float32))
    scores = scores + mask
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhts,bshd->bthd", probs, v.astype(jnp.float32))
    return out.reshape(B, T, H * hd).astype(q.dtype)


def _attention_with_self(spec: ArchSpec, q, k_all, v_all, mask,
                         k_new, v_new) -> jax.Array:
    """Decode attention over existing cache slots PLUS the current
    token's own (not yet written) k/v, merged exactly as one appended
    softmax column — the deferred-cache-write path. q/k_new/v_new:
    (B, 1, H|kvh, hd); mask: (*, *, 1, S) additive with NEG_INF beyond
    the filled prefix (alibi folded in by the caller; the self column's
    alibi bias is slope*0 = 0)."""
    B, T, H, hd = q.shape
    kvh = k_all.shape[2]
    if kvh != H:
        rep = H // kvh
        k_all = jnp.repeat(k_all, rep, axis=2)
        v_all = jnp.repeat(v_all, rep, axis=2)
        k_new = jnp.repeat(k_new, rep, axis=2)
        v_new = jnp.repeat(v_new, rep, axis=2)
    qf = q.astype(jnp.float32) * spec.scale
    sc = jnp.einsum("bthd,bshd->bhts", qf, k_all.astype(jnp.float32))
    sc = sc + mask
    s_self = jnp.sum(qf * k_new.astype(jnp.float32), axis=-1)  # (B, 1, H)
    s_self = s_self.transpose(0, 2, 1)[..., None]  # (B, H, 1, 1)
    full = jnp.concatenate([sc, s_self], axis=-1)
    p = jax.nn.softmax(full, axis=-1)
    out = jnp.einsum("bhts,bshd->bthd", p[..., :-1],
                     v_all.astype(jnp.float32))
    out = out + p[..., -1:].transpose(0, 2, 1, 3) * v_new.astype(jnp.float32)
    return out.reshape(B, T, H * hd).astype(q.dtype)


def causal_mask(T: int, S: int, dtype=jnp.float32) -> jax.Array:
    """(1, 1, T, S) additive mask; queries are the last T of S positions."""
    q_pos = jnp.arange(T)[:, None] + (S - T)
    k_pos = jnp.arange(S)[None, :]
    m = jnp.where(k_pos <= q_pos, 0.0, NEG_INF).astype(dtype)
    return m[None, None]


def _local_slopes(spec: ArchSpec, tp_axis: Optional[str],
                  tp_size: int = 1) -> jax.Array:
    """Alibi slopes for this shard's heads (the full set without tp). The
    slope formula needs the GLOBAL head count; this shard's contiguous
    block of n_heads/tp slopes is sliced out by axis index."""
    slopes = jnp.asarray(alibi_slopes(spec.n_heads))  # (H_global,)
    if tp_axis is None or tp_size == 1:
        return slopes
    lh = spec.n_heads // tp_size
    return jax.lax.dynamic_slice_in_dim(
        slopes, jax.lax.axis_index(tp_axis) * lh, lh)


def alibi_bias(spec: ArchSpec, T: int, S: int,
               tp_axis: Optional[str] = None, tp_size: int = 1) -> jax.Array:
    """(1, H, T, S) BLOOM alibi additive bias (HF convention: slope * key_pos
    relative offsets). Under tensor parallelism H is this shard's heads."""
    slopes = _local_slopes(spec, tp_axis, tp_size)
    k_pos = jnp.arange(S, dtype=jnp.float32)[None, :]
    q_pos = jnp.arange(T, dtype=jnp.float32)[:, None] + (S - T)
    rel = k_pos - q_pos  # <= 0 on/below diagonal
    bias = slopes[:, None, None] * rel[None]
    return bias[None]


# ---------------------------------------------------------------------------
# block forward (all archs)
# ---------------------------------------------------------------------------

@jax.tree_util.register_static
@dataclass(frozen=True)
class ServeFlags:
    """Static serving-mode flags on a linear (kept out of the jit pytree).

    a8: dynamic int8 activation quantization (--faster-kernel path).
    vocab_tp: the lm_head is vocab-sharded over the tp axis inside
    shard_map; logits all-gather after the local matmul."""

    a8: bool = False
    vocab_tp: bool = False


@jax.tree_util.register_static
@dataclass(frozen=True)
class FusedSplits:
    """Static (n_stored, n_logical) column extents of each part inside a
    fused weight — kept out of the jit pytree so slicing stays static."""

    parts: tuple


def same_actq(a, b) -> bool:
    """Elementwise equality of two activation-quantizer param dicts (both
    None counts as equal). Fusion paths (fuse_serving here, try_fuse_tp in
    parallel/tp.py) apply part 0's quantizer to the whole fused entry, so
    they must verify the parts' quantizers genuinely coincide first."""
    if a is None or b is None:
        return a is None and b is None
    return (a["maxq"] == b["maxq"]
            and bool(jnp.all(a["scale"] == b["scale"]))
            and bool(jnp.all(a["zero"] == b["zero"])))


def fuse_serving(spec: ArchSpec, params: dict, a8: bool = False) -> dict:
    """Serving-time weight fusion: merge q/k/v (and llama-family gate/up)
    PackedWeights that share one input into single wider weights — one
    fused dequant-matmul launch instead of three (see ops/pack.fuse_packed).
    Leaves layers untouched where the parts are not fusable (mixed
    precision, dense weights, differing act-order perms).

    a8=True additionally marks every packed uniform linear for dynamic
    int8 activation quantization — the fast serving path (reference
    --faster-kernel counterpart)."""
    from gptq_tpu.ops.pack import fuse_packed

    _same_actq = same_actq

    def try_fuse(lp, names, key):
        lins = [lp.get(n) for n in names]
        if any(l is None or not isinstance(l.get("w"), PackedWeight)
               for l in lins):
            return
        # activation quantizers (pipeline.add_actquant) must survive fusion:
        # the parts share one input, so their act_q params coincide — carry
        # the shared params onto the fused entry; if they ever differ
        # (shouldn't happen), skip fusion rather than silently dropping them
        act_qs = [l.get("act_q") for l in lins]
        if not all(_same_actq(act_qs[0], aq) for aq in act_qs[1:]):
            return
        fused = fuse_packed([l["w"] for l in lins])
        if fused is None:
            return
        lp[key] = {
            "w": fused,
            "act_q": act_qs[0],
            "splits": FusedSplits(
                tuple((l["w"].Np, l["w"].N) for l in lins)),
            "b_parts": [l.get("b") for l in lins],
        }
        for n in names:
            del lp[n]

    new_layers = []
    for lp in params["layers"]:
        lp = dict(lp)
        if spec.arch != "bloom":
            try_fuse(lp, ("q", "k", "v"), "qkv_fused")
        if spec.arch in ("llama", "gemma"):
            try_fuse(lp, ("gate", "up"), "gateup_fused")
        if a8:
            for key, val in lp.items():
                w = val.get("w") if isinstance(val, dict) else None
                if isinstance(w, (PackedWeight, StagedWeight)):
                    lp[key] = {**val, "serve": ServeFlags(a8=True)}
        new_layers.append(lp)
    out = {**params, "layers": new_layers}
    lm = params.get("lm_head")
    if (a8 and lm is not None
            and isinstance(lm.get("w"), (PackedWeight, StagedWeight))):
        out["lm_head"] = {**lm, "serve": ServeFlags(a8=True)}
    return out


def stage_serving(spec: ArchSpec, params: dict) -> dict:
    """Convert every uniform-grid PackedWeight to a resident StagedWeight
    (ops/qmatmul.stage_weight): the ALTERNATIVE serving mode — XLA-native
    s4 codes staged once at load, every matmul a plain dot the compiler
    schedules/fuses freely (no Pallas custom calls; the fused-kernel gates
    all see non-PackedWeight entries and stand down). Same HBM bits.

    Call AFTER fuse_serving so the q/k/v and gate/up fusions stage as
    single wide dots. Chip A/B vs the fused-kernel mode:
    experiments/r4_resident_ab.py."""
    from gptq_tpu.ops.qmatmul import stage_weight

    def stage_entry(val):
        if not isinstance(val, dict):
            return val
        w = val.get("w")
        if isinstance(w, PackedWeight) and w.fmt == "uniform":
            return {**val, "w": stage_weight(w)}
        return val

    new_layers = []
    for lp in params["layers"]:
        new_layers.append({k: stage_entry(v) for k, v in lp.items()})
    out = {**params, "layers": new_layers}
    if params.get("lm_head") is not None:
        out["lm_head"] = stage_entry(params["lm_head"])
    return out


def _apply_fused(entry: dict, x: jax.Array) -> list[jax.Array]:
    """Run a fused linear and slice the logical columns back out per part
    (each part's stored block is its logical columns followed by exact-zero
    pad columns)."""
    y = linear_apply({"w": entry["w"], "b": None, "act_q": entry.get("act_q"),
                      "serve": entry.get("serve")}, x)
    outs = []
    off = 0
    for (n_stored, n_logical), bias in zip(entry["splits"].parts,
                                           entry["b_parts"]):
        part = y[..., off:off + n_logical]
        if bias is not None:
            part = part + bias
        outs.append(part)
        off += n_stored
    return outs


def _qkv(spec: ArchSpec, p: dict, x: jax.Array, captures: Optional[dict]):
    """Head counts derive from the projection widths, not the spec, so the
    same code runs on tensor-parallel local shards (H_local = H / tp)."""
    B, T, _ = x.shape
    hd = spec.hd
    if "qkv_fused" in p:
        q, k, v = _apply_fused(p["qkv_fused"], x)
        return (q.reshape(B, T, q.shape[-1] // hd, hd),
                k.reshape(B, T, k.shape[-1] // hd, hd),
                v.reshape(B, T, v.shape[-1] // hd, hd))
    if spec.arch == "bloom":
        fused = linear_apply(p["qkv"], x)
        if captures is not None:
            captures["self_attention.query_key_value"] = x
        fused = fused.reshape(B, T, fused.shape[-1] // (3 * hd), 3 * hd)
        q, k, v = jnp.split(fused, 3, axis=-1)
    else:
        if captures is not None:
            # q/k/v share the same input; one capture each keeps the
            # reference's per-linear Hessian bookkeeping (XLA CSEs the
            # duplicate accumulations)
            captures["self_attn.q_proj"] = x
            captures["self_attn.k_proj"] = x
            captures["self_attn.v_proj"] = x
        q = linear_apply(p["q"], x)
        k = linear_apply(p["k"], x)
        v = linear_apply(p["v"], x)
        q = q.reshape(B, T, q.shape[-1] // hd, hd)
        k = k.reshape(B, T, k.shape[-1] // hd, hd)
        v = v.reshape(B, T, v.shape[-1] // hd, hd)
    return q, k, v


def _row_linear(lin: dict, x: jax.Array, tp_axis: Optional[str]) -> jax.Array:
    """Row-parallel (input-sharded) linear: local partial matmul, psum over
    the tp axis, bias added once after the reduction.

    Act-order support: a row-sharded PackedWeight carries THIS shard's
    slice of the K-permutation (parallel/tp.py pads + shards it). The
    permutation is global over K, so the shard-local input is all_gathered
    (tiny at decode: K * batch floats) and each shard gathers the rows its
    permuted weight shard needs; the psum epilogue is unchanged."""
    if tp_axis is None:
        return linear_apply(lin, x)
    w = lin.get("w")
    if isinstance(w, PackedWeight) and w.perm is not None:
        import dataclasses

        xf = jax.lax.all_gather(x, tp_axis, axis=x.ndim - 1, tiled=True)
        x = jnp.take(xf, w.perm, axis=-1)  # (..., K_local), permuted order
        lin = {**lin, "w": dataclasses.replace(w, perm=None)}
    y = linear_apply({**lin, "b": None}, x)
    y = jax.lax.psum(y, tp_axis)
    if lin.get("b") is not None:
        y = y + lin["b"]
    return y


def block_forward(
    spec: ArchSpec,
    p: dict,
    x: jax.Array,  # (B, T, hidden)
    *,
    positions: jax.Array | None = None,  # (B, T) absolute positions
    mask: jax.Array | None = None,  # (B|1, 1|H, T, S) additive bias
    cache: tuple[jax.Array, jax.Array] | None = None,  # (k,v): (B, max, kvh, hd)
    cache_len: jax.Array | None = None,
    capture: bool = False,
    tp_axis: str | None = None,
    rope: tuple[jax.Array, jax.Array] | None = None,  # hoisted (cos, sin)
    attn_fn=None,  # replaces attention() (sequence-parallel ring attention)
    ep_axis: str | None = None,  # expert-parallel axis (MoE layers)
    ep_size: int = 1,
    moe_aux: list | None = None,  # collects MoE load-balancing losses
    defer_write: bool = False,  # decode: return fresh k/v instead of
    # writing them (model_forward batches ONE cache update per step)
    full_cache: tuple | None = None,  # (kL, vL, ksL, vsL, layer_idx): the
    # WHOLE (L, B, S, kvh, hd) cache stack + this block's index, for the
    # layer-prefetch attention kernel (a layer-sliced operand feeding a
    # custom call materializes a copy; see decode_attention_wide)
):
    """One decoder block. Returns (out, new_kv, captures).

    With `cache`, keys/values are written at [cache_len, cache_len+T) and
    attention runs against the full cache prefix (decode path); otherwise
    S = T (calibration/eval path).

    With `defer_write` (T == 1; scalar or per-slot (B,) cache_len), the
    block does NOT
    write the cache: attention covers slots < cache_len from the buffer
    plus the token's own k/v merged exactly (self softmax column /
    in-kernel fresh pair), and new_kv returns the FRESH (B, 1, kvh, hd)
    rows. model_forward stacks all layers' rows and issues one
    (L, B, 1, kvh, hd) dynamic_update_slice per step — the per-layer
    read-modify-write of the carried (L, B, S, kvh, hd) buffers defeated
    XLA's in-place analysis and copied the whole cache every step
    (chip-measured 5.8 ms/step at b32 S=256; experiments/
    r4_batch_decomp.py).

    With `tp_axis` (inside shard_map), q/k/v/gate/up/fc1 weights are local
    column shards (local heads / local ffn), o/down/fc2 are local row
    shards, and the two residual projections psum over the axis — the
    Megatron pattern with activations replicated (SURVEY.md §2.3 plan).
    """
    captures: Optional[dict] = {} if capture else None
    B, T, _ = x.shape

    residual = x
    layer_a8 = (None if attn_fn is not None or defer_write else
                _layer_fusion_ok(spec, p, tp_axis, captures, B, T,
                                 cache, cache_len))
    if layer_a8 is not None:
        # the whole decoder layer in ONE launch (ln1 + qkv + rope +
        # attention + o + ln2 + mlp + residuals; ops/layer_fused.py);
        # the kernel emits the roped fresh k/v rows, placed here
        from gptq_tpu.ops.layer_fused import decode_layer_fused

        cos, sin = rope if rope is not None else rope_tables(spec, positions)
        y, ck, cv = decode_layer_fused(
            x, cache[0], cache[1], cache_len, cos, sin,
            p["ln1"]["w"], p["ln2"]["w"],
            p["qkv_fused"]["w"], p["o"]["w"],
            p["gateup_fused"]["w"], p["down"]["w"],
            n_heads=spec.n_heads, n_kv_heads=spec.n_kv_heads,
            head_dim=spec.hd, act=spec.act, norm=spec.norm_type,
            eps=float(spec.norm_eps), sm_scale=float(spec.scale),
            a8=layer_a8, interpret=_layer_fusion_impl() == "interpret")
        return y.astype(x.dtype), (ck, cv), captures
    qkv_a8 = _norm_qkv_ok(spec, p, tp_axis, captures, B * T)
    if qkv_a8 is not None:
        # attention-input half in one launch: ln1 + fused q/k/v matmul
        from gptq_tpu.ops.ffn import norm_qkv_fused

        hd_ = spec.hd
        if spec.arch == "bloom":  # natively-fused q/k/v linear
            y = norm_qkv_fused(
                x, p["ln1"]["w"], p["qkv"]["w"], norm=spec.norm_type,
                eps=float(spec.norm_eps), a8=qkv_a8, b_ln=p["ln1"].get("b"),
                b_qkv=p["qkv"].get("b"),
                interpret=_ffn_fusion_impl() == "interpret")
            fused = y[..., :p["qkv"]["w"].N]
            fused = fused.reshape(B, T, fused.shape[-1] // (3 * hd_),
                                  3 * hd_)
            q, k, v = jnp.split(fused, 3, axis=-1)
        else:
            y = norm_qkv_fused(
                x, p["ln1"]["w"], p["qkv_fused"]["w"], norm=spec.norm_type,
                eps=float(spec.norm_eps), a8=qkv_a8,
                b_ln=p["ln1"].get("b"),
                b_qkv=_qkv_fused_bias(p["qkv_fused"]),
                interpret=_ffn_fusion_impl() == "interpret")
            off = 0
            outs = []
            for (n_stored, n_logical) in p["qkv_fused"]["splits"].parts:
                outs.append(y[..., off:off + n_logical])
                off += n_stored
            q, k, v = (o.reshape(B, T, o.shape[-1] // hd_, hd_)
                       for o in outs)
    else:
        h = norm_apply(spec, p["ln1"], x) if spec.do_layer_norm_before else x
        q, k, v = _qkv(spec, p, h, captures)

    if spec.pos == "rope":
        # tables are position-only: callers looping over layers hoist them
        cos, sin = rope if rope is not None else rope_tables(spec, positions)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

    if cache is not None:
        ck, cv = cache[0], cache[1]
        ks = vs = None
        if len(cache) == 4 and cache[2] is not None:
            ks, vs = cache[2], cache[3]  # int8 cache: (B, S, kvh) scales
        elif ck.dtype == jnp.int8:
            raise ValueError(
                "int8 KV cache requires its scale planes: pass "
                "(k, v, k_scale, v_scale) (KVCache.init(dtype=int8) "
                "provides them); casting values to int8 without scales "
                "silently truncates")
        if defer_write:
            # cache_len: scalar (model_forward) or per-slot (B,) vector
            # (continuous batching) — the attention kernels take lens per
            # batch row and the XLA path masks from the caller's mask
            assert T == 1 and getattr(cache_len, "ndim", 0) <= 1
            new_kv = (k, v)  # FRESH rows; the caller writes them

            def _kernel_attn(impl):
                from gptq_tpu.ops.attention import (decode_attention,
                                                    decode_attention_wide)

                import os

                wide = (full_cache is not None and spec.hd % 128 == 0
                        and os.environ.get("GPTQ_TPU_ATTN_WIDE",
                                           "1") != "0")
                if wide:
                    # whole cache stack + in-kernel layer prefetch: the
                    # blocks DMA straight from HBM, no sliced-operand copy
                    out = decode_attention_wide(
                        q[:, 0], full_cache[0], full_cache[1], cache_len,
                        spec.scale, k_scale=full_cache[2],
                        v_scale=full_cache[3], fresh_k=k[:, 0],
                        fresh_v=v[:, 0], layer=full_cache[4],
                        interpret=impl == "interpret")
                else:
                    out = decode_attention(
                        q[:, 0], ck, cv, cache_len, spec.scale,
                        k_scale=ks, v_scale=vs,
                        fresh_k=k[:, 0], fresh_v=v[:, 0],
                        interpret=impl == "interpret")
                return out.reshape(B, 1, -1).astype(x.dtype)

            if ks is not None:
                if (spec.pos != "alibi" and attn_fn is None
                        and _attn_int8_impl()):
                    attn = _kernel_attn(_attn_int8_impl())
                    return _finish_block(spec, p, residual, attn,
                                         captures, tp_axis, new_kv,
                                         ep_axis, ep_size, moe_aux)
                k_all = ck.astype(jnp.float32) * ks[..., None]
                v_all = cv.astype(jnp.float32) * vs[..., None]
            else:
                impl_b = _attn_bf16_impl(
                    S=ck.shape[1],
                    wide_ok=spec.hd % 128 == 0 and full_cache is not None)
                if (spec.pos != "alibi" and attn_fn is None and impl_b):
                    attn = _kernel_attn(impl_b)
                    return _finish_block(spec, p, residual, attn,
                                         captures, tp_axis, new_kv,
                                         ep_axis, ep_size, moe_aux)
                k_all, v_all = ck, cv
            attn = _attention_with_self(spec, q, k_all, v_all, mask, k, v)
            return _finish_block(spec, p, residual, attn, captures,
                                 tp_axis, new_kv, ep_axis, ep_size,
                                 moe_aux)
        if getattr(cache_len, "ndim", 0) == 1:
            # per-slot offsets (continuous batching): vmap the update over B
            if ks is not None:
                kq, ksn = _quantize_kv(k)
                vq, vsn = _quantize_kv(v)
                upd = jax.vmap(
                    lambda c, val, off: jax.lax.dynamic_update_slice(
                        c, val, (off, 0, 0)))
                upd_s = jax.vmap(
                    lambda c, val, off: jax.lax.dynamic_update_slice(
                        c, val, (off, 0)))
                ck = upd(ck, kq, cache_len)
                cv = upd(cv, vq, cache_len)
                ks = upd_s(ks, ksn, cache_len)
                vs = upd_s(vs, vsn, cache_len)
            else:
                upd = jax.vmap(
                    lambda c, val, off: jax.lax.dynamic_update_slice(
                        c, val.astype(c.dtype), (off, 0, 0))
                )
                ck = upd(ck, k, cache_len)
                cv = upd(cv, v, cache_len)
        elif ks is not None:
            kq, ksn = _quantize_kv(k)
            vq, vsn = _quantize_kv(v)
            ck = jax.lax.dynamic_update_slice(ck, kq, (0, cache_len, 0, 0))
            cv = jax.lax.dynamic_update_slice(cv, vq, (0, cache_len, 0, 0))
            ks = jax.lax.dynamic_update_slice(ks, ksn, (0, cache_len, 0))
            vs = jax.lax.dynamic_update_slice(vs, vsn, (0, cache_len, 0))
        else:
            ck = jax.lax.dynamic_update_slice(
                ck, k.astype(ck.dtype), (0, cache_len, 0, 0))
            cv = jax.lax.dynamic_update_slice(
                cv, v.astype(cv.dtype), (0, cache_len, 0, 0))
        if ks is not None:
            new_kv = (ck, cv, ks, vs)
            if (T == 1 and spec.pos != "alibi" and attn_fn is None
                    and _attn_int8_impl()):
                # fused int8-cache decode attention: the kernel consumes
                # int8 slabs + scales directly — half the cache read
                # bandwidth of the materialized path below
                from gptq_tpu.ops.attention import decode_attention_int8

                lens = (cache_len + 1 if getattr(cache_len, "ndim", 0)
                        else cache_len + T)
                out = decode_attention_int8(
                    q[:, 0], ck, cv, ks, vs, lens, spec.scale,
                    interpret=_attn_int8_impl() == "interpret")
                attn = out.reshape(B, 1, -1).astype(x.dtype)
                return _finish_block(spec, p, x, attn, captures, tp_axis,
                                     new_kv, ep_axis, ep_size, moe_aux)
            k_all = ck.astype(jnp.float32) * ks[..., None]
            v_all = cv.astype(jnp.float32) * vs[..., None]
        else:
            new_kv = (ck, cv)
            if (T == 1 and spec.pos != "alibi" and attn_fn is None
                    and _attn_bf16_impl()):
                # bf16/f32 cache decode through the same flash-style
                # kernel. OPT-IN ONLY (GPTQ_TPU_ATTN_IMPL=kernel): the
                # kernel wins standalone (18 vs 24.5 us at S=256, 77 vs
                # 104 at S=2048) but LOSES at model level (5.48 vs 5.37
                # and 10.84 vs 9.92 ms/token) — XLA overlaps the einsum
                # attention with the surrounding streams better than it
                # schedules around an opaque custom call.
                from gptq_tpu.ops.attention import decode_attention

                lens = (cache_len + 1 if getattr(cache_len, "ndim", 0)
                        else cache_len + T)
                out = decode_attention(
                    q[:, 0], ck, cv, lens, spec.scale,
                    interpret=_attn_bf16_impl() == "interpret")
                attn = out.reshape(B, 1, -1).astype(x.dtype)
                return _finish_block(spec, p, residual, attn, captures,
                                     tp_axis, new_kv, ep_axis, ep_size,
                                     moe_aux)
            k_all, v_all = ck, cv
    else:
        k_all, v_all = k, v
        new_kv = None

    attn = (attn_fn or attention)(
        spec, q, k_all, v_all, mask,
        plain_causal=cache is None and spec.pos != "alibi")
    return _finish_block(spec, p, residual, attn, captures, tp_axis, new_kv,
                         ep_axis, ep_size, moe_aux)


def _attn_int8_impl() -> str | None:
    """Whether the fused int8-cache decode-attention kernel serves decode:
    'tpu' (compiled) / 'interpret' (CPU tests) / None (materialized
    dequant + XLA einsum). auto = on when running on TPU (the kernel is
    what realizes the int8 cache's bandwidth halving)."""
    import os

    mode = os.environ.get("GPTQ_TPU_ATTN_IMPL", "auto")
    if mode == "kernel":
        return "tpu"
    if mode == "interpret":
        return "interpret"
    if mode == "xla":
        return None
    if mode != "auto":
        raise ValueError(
            f"GPTQ_TPU_ATTN_IMPL={mode!r}: expected auto/kernel/interpret/xla")
    return "tpu" if jax.default_backend() == "tpu" else None


def _attn_bf16_impl(S: int | None = None,
                    wide_ok: bool = False) -> str | None:
    """Whether the decode-attention kernel also serves bf16/f32 caches.

    Short contexts stay on the XLA einsum (chip A/B: einsum faster at
    model level at S=256 and S=2048 — XLA overlaps it with the weight
    streams better than it schedules around an opaque custom call), but
    once the cache stream dominates the step the WIDE kernel's smaller
    working set wins: chip A/B 2026-08-20 at llama-7B b1, ms/token —
    2k: 6.50 einsum vs 6.56 kernel; 4k: 8.28 vs 8.24 (tie); 8k: 11.50
    vs 10.69 (kernel 7.5% ahead). auto therefore engages the kernel for
    S > 4096 when the wide path is available (hd lane-aligned + stacked
    cache feed); 'kernel'/'interpret' force it at any length."""
    import os

    mode = os.environ.get("GPTQ_TPU_ATTN_IMPL", "auto")
    if mode == "kernel":
        return "tpu"
    if mode == "interpret":
        return "interpret"
    if mode not in ("auto", "xla"):
        raise ValueError(
            f"GPTQ_TPU_ATTN_IMPL={mode!r}: expected auto/kernel/interpret/xla")
    if (mode == "auto" and wide_ok and S is not None and S > 4096
            and jax.default_backend() == "tpu"):
        return "tpu"
    return None


def _ffn_fusion_impl() -> str | None:
    """Whole-FFN fused kernel mode: 'tpu' / 'interpret' / None (off)."""
    import os

    mode = os.environ.get("GPTQ_TPU_FFN_FUSION", "auto")
    if mode in ("on", "kernel"):
        return "tpu"
    if mode == "interpret":
        return "interpret"
    if mode == "off":
        return None
    if mode != "auto":
        raise ValueError(
            f"GPTQ_TPU_FFN_FUSION={mode!r}: expected auto/on/off/interpret")
    return "tpu" if jax.default_backend() == "tpu" else None


def _layer_fusion_impl() -> str | None:
    """Single-launch whole-decoder-layer kernel mode (ops/layer_fused.py):
    'tpu' / 'interpret' / None. DEFAULT OFF: chip-measured SLOWER than
    the two-launch + XLA-glue path at llama-7B decode (5.75 vs 5.47
    ms/token — the serialized mega-kernel loses the cross-layer overlap
    XLA finds between separate launches; DESIGN.md). Opt in with
    GPTQ_TPU_LAYER_FUSION=on to re-measure on other topologies."""
    import os

    mode = os.environ.get("GPTQ_TPU_LAYER_FUSION", "off")
    if mode in ("on", "kernel", "auto"):
        return "tpu"
    if mode == "interpret":
        return "interpret"
    if mode != "off":
        raise ValueError(
            f"GPTQ_TPU_LAYER_FUSION={mode!r}: expected off/on/interpret")
    return None


def _layer_fusion_ok(spec, p, tp_axis, captures, B, T, cache, cache_len):
    """Activation mode (True = a8, False = a16) when decode_layer_fused
    can serve this whole block, else None. Decode only: B == T == 1,
    rope + pre-norm rms + GLU + bias-free (llama/gemma families),
    bf16/f32 cache with a scalar offset."""
    if (_layer_fusion_impl() is None or tp_axis is not None
            or captures is not None or B != 1 or T != 1):
        return None
    if cache is None or cache_len is None:
        return None
    if getattr(cache_len, "ndim", 0):
        return None  # per-slot offsets (continuous batching): 3-launch path
    if len(cache) == 4 and cache[2] is not None:
        return None  # int8 cache keeps the dedicated int8 attention kernel
    if cache[0].dtype == jnp.int8:
        return None
    if (spec.pos != "rope" or not spec.do_layer_norm_before
            or spec.norm_type not in ("rmsnorm", "rmsnorm1p")):
        return None
    qkv = p.get("qkv_fused")
    o = p.get("o")
    gu = p.get("gateup_fused")
    dn = p.get("down")
    if any(e is None for e in (qkv, o, gu, dn)):
        return None
    entries = (qkv, o, gu, dn)
    for e in entries:
        if not isinstance(e.get("w"), PackedWeight) or e.get("act_q"):
            return None
    if any(b is not None for b in qkv["b_parts"]):
        return None
    if any(b is not None for b in gu["b_parts"]):
        return None
    if o.get("b") is not None or dn.get("b") is not None:
        return None
    a8 = _a8_mode(*entries)
    if a8 is None:
        return None
    from gptq_tpu.ops.layer_fused import layer_fusable

    if not layer_fusable(qkv["w"], qkv["splits"], o["w"], gu["w"], dn["w"],
                         spec.hidden, spec.n_heads, spec.n_kv_heads,
                         head_dim=spec.hd):
        return None
    return a8


def _stream_preferred(w) -> bool:
    """Serve through the streamed fused kernels? Uniform formats yes; BCQ
    measures SLOWER fused than its bitplane grid kernel (chip: 146 vs
    104 us at llama-7B ffn shapes — 3 sign planes = 3x MXU ingest and the
    grid kernel pipelines it better), so BCQ keeps the grid path."""
    return isinstance(w, PackedWeight) and w.fmt != "bcq"


def _a8_mode(*entries):
    """The shared dynamic-int8 activation mode of a phase's entries, or
    None when the flags disagree (mixed configs keep the unfused path)."""
    modes = {bool(e.get("serve") and e["serve"].a8) for e in entries}
    return modes.pop() if len(modes) == 1 else None


def _ffn_fusion_entry(p, tp_axis, captures):
    """The gateup entry's activation mode (True = w?a8, False = w?a16)
    when the single-launch FFN kernel can serve this block's MLP, else
    None (see ops/ffn.py)."""
    if _ffn_fusion_impl() is None or tp_axis is not None or captures is not None:
        return None
    gu = p.get("gateup_fused")
    dn = p.get("down")
    if gu is None or dn is None or not _stream_preferred(dn.get("w")):
        return None
    if not _stream_preferred(gu.get("w")):
        return None
    a8 = _a8_mode(gu, dn)
    if a8 is None:
        return None
    if gu.get("act_q") is not None or dn.get("act_q") is not None:
        return None
    if any(b is not None for b in gu["b_parts"]) or dn.get("b") is not None:
        return None
    from gptq_tpu.ops.ffn import ffn_fusable

    if not ffn_fusable(gu["w"], dn["w"]):
        return None
    return a8


def _norm_qkv_ok(spec, p, tp_axis, captures, n_rows):
    """Activation mode (True = a8, False = a16/bf16) when the single-launch
    ln1+qkv kernel (ops/ffn.norm_qkv_fused) can serve this block's
    attention input, else None."""
    if (_ffn_fusion_impl() is None or tp_axis is not None
            or captures is not None or n_rows > 32):
        return None
    if not spec.do_layer_norm_before or spec.norm_type not in (
            "rmsnorm", "rmsnorm1p", "layernorm"):
        return None
    from gptq_tpu.ops.ffn import norm_qkv_fusable

    if spec.arch == "bloom":
        # bloom's q/k/v is natively one fused linear
        entry = p.get("qkv")
        if entry is None or not _stream_preferred(entry.get("w")):
            return None
        if entry.get("act_q") is not None:
            return None
        if entry.get("b") is not None and entry["w"].Np != entry["w"].N:
            return None
        return _a8_mode(entry) if norm_qkv_fusable(entry["w"]) else None
    entry = p.get("qkv_fused")
    if entry is None or not _stream_preferred(entry.get("w")):
        return None
    if entry.get("act_q") is not None:
        return None
    if any(b is not None for b in entry["b_parts"]):
        # biases fold into the kernel only when every part's stored width
        # equals its logical width (the concat then lines up exactly)
        if any(ns != nl for ns, nl in entry["splits"].parts):
            return None
    return _a8_mode(entry) if norm_qkv_fusable(entry["w"]) else None


def _qkv_fused_bias(entry):
    """Concatenated per-part bias vector for the fused qkv kernel, or None
    (only called when _norm_qkv_ok validated the alignment)."""
    if all(b is None for b in entry["b_parts"]):
        return None
    parts = []
    for (n_stored, _nl), b in zip(entry["splits"].parts, entry["b_parts"]):
        parts.append(jnp.zeros((n_stored,), jnp.float32) if b is None
                     else b.astype(jnp.float32))
    return jnp.concatenate(parts)


def _mlp_entries(spec, p):
    """(fc1-like entry, fc2-like entry, glu) for the fused MLP kernels:
    llama-family uses the fused gate|up weight (glu), OPT/BLOOM fc1/fc2."""
    if spec.arch in ("llama", "gemma"):
        return p.get("gateup_fused"), p.get("down"), True
    if spec.arch in ("opt", "bloom"):
        return p.get("fc1"), p.get("fc2"), False
    return None, None, False


def _attn_mlp_ok(spec, p, tp_axis, captures, n_rows):
    """Activation mode (True = a8, False = a16) when the single-launch
    post-attention kernel (o + residual + norm + MLP + residual;
    ops/ffn.attn_mlp_fused) can serve this block, else None."""
    if (_ffn_fusion_impl() is None or tp_axis is not None
            or captures is not None or n_rows > 32):
        return None
    if not spec.do_layer_norm_before or spec.norm_type not in (
            "rmsnorm", "rmsnorm1p", "layernorm"):
        return None
    g_e, d_e, glu = _mlp_entries(spec, p)
    if g_e is None or d_e is None:
        return None
    for e in (g_e, d_e):
        if not _stream_preferred(e.get("w")) or e.get("act_q") is not None:
            return None
    if glu and (any(b is not None for b in g_e["b_parts"])
                or d_e.get("b") is not None):
        return None  # llama-family has no biases; keep the fast gate exact
    if not glu:
        # OPT biases fold into the kernel only when stored == logical N
        for e in (g_e, d_e):
            if e.get("b") is not None and e["w"].Np != e["w"].N:
                return None
    o = p.get("o")
    if o is None or not _stream_preferred(o.get("w")) or o.get("act_q"):
        return None
    if o.get("b") is not None and o["w"].Np != o["w"].N:
        return None
    a8 = _a8_mode(o, g_e, d_e)
    if a8 is None:
        return None
    from gptq_tpu.ops.ffn import attn_mlp_fusable

    if not attn_mlp_fusable(o["w"], g_e["w"], d_e["w"], glu=glu):
        return None
    return a8


def _finish_block(spec, p, residual, attn, captures, tp_axis, new_kv,
                  ep_axis=None, ep_size=1, moe_aux=None):
    """Post-attention half of a decoder block (o projection + MLP)."""
    n_rows = 1
    for d in attn.shape[:-1]:
        n_rows *= d
    mlp_a8 = (None if "router" in p else
              _attn_mlp_ok(spec, p, tp_axis, captures, n_rows))
    if mlp_a8 is not None:
        from gptq_tpu.ops.ffn import attn_mlp_fused

        g_e, d_e, glu = _mlp_entries(spec, p)
        out = attn_mlp_fused(
            attn, residual, p["ln2"]["w"], p["o"]["w"],
            g_e["w"], d_e["w"], act=spec.act,
            norm=spec.norm_type, eps=float(spec.norm_eps), glu=glu,
            a8=mlp_a8,
            b_ln=p["ln2"].get("b"), b_o=p["o"].get("b"),
            b_g=None if glu else g_e.get("b"),
            b_d=None if glu else d_e.get("b"),
            interpret=_ffn_fusion_impl() == "interpret")
        return out, new_kv, captures
    o_name = {"bloom": "self_attention.dense", "opt": "self_attn.out_proj"}.get(
        spec.arch, "self_attn.o_proj"
    )
    if captures is not None:
        captures[o_name] = attn
    attn_out = _row_linear(p["o"], attn, tp_axis)
    h = residual + attn_out
    if not spec.do_layer_norm_before:  # OPT 350m-style post-norm
        h = norm_apply(spec, p["ln1"], h)

    residual = h
    m = norm_apply(spec, p["ln2"], h) if spec.do_layer_norm_before else h
    if "router" in p:
        # routed mixture-of-experts FFN (models/moe.py); experts serve
        # dense and may shard over an "ep" mesh axis
        from gptq_tpu.models.moe import moe_ffn

        if captures is not None:
            captures["moe.input"] = m  # gptq_quantize_experts calibration
        mlp_out = moe_ffn(spec, p, m, ep_axis=ep_axis, ep_size=ep_size,
                          activation=lambda g: activation(spec, g),
                          aux_out=moe_aux)
    elif spec.arch in ("llama", "gemma"):
        if captures is not None:
            captures["mlp.gate_proj"] = m
            captures["mlp.up_proj"] = m
        n_rows = 1
        for d in m.shape[:-1]:
            n_rows *= d
        ffn_a8 = _ffn_fusion_entry(p, tp_axis, captures)
        if n_rows <= 32 and ffn_a8 is not None:
            # whole-FFN single-launch kernel (gateup + act + down streamed
            # back-to-back; intermediate stays in VMEM) — fast serving path
            from gptq_tpu.ops.ffn import ffn_fused

            gu = p["gateup_fused"]
            mlp_out = ffn_fused(
                m, gu["w"], p["down"]["w"], act=spec.act, a8=ffn_a8,
                interpret=_ffn_fusion_impl() == "interpret")
            return residual + mlp_out, new_kv, captures
        if "gateup_fused" in p:
            g, up = _apply_fused(p["gateup_fused"], m)
            gate = activation(spec, g)
        else:
            gate = activation(spec, linear_apply(p["gate"], m))
            up = linear_apply(p["up"], m)
        inner = gate * up
        if captures is not None:
            captures["mlp.down_proj"] = inner
        mlp_out = _row_linear(p["down"], inner, tp_axis)
    else:
        fc1_name = "mlp.dense_h_to_4h" if spec.arch == "bloom" else "fc1"
        fc2_name = "mlp.dense_4h_to_h" if spec.arch == "bloom" else "fc2"
        if captures is not None:
            captures[fc1_name] = m
        inner = activation(spec, linear_apply(p["fc1"], m))
        if captures is not None:
            captures[fc2_name] = inner
        mlp_out = _row_linear(p["fc2"], inner, tp_axis)
    out = residual + mlp_out
    if not spec.do_layer_norm_before:
        out = norm_apply(spec, p["ln2"], out)
    return out, new_kv, captures


# ---------------------------------------------------------------------------
# embedding / head
# ---------------------------------------------------------------------------

def embed_forward(spec: ArchSpec, params: dict, input_ids: jax.Array,
                  positions: jax.Array) -> jax.Array:
    emb = params["embed"]["tokens"][input_ids]
    if spec.arch == "opt":
        if params["embed"].get("project_in") is not None:
            emb = linear_apply(params["embed"]["project_in"], emb)
        # OPT learned positions with +2 offset (HF OPTLearnedPositionalEmbedding)
        emb = emb + params["embed"]["positions"][positions + 2]
    elif spec.arch == "bloom":
        emb = norm_apply(spec, params["embed"]["ln"], emb)
    elif spec.arch == "gemma":
        emb = emb * jnp.asarray(spec.embed_scale, emb.dtype)
    return emb


def _head_fusion_ok(spec, params, tp_axis, n_rows):
    """Activation mode (True = a8 under --faster-kernel, False = bf16 —
    identical w-bit/a16 semantics to the unfused head) when final_ln + the
    packed lm_head can run as one norm_qkv_fused launch, else None."""
    if (_ffn_fusion_impl() is None or tp_axis is not None or n_rows > 32):
        return None
    if spec.norm_type not in ("rmsnorm", "rmsnorm1p", "layernorm"):
        return None
    if params.get("final_ln") is None:
        return None
    if spec.arch == "opt" and params["embed"].get("project_out") is not None:
        return None
    lm = params.get("lm_head")
    if lm is None or not _stream_preferred(lm.get("w")):
        return None
    if lm.get("act_q") is not None:
        return None
    if lm.get("b") is not None and lm["w"].Np != lm["w"].N:
        return None
    from gptq_tpu.ops.ffn import norm_qkv_fusable

    if not norm_qkv_fusable(lm["w"]):
        return None
    return _a8_mode(lm)


def head_forward(spec: ArchSpec, params: dict, h: jax.Array,
                 tp_axis: str | None = None) -> jax.Array:
    n_rows = 1
    for d in h.shape[:-1]:
        n_rows *= d
    head_a8 = _head_fusion_ok(spec, params, tp_axis, n_rows)
    if head_a8 is not None:
        # final_ln + packed lm_head in one launch (decode fast path); under
        # --faster-kernel the head matvec also runs dynamic-int8 activations
        from gptq_tpu.ops.ffn import norm_qkv_fused

        lm = params["lm_head"]
        y = norm_qkv_fused(
            h, params["final_ln"]["w"], lm["w"], norm=spec.norm_type,
            eps=float(spec.norm_eps), a8=head_a8,
            b_ln=params["final_ln"].get("b"), b_qkv=lm.get("b"),
            interpret=_ffn_fusion_impl() == "interpret")
        return y[..., :lm["w"].N]
    if params.get("final_ln") is not None:
        h = norm_apply(spec, params["final_ln"], h)
    if spec.arch == "opt" and params["embed"].get("project_out") is not None:
        h = linear_apply(params["embed"]["project_out"], h)
    lm = params.get("lm_head")
    if lm is None:  # tied embeddings
        w = params["embed"]["tokens"]
        return jnp.einsum("...h,vh->...v", h, w)
    logits = linear_apply(lm, h)
    flags = lm.get("serve")
    if tp_axis is not None and flags is not None and flags.vocab_tp:
        # vocab-sharded head: each shard computed its V/tp logit slice
        logits = jax.lax.all_gather(logits, tp_axis, axis=logits.ndim - 1,
                                    tiled=True)
    return logits


def build_mask(spec: ArchSpec, T: int, S: int,
               tp_axis: str | None = None, tp_size: int = 1) -> jax.Array:
    mask = causal_mask(T, S)
    if spec.pos == "alibi":
        mask = mask + alibi_bias(spec, T, S, tp_axis, tp_size)
    return mask


def model_forward(
    spec: ArchSpec,
    params: dict,
    input_ids: jax.Array,  # (B, T)
    cache: KVCache | None = None,
    tp_axis: str | None = None,
    tp_size: int = 1,
    ep_axis: str | None = None,
    ep_size: int = 1,
    moe_aux: list | None = None,
) -> tuple[jax.Array, KVCache | None]:
    """Full forward -> logits (B, T, vocab). With a cache, runs the decode
    path appending T tokens at cache.length. With `tp_axis` (inside
    shard_map) the layer weights are tensor-parallel local shards (see
    block_forward) and the cache holds this shard's kv heads."""
    B, T = input_ids.shape
    # deferred cache write (single-token decode, scalar offset): blocks
    # attend existing slots + their own fresh k/v, and ALL layers' fresh
    # rows land in ONE (L, B, 1, kvh, hd) cache update per step. The
    # per-layer read-modify-write of the (L, ...) carry defeated XLA's
    # in-place analysis and copied the full cache each step (5.8 ms at
    # b32 S=256, experiments/r4_batch_decomp.py). Layer fusion (opt-in)
    # writes rows in-kernel, so it keeps the write-first path.
    defer = (cache is not None and T == 1
             and getattr(cache.length, "ndim", 0) == 0
             and _layer_fusion_impl() is None)
    if cache is None:
        positions = jnp.broadcast_to(jnp.arange(T), (B, T))
        mask = build_mask(spec, T, T, tp_axis, tp_size)
    else:
        positions = cache.length + jnp.broadcast_to(jnp.arange(T), (B, T))
        S = cache.k.shape[2]
        # mask out positions beyond the filled prefix + current tokens;
        # deferred decode masks STRICTLY below cache.length (the fresh
        # token is merged separately, never read from the buffer)
        k_pos = jnp.arange(S)[None, :]
        q_pos = cache.length + jnp.arange(T)[:, None]
        valid = k_pos < q_pos if defer else k_pos <= q_pos
        m = jnp.where(valid, 0.0, NEG_INF).astype(jnp.float32)
        mask = m[None, None]
        if spec.pos == "alibi":
            slopes = _local_slopes(spec, tp_axis, tp_size)
            rel = k_pos.astype(jnp.float32) - q_pos.astype(jnp.float32)  # (T, S)
            bias = slopes[None, :, None, None] * rel[None, None]
            mask = mask + jnp.where(valid[None, None], bias, 0.0)

    h = embed_forward(spec, params, input_ids, positions)
    rope = rope_tables(spec, positions) if spec.pos == "rope" else None
    ck = cache.k if cache is not None else None
    cv = cache.v if cache is not None else None
    ks = cache.k_scale if cache is not None else None
    vs = cache.v_scale if cache is not None else None
    fresh = []
    for i, bp in enumerate(params["layers"]):
        layer_cache = None
        clen = None
        if cache is not None:
            layer_cache = (ck[i], cv[i],
                           None if ks is None else ks[i],
                           None if vs is None else vs[i])
            clen = cache.length
        h, new_kv, _ = block_forward(
            spec, bp, h, positions=positions, mask=mask,
            cache=layer_cache, cache_len=clen, tp_axis=tp_axis, rope=rope,
            ep_axis=ep_axis, ep_size=ep_size, moe_aux=moe_aux,
            defer_write=defer,
            full_cache=(ck, cv, ks, vs, i) if defer else None,
        )
        if defer:
            fresh.append(new_kv)  # (k, v) fresh (B, 1, kvh, hd) rows
        elif new_kv is not None:
            # write the updated layer slice back in place (a donated cache
            # buffer aliases; jnp.stack of all layers copied the full cache
            # every step)
            ck = jax.lax.dynamic_update_index_in_dim(
                ck, new_kv[0].astype(ck.dtype), i, 0)
            cv = jax.lax.dynamic_update_index_in_dim(
                cv, new_kv[1].astype(cv.dtype), i, 0)
            if len(new_kv) == 4:
                ks = jax.lax.dynamic_update_index_in_dim(ks, new_kv[2], i, 0)
                vs = jax.lax.dynamic_update_index_in_dim(vs, new_kv[3], i, 0)
    if defer:
        fk = jnp.stack([f[0] for f in fresh])  # (L, B, 1, kvh, hd)
        fv = jnp.stack([f[1] for f in fresh])
        off = (0, 0, cache.length, 0, 0)
        if ks is not None:
            kq, ksn = jax.vmap(_quantize_kv)(fk)
            vq, vsn = jax.vmap(_quantize_kv)(fv)
            ck = jax.lax.dynamic_update_slice(ck, kq, off)
            cv = jax.lax.dynamic_update_slice(cv, vq, off)
            ks = jax.lax.dynamic_update_slice(ks, ksn, off[:-1])
            vs = jax.lax.dynamic_update_slice(vs, vsn, off[:-1])
        else:
            ck = jax.lax.dynamic_update_slice(ck, fk.astype(ck.dtype), off)
            cv = jax.lax.dynamic_update_slice(cv, fv.astype(cv.dtype), off)
    logits = head_forward(spec, params, h, tp_axis=tp_axis)
    new_cache = None
    if cache is not None:
        new_cache = KVCache(k=ck, v=cv, length=cache.length + T,
                            k_scale=ks, v_scale=vs)
    return logits, new_cache


# ---------------------------------------------------------------------------
# random init (tests / benchmarks on synthetic weights)
# ---------------------------------------------------------------------------

def _lin(key, out_d, in_d, bias, dtype):
    k1, _ = jax.random.split(key)
    w = jax.random.normal(k1, (out_d, in_d), dtype) * (0.4 / np.sqrt(in_d))
    d = {"w": w}
    d["b"] = jnp.zeros((out_d,), dtype) if bias else None
    return d


def init_params(spec: ArchSpec, key: jax.Array, dtype=jnp.float32) -> dict:
    """Random params with the exact pytree structure of converted HF weights."""
    if spec.n_experts and spec.arch not in ("llama", "gemma"):
        raise ValueError(
            f"n_experts={spec.n_experts} is only supported for the "
            f"llama/gemma (GLU-FFN) families, not arch={spec.arch!r} "
            f"(models/moe.py routes a gate/up/down expert FFN)")
    keys = jax.random.split(key, spec.n_layers + 2)
    h, f = spec.hidden, spec.ffn
    bias = spec.linear_bias

    def norm_p():
        if spec.norm_type == "layernorm":
            return {"w": jnp.ones((h,), dtype), "b": jnp.zeros((h,), dtype)}
        return {"w": jnp.ones((h,), dtype) if spec.norm_type == "rmsnorm"
                else jnp.zeros((h,), dtype)}

    layers = []
    for i in range(spec.n_layers):
        lk = jax.random.split(keys[i], 8)
        p = {"ln1": norm_p(), "ln2": norm_p()}
        if spec.arch == "bloom":
            p["qkv"] = _lin(lk[0], 3 * h, h, bias, dtype)
            p["o"] = _lin(lk[1], h, h, bias, dtype)
            p["fc1"] = _lin(lk[2], f, h, bias, dtype)
            p["fc2"] = _lin(lk[3], h, f, bias, dtype)
        elif spec.arch in ("llama", "gemma"):
            qd = spec.n_heads * spec.hd
            kvd = spec.kv_heads * spec.hd
            p["q"] = _lin(lk[0], qd, h, bias, dtype)
            p["k"] = _lin(lk[1], kvd, h, bias, dtype)
            p["v"] = _lin(lk[2], kvd, h, bias, dtype)
            p["o"] = _lin(lk[3], h, qd, bias, dtype)
            if spec.n_experts:
                from gptq_tpu.models.moe import init_moe_params

                p.update(init_moe_params(spec, lk[4], dtype))
            else:
                p["gate"] = _lin(lk[4], f, h, bias, dtype)
                p["up"] = _lin(lk[5], f, h, bias, dtype)
                p["down"] = _lin(lk[6], h, f, bias, dtype)
        else:  # opt
            p["q"] = _lin(lk[0], h, h, bias, dtype)
            p["k"] = _lin(lk[1], h, h, bias, dtype)
            p["v"] = _lin(lk[2], h, h, bias, dtype)
            p["o"] = _lin(lk[3], h, h, bias, dtype)
            p["fc1"] = _lin(lk[4], f, h, bias, dtype)
            p["fc2"] = _lin(lk[5], h, f, bias, dtype)
        layers.append(p)

    embed = {"tokens": jax.random.normal(keys[-1], (spec.vocab, h), dtype) * 0.02}
    if spec.arch == "opt":
        embed["positions"] = (
            jax.random.normal(keys[-2], (spec.max_pos + 2, h), dtype) * 0.02
        )
        embed["project_in"] = None
        embed["project_out"] = None
    if spec.arch == "bloom":
        embed["ln"] = norm_p()
    params = {"embed": embed, "layers": layers, "final_ln": norm_p()}
    if spec.tie_embeddings:
        params["lm_head"] = None
    else:
        params["lm_head"] = {"w": jax.random.normal(keys[-2], (spec.vocab, h), dtype) * 0.02,
                             "b": None}
    return params
