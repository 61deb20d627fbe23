"""Bit-packing of quantized weights into int32 words — TPU-native layout.

The reference packs 32 3-bit values into 3 int32s with 30/31-bit straddles
(reference: quant.py:158-187), a layout chosen for CUDA warp shuffles. On
TPU that layout forces cross-lane bit surgery, so we use **blocked field
packing** instead (capability parity, not format parity — SURVEY.md §7):

  * a b-bit code is split into power-of-two-sized fields (3 = 2+1 bits);
  * each field of width fb packs P = 32/fb K-positions into one int32 in a
    **byteplane-subblock** order: within each subblock of SB = subblock(K,
    groupsize) consecutive K rows (Wsb = SB/P words, E = 8/fb sub-byte
    shifts), row

        SB*s + e*(4*Wsb) + 4*j + b     (e < E, j < Wsb, b < 4 bytes)

    is stored in word s*Wsb + j at bit 8*b + fb*e. This is exactly the
    order the TPU kernel reads for free: `(word >> fb*e) & byte_mask`
    isolates sub-byte plane e in all four bytes, `pltpu.bitcast(int8)`
    expands the sublane dim x4 in little-endian byte order (measured
    identical on hardware and interpret mode), and concatenating the E
    planes per subblock lands every code row without any cross-sublane
    shuffle — ~0.5 VPU ops per code where a shift/mask-per-position unpack
    costs ~3 and an interleaved reshape forces a relayout (3x slower
    measured end-to-end).
  * the 8-bit field stores code-128 (byte XOR 0x80) so the int8
    reinterpretation is value-correct; the +128 rides the zero-offset
    epilogue in the kernels and is undone here in unpack.

Codes are stored transposed as (K, N) = (in_features, out_features) so the
serving matmul is y = x @ dequant(codes), feeding the MXU directly.

BCQ bitplanes (reference: lut_gemm/quant.py:23 uses (K/32, bits, N)) use the
same blocked 1-bit packing per plane, stored (bits, K/32, N).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# bits -> list of (field_bits, shift_in_code); fields must sum to `bits`
FIELD_SPLITS = {
    1: [(1, 0)],
    2: [(2, 0)],
    3: [(2, 0), (1, 2)],
    4: [(4, 0)],
    8: [(8, 0)],
}


def subblock(K: int, groupsize: int = -1) -> int:
    """Byteplane subblock length: largest power of two <= 512 dividing K
    (and the quantization groupsize, so group chunks cover whole subblocks
    — needed by the code-dot group slicing and TP sharding).

    Both the packers and the kernels derive it from (K, groupsize), so it
    is never stored. Never below 32: a 1-bit field packs 32 rows per word,
    so SB < 32 is unrepresentable. Groups smaller than 32 columns then
    don't align to subblocks — harmless, because such groups always take
    the in-tile dequant path (cs < 128), which has no alignment need."""
    sb = 512
    while K % sb:
        sb //= 2
    if groupsize > 0:
        while groupsize % sb and sb > 32:
            sb //= 2
    return sb


def pack_codes(codes: jax.Array, bits: int,
               groupsize: int = -1) -> tuple[jax.Array, ...]:
    """Pack unsigned codes (K, N) in [0, 2^bits) into byteplane int32 words.

    Returns one (K//P_f, N) int32 array per field. K must be divisible by 32.
    """
    K, N = codes.shape
    if K % 32:
        raise ValueError(f"K={K} must be a multiple of 32 for packing")
    SB = subblock(K, groupsize)
    codes = codes.astype(jnp.uint32)
    words = []
    for fb, sh in FIELD_SPLITS[bits]:
        P = 32 // fb
        Wsb = SB // P
        E = 8 // fb
        part = (codes >> sh) & ((1 << fb) - 1)
        if fb == 8:
            part = part ^ 0x80  # store code-128 for int8 reinterpretation
        # row SB*s + e*4*Wsb + 4*j + b  ->  word (s, j), bit 8*b + fb*e
        part = part.reshape(K // SB, E, Wsb, 4, N)
        e_sh = (fb * jnp.arange(E, dtype=jnp.uint32)).reshape(1, E, 1, 1, 1)
        b_sh = (8 * jnp.arange(4, dtype=jnp.uint32)).reshape(1, 1, 1, 4, 1)
        word = jnp.sum(part << (e_sh + b_sh), axis=(1, 3), dtype=jnp.uint32)
        words.append(word.reshape(K // P, N).astype(jnp.int32))
    return tuple(words)


def unpack_field(w: jax.Array, fb: int, K: int,
                 groupsize: int = -1) -> jax.Array:
    """One field's words (K//P, N) -> (K, N) uint32 sub-codes."""
    P = 32 // fb
    SB = subblock(K, groupsize)
    Wsb = SB // P
    E = 8 // fb
    N = w.shape[-1]
    wu = w.astype(jnp.uint32).reshape(K // SB, 1, Wsb, 1, N)
    e_sh = fb * jax.lax.broadcasted_iota(jnp.uint32, (1, E, 1, 1, 1), 1)
    b_sh = 8 * jax.lax.broadcasted_iota(jnp.uint32, (1, 1, 1, 4, 1), 3)
    part = (wu >> (e_sh + b_sh)) & ((1 << fb) - 1)  # (K/SB, E, Wsb, 4, N)
    part = part.reshape(K, N)
    if fb == 8:
        part = part ^ 0x80
    return part


def unpack_codes(words: tuple[jax.Array, ...], bits: int,
                 groupsize: int = -1) -> jax.Array:
    """Inverse of pack_codes -> (K, N) int32 codes."""
    out = None
    for (fb, sh), w in zip(FIELD_SPLITS[bits], words):
        K = w.shape[0] * (32 // fb)
        part = unpack_field(w, fb, K, groupsize).astype(jnp.int32) << sh
        out = part if out is None else out + part
    return out


@jax.tree_util.register_dataclass
@dataclass
class PackedWeight:
    """A served quantized linear: y = x @ dequant() + bias.

    Uniform grids (reference Quant3Linear counterpart, quant.py:140-203):
      words  — tuple of blocked int32 field arrays, K-major
      scale  — (num_groups, N) f32
      zoff   — (num_groups, N) f32, scale*zero so dequant = scale*q - zoff
    BCQ (reference LutLinear counterpart, lut_gemm/quant.py:8-69):
      words  — (bits, K//32, N) sign bitplanes in one int32 array
      alpha  — (num_groups, bits, N) f32
    Common:
      bias   — (N,) or None
      perm   — (K,) int32 activation permutation for act-order serving, or None

    K/N are the LOGICAL dims; the stored arrays may be zero-padded up to a
    512-multiple (`pad_dim`) so the kernel always gets >= 512 tiles (e.g.
    LLaMa's ffn 11008 = 2^8 * 43 would otherwise cap tiles at 256). Padding
    is invisible: pad scales/alphas are zero and the run-time x pad is
    zero, so padded rows/cols contribute exactly 0.
    """

    words: tuple[jax.Array, ...]
    scale: Optional[jax.Array] = None
    zoff: Optional[jax.Array] = None
    alpha: Optional[jax.Array] = None
    bias: Optional[jax.Array] = None
    perm: Optional[jax.Array] = None
    bits: int = field(default=4, metadata=dict(static=True))
    K: int = field(default=0, metadata=dict(static=True))
    N: int = field(default=0, metadata=dict(static=True))
    groupsize: int = field(default=-1, metadata=dict(static=True))
    fmt: str = field(default="uniform", metadata=dict(static=True))

    @property
    def Kp(self) -> int:
        """Stored (padded) K."""
        w = self.words[0]
        if self.fmt == "bcq":
            return w.shape[1] * 32
        fb = FIELD_SPLITS[self.bits][0][0]
        return w.shape[-2] * (32 // fb)

    @property
    def Np(self) -> int:
        """Stored (padded) N."""
        return self.words[0].shape[-1]


def pad_dim(dim: int, groupsize: int = -1, unit: int = 512) -> int:
    """Round `dim` up so kernel tiles of >= `unit` exist: next multiple of
    lcm(unit, groupsize). No-op when dim already divides cleanly or the
    padding would exceed 12.5%."""
    u = unit
    if groupsize > 0:
        u = unit * groupsize // math.gcd(unit, groupsize)
    if dim % u == 0:
        return dim
    padded = ((dim + u - 1) // u) * u
    if (padded - dim) * 8 > dim:  # >12.5% waste: keep the natural size
        return dim
    return padded


def quantize_to_codes(W: jax.Array, scale: jax.Array, zero: jax.Array, bits: int):
    """Recover integer codes from a (quantize-dequantized) weight
    (reference pack path: quant.py:158 rounds (W + zero*scale)/scale).

    W: (N, K) dequantized weight; scale/zero: (num_groups, N).
    Returns (K, N) codes plus broadcast scale/zoff as (num_groups, N)."""
    Nn, K = W.shape
    ng = scale.shape[0]
    g = K // ng
    Wt = W.astype(jnp.float32).T  # (K, N)
    s = jnp.repeat(scale.astype(jnp.float32), g, axis=0)  # (K, N)
    z = jnp.repeat(zero.astype(jnp.float32), g, axis=0)
    codes = jnp.clip(jnp.round(Wt / s + z), 0, (1 << bits) - 1).astype(jnp.int32)
    return codes


def pack_quantized(
    Q: jax.Array,
    scale: jax.Array,
    zero: jax.Array,
    bits: int,
    groupsize: int = -1,
    bias: jax.Array | None = None,
    perm: jax.Array | None = None,
    actorder: bool = False,
    tp: int = 1,
) -> PackedWeight:
    """Pack a GPTQ-quantized weight for serving.

    Q: (N, K) dequantized weight (gptq output, original column order).
    scale/zero: (num_groups, N) grids from the solver.
    perm: column permutation the solver used (act-order); when given with
    actorder=True and groupsize>0, K is stored in permuted order and the
    layer applies x -> x[perm] at run time (grids are per permuted-position
    group only in the static_groups case; see gptq.py group_of()).
    tp: target tensor-parallel degree — pads stored dims so 1/tp shards
    slice on subblock boundaries (parallel/tp.py shard_map serving).
    """
    Nn, K = Q.shape
    if actorder and perm is not None and groupsize > 0:
        Qp = Q[:, perm]
        store_perm = perm
    else:
        Qp = Q
        store_perm = None
    codes = quantize_to_codes(Qp, scale, zero, bits)
    scale = scale.astype(jnp.float32)
    zoff = (scale * zero).astype(jnp.float32)
    # zero-pad to 512-multiples so the kernel gets large tiles (see class
    # docstring); pad scales are zero so padded rows/cols contribute 0
    unit = 512 * max(1, tp)
    Kp, Np = pad_dim(K, groupsize, unit), pad_dim(Nn, -1, unit)
    if (Kp, Np) != (K, Nn):
        codes = jnp.pad(codes, ((0, Kp - K), (0, Np - Nn)))
        ng_p = Kp // groupsize if groupsize > 0 else 1
        scale = jnp.pad(scale, ((0, ng_p - scale.shape[0]), (0, Np - Nn)))
        zoff = jnp.pad(zoff, ((0, ng_p - zoff.shape[0]), (0, Np - Nn)))
    words = pack_codes(codes, bits, groupsize)
    return PackedWeight(
        words=words,
        scale=scale,
        zoff=zoff,
        bias=None if bias is None else bias,
        perm=store_perm,
        bits=bits,
        K=K,
        N=Nn,
        groupsize=groupsize,
        fmt="uniform",
    )


def fuse_packed(pws: list, tp: int = 1) -> Optional["PackedWeight"]:
    """Concatenate several PackedWeights sharing one input (q/k/v, gate/up)
    along N into a single wider weight — one kernel launch instead of three,
    and a wider grid for the same bytes.

    Parts must agree on fmt/bits/groupsize/stored K and either all have no
    act-order perm or the identical perm (q/k/v share the calibration
    Hessian, so act-order produces the same permutation). The fused weight's
    N is the total STORED width: each part's pad columns compute exact
    zeros, so callers slice the logical columns back out per part.
    Returns None when the parts are not fusable.

    tp > 1 builds the SHARD-INTERLEAVED layout for shard_map tensor
    parallelism: N is ordered [p0_shard0, p1_shard0, ..., p0_shard1, ...]
    so slicing the fused N into tp equal chunks hands every shard the
    standard fused layout of its own column shards (per-part local width
    Np_i/tp). Such a weight is only meaningful sliced over tp shards."""
    p0 = pws[0]
    for pw in pws:
        if (pw.fmt != p0.fmt or pw.bits != p0.bits or pw.Kp != p0.Kp
                or pw.K != p0.K or pw.groupsize != p0.groupsize):
            return None
        if pw.bias is not None:
            # the fused weight is built bias-less; only the layer dict's
            # separate "b" entries are re-applied per part, so a bias baked
            # into the PackedWeight itself would silently vanish
            return None
        if (pw.perm is None) != (p0.perm is None):
            return None
        if pw.perm is not None and not bool(
                jnp.all(pw.perm == p0.perm)):
            return None
        if tp > 1 and pw.Np % tp:
            return None

    def cat(arrs, axis=-1):
        if tp == 1:
            return jnp.concatenate(arrs, axis=axis)
        chunks = [jnp.split(a, tp, axis=axis) for a in arrs]
        return jnp.concatenate(
            [c for s in range(tp) for c in (ch[s] for ch in chunks)],
            axis=axis)

    if p0.fmt == "bcq":
        words = (cat([pw.words[0] for pw in pws]),)
        alpha = cat([pw.alpha for pw in pws])
        scale = zoff = None
    else:
        words = tuple(cat(list(ws)) for ws in zip(*[pw.words for pw in pws]))
        scale = cat([pw.scale for pw in pws])
        zoff = cat([pw.zoff for pw in pws])
        alpha = None
    return PackedWeight(
        words=words, scale=scale, zoff=zoff, alpha=alpha, bias=None,
        perm=p0.perm, bits=p0.bits, K=p0.K, N=sum(pw.Np for pw in pws),
        groupsize=p0.groupsize, fmt=p0.fmt)


@jax.tree_util.register_dataclass
@dataclass
class PackedExperts:
    """A stacked bank of E uniform-grid packed weights sharing one format
    — the sub-byte serving layout for MoE expert stacks (models/moe.py).

    words — tuple of (E, Kp//P, Np) int32 byteplane field arrays (the
            per-expert planes of ops/pack.pack_codes, stacked on a leading
            expert dim so one Pallas grid serves the whole bank)
    scale — (E, ng, Np) f32 per-(expert, group) grids
    zoff  — (E, ng, Np) f32 scale*zero

    E is NOT stored: it derives from the arrays, so an expert-parallel
    shard's local (E/ep, ...) slice is a valid PackedExperts as-is.
    K/N are logical (in, out) dims per expert; stored dims may be padded
    like PackedWeight (pad grids are zero -> padded rows/cols contribute
    exactly 0)."""

    words: tuple[jax.Array, ...]
    scale: jax.Array
    zoff: jax.Array
    bits: int = field(default=4, metadata=dict(static=True))
    K: int = field(default=0, metadata=dict(static=True))
    N: int = field(default=0, metadata=dict(static=True))
    groupsize: int = field(default=-1, metadata=dict(static=True))

    @property
    def E(self) -> int:
        return self.words[0].shape[0]

    @property
    def Kp(self) -> int:
        fb = FIELD_SPLITS[self.bits][0][0]
        return self.words[0].shape[-2] * (32 // fb)

    @property
    def Np(self) -> int:
        return self.words[0].shape[-1]

    def expert(self, e) -> "PackedWeight":
        """One expert's weight as a PackedWeight view (e may be a traced
        index; static fields are shared across the bank)."""
        return PackedWeight(
            words=tuple(w[e] for w in self.words),
            scale=self.scale[e], zoff=self.zoff[e],
            bits=self.bits, K=self.K, N=self.N,
            groupsize=self.groupsize, fmt="uniform")


def pack_expert_stack(W: jax.Array, scale: jax.Array, zero: jax.Array,
                      bits: int, groupsize: int = -1) -> PackedExperts:
    """Pack an (E, N, K) expert weight stack for serving.

    W: per-expert (out, in) dequantized weights (GPTQ output or raw for
    RTN); scale/zero: (E, num_groups, N) per-(expert, group) grids. Every
    expert packs with the shared byteplane layout (pack_codes), padded to
    512-multiples like pack_quantized."""
    E, Nn, K = W.shape
    ng = scale.shape[1]
    codes = jax.vmap(lambda w, s, z: quantize_to_codes(w, s, z, bits))(
        W, scale, zero)  # (E, K, N)
    scale = scale.astype(jnp.float32)
    zoff = (scale * zero).astype(jnp.float32)
    Kp, Np = pad_dim(K, groupsize, 512), pad_dim(Nn, -1, 512)
    if Kp % 32:
        # pack_codes needs 32 | K; pad rows store code 0, which dequants
        # to -zoff — harmless because the runtime x pad rows are zero
        Kp = -(-Kp // 32) * 32
    if (Kp, Np) != (K, Nn):
        codes = jnp.pad(codes, ((0, 0), (0, Kp - K), (0, Np - Nn)))
        ng_p = Kp // groupsize if groupsize > 0 else 1
        scale = jnp.pad(scale,
                        ((0, 0), (0, ng_p - ng), (0, Np - Nn)))
        zoff = jnp.pad(zoff, ((0, 0), (0, ng_p - ng), (0, Np - Nn)))
    words = jax.vmap(lambda c: pack_codes(c, bits, groupsize))(codes)
    return PackedExperts(words=words, scale=scale, zoff=zoff, bits=bits,
                         K=K, N=Nn, groupsize=groupsize)


def pack_bcq(
    B: jax.Array,
    alpha: jax.Array,
    bias: jax.Array | None = None,
    groupsize: int = -1,
    tp: int = 1,
) -> PackedWeight:
    """Pack BCQ sign tensors for serving (reference: lut_gemm/quant.py:8-46).

    B: (N, num_groups, g, bits) in {-1,+1}; alpha: (N, num_groups, bits).
    Stored as (bits, K//32, N) blocked sign bitplanes (+1 -> bit set) and
    alpha (num_groups, bits, N)."""
    Nn, ng, g, bits = B.shape
    K = ng * g
    signs = (B.reshape(Nn, K, bits) > 0).astype(jnp.uint32)  # (N, K, bits)
    signs = jnp.transpose(signs, (2, 1, 0))  # (bits, K, N)
    gsz = g if groupsize != -1 else -1
    alpha_t = jnp.transpose(alpha.astype(jnp.float32), (1, 2, 0))  # (ng, bits, N)
    unit = 512 * max(1, tp)
    Kp, Np = pad_dim(K, gsz, unit), pad_dim(Nn, -1, unit)
    if (Kp, Np) != (K, Nn):
        signs = jnp.pad(signs, ((0, 0), (0, Kp - K), (0, Np - Nn)))
        ng_p = Kp // gsz if gsz > 0 else 1
        alpha_t = jnp.pad(
            alpha_t, ((0, ng_p - alpha_t.shape[0]), (0, 0), (0, Np - Nn)))
    planes = []
    for b in range(bits):
        (w,) = pack_codes(signs[b], 1, gsz)
        planes.append(w)
    words = jnp.stack(planes)  # (bits, Kp//32, Np)
    return PackedWeight(
        words=(words,),
        alpha=alpha_t,
        bias=bias,
        bits=bits,
        K=K,
        N=Nn,
        groupsize=g if groupsize != -1 else -1,
        fmt="bcq",
    )
