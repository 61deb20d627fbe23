"""Chip compile-check + microbench of the batched-expert packed kernel
(round 3, VERDICT #3): Mixtral-8x7B expert shapes (E=8, D=4096, F=14336).
Compares the expert-stream cost of int8 codes+scales (round-2 serving
format, XLA einsum) vs the 4-bit PackedExperts bank (batched Pallas grid)
vs the selective top-2 decode path (reads only k/E of the bank).
Run: PYTHONPATH=/root/repo:/root/.axon_site /opt/venv/bin/python experiments/r3_packed_experts_chip.py
"""
import numpy as np
import jax
import jax.numpy as jnp

from gptq_tpu.models.moe import _packed_expert_ffn, _rtn_expert_grids
from gptq_tpu.ops.kernel_bench import chained_seconds
from gptq_tpu.ops.pack import pack_expert_stack
from gptq_tpu.ops.qmatmul import dequant_experts, expert_dequant_matmul

# --- correctness at small shapes (oracle materializes (E, K, N) f32) ---
rng = np.random.default_rng(0)
E, F, D = 4, 2048, 1024
W = jnp.asarray(rng.normal(size=(E, F, D)).astype(np.float32) * 0.1)
s, z = _rtn_expert_grids(W, 4, -1)
pe = pack_expert_stack(W, s, z, 4, -1)
x = jnp.asarray(rng.normal(size=(3, D)).astype(np.float32))
got = jax.block_until_ready(expert_dequant_matmul(x, pe))
want = jnp.einsum("mk,ekn->emn", x, dequant_experts(pe))
rel = np.abs(np.asarray(got) - np.asarray(want)).max() / np.abs(np.asarray(want)).max()
print(f"batched expert kernel vs oracle (shared x): {rel:.2e}")
assert rel < 2e-2, rel  # bf16 MXU products
xe = jnp.asarray(rng.normal(size=(E, 3, D)).astype(np.float32))
got = jax.block_until_ready(expert_dequant_matmul(xe, pe))
want = jnp.einsum("emk,ekn->emn", xe, dequant_experts(pe))
rel = np.abs(np.asarray(got) - np.asarray(want)).max() / np.abs(np.asarray(want)).max()
print(f"batched expert kernel vs oracle (per-expert x): {rel:.2e}")
assert rel < 2e-2, rel  # bf16 MXU products

# --- Mixtral-8x7B shapes ---
E, F, D = 8, 14336, 4096
Wb = jnp.asarray(rng.normal(size=(E, F, D)).astype(np.float32) * 0.05)
s, z = _rtn_expert_grids(Wb, 4, -1)
gate = pack_expert_stack(Wb, s, z, 4, -1)
up = pack_expert_stack(Wb, s, z, 4, -1)
sd, zd = _rtn_expert_grids(jnp.swapaxes(Wb, 1, 2) * 1.0, 4, -1)
down = pack_expert_stack(jnp.swapaxes(Wb, 1, 2), sd, zd, 4, -1)
# int8 comparison stack (round-2 format): codes + per-row scales
qmax = 127.0
sc8 = jnp.max(jnp.abs(Wb), axis=-1) / qmax + 1e-12  # (E, F)
c8 = jnp.clip(jnp.round(Wb / sc8[..., None]), -127, 127).astype(jnp.int8)
xt = jnp.asarray(rng.normal(size=(1, D)).astype(np.float32)).astype(jnp.bfloat16)

def int8_gate(c, c8, sc8):
    # the round-2 dropless scan body, one projection, all experts
    def body(acc, xe):
        cw, sw = xe
        w = cw.astype(jnp.bfloat16) * sw[..., None].astype(jnp.bfloat16)
        g = jnp.einsum("nd,fd->nf", c, w, preferred_element_type=jnp.float32)
        return acc + g, None
    acc, _ = jax.lax.scan(body, jnp.zeros((1, F), jnp.float32), (c8, sc8))
    return acc

def packed_gate(c, gate):
    return jnp.sum(expert_dequant_matmul(c, gate), axis=0)

act = jax.nn.silu
wflat = jnp.zeros((1, E), jnp.float32).at[0, 1].set(0.6).at[0, 5].set(0.4)

def ffn_all(c, ex):
    return _packed_expert_ffn(ex, c, wflat, act, top_k=0)[:, :D]

def ffn_topk(c, ex):
    return _packed_expert_ffn(ex, c, wflat, act, top_k=2)[:, :D]

ex = {"gate": gate, "up": up, "down": down}
for name, fn, args in [("int8 gate stream (all E)", int8_gate, (c8, sc8)),
                       ("packed4 gate kernel (all E)", packed_gate, (gate,)),
                       ("packed4 FFN all-E (batched kernel)", ffn_all, (ex,)),
                       ("packed4 FFN top-2 (selective)", ffn_topk, (ex,))]:
    t = chained_seconds(fn, xt, *args, iters=16)
    print(f"{name}: {t*1e3:.3f} ms")
print("PASS")
