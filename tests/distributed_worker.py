"""One process of the 2-process jax.distributed CPU run (VERDICT r2 #5).

Launched by tests/test_distributed.py with argv = (process_id,
num_processes, coordinator_port). Each process exposes 4 virtual CPU
devices; together they form the (dp=2, tp=4) host mesh of
parallel.distributed.make_host_mesh — dp rows land on process
boundaries (the DCN axis on real pods), tp inside a process (ICI).

Runs one dp-over-processes train step and one GSPMD tensor-parallel
serve forward, both through cross-process collectives, and prints the
results for the parent to compare across processes. All global arrays
are BUILT inside jit (out_shardings) — the multi-process idiom; host
device_put cannot target non-addressable shards.
"""

import os
import sys

pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from gptq_tpu.parallel.distributed import (init_distributed,  # noqa: E402
                                           make_host_mesh, scaling_report)

init_distributed(f"localhost:{port}", nprocs, pid)
assert jax.process_count() == nprocs, jax.process_count()
assert len(jax.devices()) == 4 * nprocs, len(jax.devices())

mesh = make_host_mesh(tp_per_host=4)
assert dict(mesh.shape) == {"dp": nprocs, "tp": 4}
# dp rows must align with process boundaries (DCN axis)
row_procs = {d.process_index for d in mesh.devices[pid].ravel()}
assert row_procs == {pid}, row_procs

from gptq_tpu.finetune import make_optimizer, make_train_step  # noqa: E402
from gptq_tpu.models.common import (ArchSpec, init_params,  # noqa: E402
                                    model_forward)
from gptq_tpu.parallel.mesh import param_specs  # noqa: E402

spec = ArchSpec(arch="llama", n_layers=2, hidden=64, n_heads=4,
                n_kv_heads=4, ffn=128, vocab=128, max_pos=64, act="silu",
                pos="rope", norm_type="rmsnorm", linear_bias=False,
                tie_embeddings=False)

specs = param_specs(spec, init_params(spec, jax.random.PRNGKey(0)))
shardings = jax.tree_util.tree_map(
    lambda s: NamedSharding(mesh, s if s is not None else P()),
    specs, is_leaf=lambda v: v is None or isinstance(v, P))
with mesh:
    params = jax.jit(lambda: init_params(spec, jax.random.PRNGKey(0)),
                     out_shardings=shardings)()

opt = make_optimizer("adafactor", lr=1e-3)
init, step = make_train_step(spec, opt, mesh=mesh)
opt_state = jax.jit(init)(params)
batch = jax.jit(
    lambda: jax.random.randint(jax.random.PRNGKey(1), (nprocs * 2, 32),
                               0, spec.vocab),
    out_shardings=NamedSharding(mesh, P("dp", None)))()
params, opt_state, loss = step(params, opt_state, batch)
loss_v = float(np.asarray(loss))
assert np.isfinite(loss_v), loss_v

# GSPMD tensor-parallel serve forward across processes: params stay on
# their tp shards, logits gather replicated
ids = jax.jit(
    lambda: jax.random.randint(jax.random.PRNGKey(2), (1, 8), 0, spec.vocab),
    out_shardings=NamedSharding(mesh, P()))()
serve = jax.jit(lambda p, i: model_forward(spec, p, i)[0],
                out_shardings=NamedSharding(mesh, P()))
logits = serve(params, ids)
lsum = float(np.asarray(jnp.sum(logits.astype(jnp.float32))))
assert np.isfinite(lsum)

rep = scaling_report(step, (params, opt_state, batch), mesh, iters=3)
assert rep["devices"] == 4 * nprocs

print(f"DIST_OK pid={pid} loss={loss_v:.6f} lsum={lsum:.4f} "
      f"devices={rep['devices']}")
