"""Multi-host runtime initialization.

The reference's only multi-host hook is HF Trainer's torch.distributed and
the `_mp_fn` xla_spawn entry (reference: finetune/train.py:653-655,286-290).
TPU-native equivalent: `jax.distributed.initialize` + a (dcn_data,
ici_tensor) mesh — data parallel across hosts over DCN, tensor parallel
within a slice over ICI (SURVEY.md §2.3 / §5 plan).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def init_distributed(coordinator: str | None = None, num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Initialize the multi-host runtime (no-op if single-process)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_host_mesh(tp_per_host: int | None = None) -> Mesh:
    """Mesh with data-parallel over hosts (DCN) and tensor-parallel within a
    host's chips (ICI): axes ("dp", "tp")."""
    devices = np.asarray(jax.devices())
    n_hosts = jax.process_count()
    per_host = len(devices) // n_hosts
    tp = tp_per_host or per_host
    dp = len(devices) // tp
    return Mesh(devices.reshape(dp, tp), ("dp", "tp"))


def scaling_report(step_fn, args, mesh: Mesh, iters: int = 10) -> dict:
    """Measure per-step wall time under the mesh; callers compare 1-chip vs
    N-chip runs for the >=80% scaling-efficiency target (BASELINE.json)."""
    import time

    import numpy as np

    out = step_fn(*args)
    jax.block_until_ready(out)
    # force a host transfer: relayed backends can return early
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = step_fn(*args)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        times.append(time.perf_counter() - t0)
    return {
        "median_s": float(np.median(times)),
        "devices": mesh.devices.size,
        "mesh": dict(mesh.shape),
    }
