"""Record a relative-scaling smoke table for the sharded step functions
on the virtual CPU mesh (VERDICT r2 #5 / BASELINE.json >=80% target
plumbing): tp decode, sp SPCache decode, and ep MoE forward at 1/2/4/8
devices, each through parallel.distributed.scaling_report, written to
results/scaling_dryrun.json.

CPU-mesh numbers are NOT performance (virtual devices share host cores;
expect inverse scaling) — this exercises the measurement plumbing and
records that every step function builds and runs at every width, so the
same harness can produce the real table the day >= 2 chips exist.
Its JSON is deliberately NOT checked in: the repo's multi-chip scaling
evidence is results/scaling_hlo.json (scripts/scaling_hlo.py) — the
compiled programs' communication volumes, which are host-independent.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     /opt/venv/bin/python scripts/scaling_dryrun.py [--iters N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--out", default="results/scaling_dryrun.json")
    args = ap.parse_args(argv)

    from gptq_tpu.models.common import ArchSpec, KVCache, init_params
    from gptq_tpu.parallel.distributed import scaling_report

    devs = jax.devices()
    spec = ArchSpec(arch="llama", n_layers=2, hidden=128, n_heads=8,
                    n_kv_heads=8, ffn=256, vocab=256, max_pos=128,
                    act="silu", pos="rope", norm_type="rmsnorm",
                    linear_bias=False, tie_embeddings=False)
    moe_spec = ArchSpec(arch="llama", n_layers=2, hidden=128, n_heads=8,
                        n_kv_heads=8, ffn=128, vocab=256, max_pos=128,
                        act="silu", pos="rope", norm_type="rmsnorm",
                        linear_bias=False, tie_embeddings=False,
                        n_experts=8, expert_top_k=2)
    report: dict = {"note": "virtual CPU mesh — plumbing smoke, not perf",
                    "tp_decode": {}, "sp_decode": {}, "ep_forward": {}}

    for n in (1, 2, 4, 8):
        if len(devs) < n:
            break
        # tp shard_map decode step
        from gptq_tpu.parallel.mesh import make_mesh
        from gptq_tpu.parallel.tp import make_tp_decode_step

        params = init_params(spec, jax.random.PRNGKey(0))
        mesh = make_mesh(tp=n, dp=1, devices=devs[:n])
        local, step = make_tp_decode_step(spec, params, mesh)
        cache = KVCache.init(spec, 1, 32, jnp.float32)
        tok = jnp.asarray([[1]])
        report["tp_decode"][n] = scaling_report(
            lambda: step(local, cache, tok), (), mesh, iters=args.iters)

        # sp SPCache decode step
        from gptq_tpu.parallel.sp import (make_sp_cache_prefill,
                                          make_sp_decode_step, make_sp_mesh)

        sp_mesh = make_sp_mesh(n, devices=devs[:n])
        prefill = make_sp_cache_prefill(spec, params, sp_mesh, max_len=32)
        ids = jnp.asarray(np.random.default_rng(0).integers(
            0, spec.vocab, size=(1, 8)))
        _, spc = prefill(ids)
        sp_step = make_sp_decode_step(spec, params, sp_mesh, spc.meta,
                                      check_capacity=False)
        report["sp_decode"][n] = scaling_report(
            lambda: sp_step(spc, tok), (), sp_mesh, iters=args.iters)

        # ep MoE forward
        from gptq_tpu.parallel.ep import make_ep_forward, make_ep_mesh

        mparams = init_params(moe_spec, jax.random.PRNGKey(1))
        ep_mesh = make_ep_mesh(n, devices=devs[:n])
        fwd = make_ep_forward(moe_spec, mparams, ep_mesh)
        eids = jnp.asarray(np.random.default_rng(1).integers(
            0, moe_spec.vocab, size=(2, 16)))
        report["ep_forward"][n] = scaling_report(
            lambda: fwd(mparams, eids), (), ep_mesh, iters=args.iters)
        print(f"{n} devices: tp {report['tp_decode'][n]['median_s']*1e3:.2f}"
              f" ms, sp {report['sp_decode'][n]['median_s']*1e3:.2f} ms,"
              f" ep {report['ep_forward'][n]['median_s']*1e3:.2f} ms")

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
