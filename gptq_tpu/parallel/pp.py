"""Pipeline parallelism: GPipe-style microbatch pipelining over a "pp"
mesh axis with shard_map + ppermute.

The reference's only way to span devices is naive layer placement with
host-driven activation movement (reference: opt.py:404-438 `opt_multigpu` +
`MoveModule`; its FP16 OPT-175B benchmark runs that way across 5 GPUs,
README.md:101-102). The TPU-native equivalent keeps the same
layer-partitioning idea but runs it as ONE jitted SPMD program: decoder
layers split into `pp` contiguous stages (one per device along the axis),
a batch is split into `n_micro` micro-batches, and every pipeline tick each
stage processes one micro-batch then hands its activations to the next
stage with `jax.lax.ppermute` over ICI/DCN — no host in the loop, and XLA
overlaps the permute with the next tick's compute. Autodiff runs straight
through the schedule (the transpose of ppermute is the reverse permute), so
the same machinery trains.

Scope: dense (training / recovery-finetune / eval) parameters. Serving uses
tensor parallelism (parallel/tp.py) — at decode the per-token latency of a
pipeline is the SUM of stage latencies, so PP buys capacity (a model too
big for one chip's HBM), not speed; that trade is exactly the reference's
multi-GPU benchmark configuration.

Composition: make_pp_mesh(pp, dp, tp) scales all three ways in one
program — dp pipeline replicas each run the GPipe schedule on their batch
shard (grads/metrics psum over "dp"), and each stage's linears
Megatron-shard over "tp" with psum epilogues inside the stage
(`finetune_cli --pp N --dp M --tp K`); exact loss+grad parity with the
flat single-device step is tested for the full (dp, pp, tp) mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gptq_tpu.models.common import (ArchSpec, block_forward, build_mask,
                                    embed_forward, head_forward, rope_tables)


def make_pp_mesh(pp: int, dp: int = 1, tp: int = 1, devices=None) -> Mesh:
    """pp-only 1-D mesh, a (dp, pp) 2-D mesh (dp pipeline replicas on
    batch shards, grads/metrics psum over dp), or the full (dp, pp, tp)
    3-D training mesh (each stage's linears additionally Megatron
    col/row-sharded over tp with psum epilogues — tp innermost so those
    psums ride the fastest ICI dimension)."""
    devices = devices if devices is not None else jax.devices()
    n = pp * dp * tp
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    if tp > 1:
        return Mesh(np.asarray(devices[:n]).reshape(dp, pp, tp),
                    ("dp", "pp", "tp"))
    if dp > 1:
        return Mesh(np.asarray(devices[:n]).reshape(dp, pp), ("dp", "pp"))
    return Mesh(np.asarray(devices[:pp]), ("pp",))


def _stack_trees(trees: list):
    """Stack a list of identically-structured pytrees leaf-wise (None
    leaves stay None)."""
    return jax.tree_util.tree_map(
        lambda *xs: None if xs[0] is None else jnp.stack(xs),
        *trees, is_leaf=lambda x: x is None)


def _mesh_tp(mesh: Mesh | None) -> str | None:
    if mesh is not None and "tp" in mesh.axis_names and mesh.shape["tp"] > 1:
        return "tp"
    return None


def _stage_specs(spec: ArchSpec, sample_layer: dict,
                 tp_axis: str | None) -> dict:
    """PartitionSpec tree for ONE stacked stage-layer dict (leaves carry
    leading (pp, lps) dims): stage axis over "pp", plus Megatron col/row
    shards over `tp_axis` for the per-block linears (dense training
    weights — (out, in))."""
    from gptq_tpu.parallel.mesh import sharding_rules

    rep_pp = jax.tree_util.tree_map(
        lambda v: None if v is None else P("pp"), sample_layer,
        is_leaf=lambda v: v is None)
    if tp_axis is None:
        return rep_pp
    rules = sharding_rules(spec)
    out = dict(rep_pp)
    for key, val in sample_layer.items():
        if key not in rules:
            continue
        kind = rules[key]
        wspec = (P("pp", None, tp_axis, None) if kind == "col"
                 else P("pp", None, None, tp_axis))
        d = {"w": wspec}
        if "b" in val:
            d["b"] = None if val["b"] is None else (
                P("pp", None, tp_axis) if kind == "col" else P("pp"))
        if "act_q" in val:
            d["act_q"] = None if val["act_q"] is None else {
                k: P("pp") for k in val["act_q"]}
        out[key] = d
    return out


def stack_stage_params(spec: ArchSpec, params: dict, pp: int,
                       mesh: Mesh | None = None) -> dict:
    """Standard params -> pipeline layout.

    `layers` (list of n_layers block dicts) becomes one pytree whose leaves
    carry leading (pp, layers_per_stage) axes; with a mesh, the stage axis
    is sharded over "pp" (each device holds only its stage's layers — the
    HBM-capacity win), each stage's linears additionally shard over "tp"
    when the mesh carries one, and embed/final_ln/lm_head replicate.
    """
    n_layers = len(params["layers"])
    if n_layers % pp:
        raise ValueError(f"n_layers={n_layers} must divide by pp={pp}")
    lps = n_layers // pp
    stages = _stack_trees([
        _stack_trees(params["layers"][s * lps:(s + 1) * lps])
        for s in range(pp)
    ])
    out = {"embed": params["embed"], "stages": stages,
           "final_ln": params.get("final_ln"),
           "lm_head": params.get("lm_head")}
    if mesh is not None:
        specs = _stage_specs(spec, params["layers"][0], _mesh_tp(mesh))
        rep_sh = NamedSharding(mesh, P())

        def place(x, ps):
            return None if x is None else jax.device_put(
                x, NamedSharding(mesh, ps))

        out["stages"] = jax.tree_util.tree_map(
            place, out["stages"], specs,
            is_leaf=lambda x: x is None)
        for k in ("embed", "final_ln", "lm_head"):
            out[k] = jax.tree_util.tree_map(
                lambda x: None if x is None else jax.device_put(x, rep_sh),
                out[k], is_leaf=lambda x: x is None)
    return out


def unstack_stage_params(spec: ArchSpec, stacked: dict) -> dict:
    """Inverse of stack_stage_params (for checkpoints / single-device
    eval)."""
    leaves = [x for x in jax.tree_util.tree_leaves(stacked["stages"])
              if x is not None]
    pp, lps = leaves[0].shape[:2]
    layers = []
    for s in range(pp):
        for i in range(lps):
            layers.append(jax.tree_util.tree_map(
                lambda x, s=s, i=i: None if x is None else x[s, i],
                stacked["stages"], is_leaf=lambda x: x is None))
    return {"embed": stacked["embed"], "layers": layers,
            "final_ln": stacked["final_ln"], "lm_head": stacked["lm_head"]}


def _micro_ce(spec: ArchSpec, hparams: dict, h: jax.Array,
              ids: jax.Array) -> jax.Array:
    """Mean next-token cross-entropy of one micro-batch's final hidden
    state (mirrors finetune.clm_loss)."""
    logits = head_forward(spec, hparams, h).astype(jnp.float32)
    logits = logits[:, :-1]
    targets = ids[:, 1:]
    logz = jax.nn.logsumexp(logits, axis=-1)
    tok = jnp.take_along_axis(logits, targets[..., None], axis=-1)[..., 0]
    return jnp.mean(logz - tok)


def _micro_acc(spec: ArchSpec, hparams: dict, h: jax.Array,
               ids: jax.Array) -> jax.Array:
    """Mean next-token top-1 accuracy of one micro-batch (mirrors
    finetune.clm_accuracy)."""
    logits = head_forward(spec, hparams, h)
    pred = jnp.argmax(logits[:, :-1], axis=-1)
    return jnp.mean((pred == ids[:, 1:]).astype(jnp.float32))


def _make_pp_metrics(spec: ArchSpec, mesh: Mesh, n_micro: int, axis: str,
                     micro_fns):
    """Shared GPipe scheduler: fn(stacked_params, batch) -> one mean per
    micro_fn, each micro_fn(spec, hparams, h, ids) scoring one micro-batch
    on the last stage. make_pp_loss grads flow through this; make_pp_eval
    reuses it with loss + accuracy."""
    pp = mesh.shape[axis]
    # a "dp" mesh axis (make_pp_mesh(pp, dp)) runs dp pipeline replicas
    # on batch shards (metrics/grads psum over it); a "tp" axis
    # additionally Megatron-shards each stage's linears (psum epilogues
    # inside block_forward)
    dp_axis = ("dp" if "dp" in mesh.axis_names and mesh.shape["dp"] > 1
               and axis != "dp" else None)
    dp = mesh.shape[dp_axis] if dp_axis else 1
    tp_axis = _mesh_tp(mesh)
    tp = mesh.shape[tp_axis] if tp_axis else 1
    fwd_perm = [(i, i + 1) for i in range(pp - 1)]
    n_out = len(micro_fns)

    def metrics_fn(stacked: dict, batch: jax.Array) -> jax.Array:
        B, T = batch.shape
        if B % (n_micro * dp):
            raise ValueError(
                f"batch {B} must divide by n_micro={n_micro} x dp={dp}")
        mb = B // n_micro
        x = batch.reshape(n_micro, mb, T)
        hparams = {"embed": stacked["embed"],
                   "final_ln": stacked["final_ln"],
                   "lm_head": stacked["lm_head"]}
        emb_dtype = stacked["embed"]["tokens"].dtype

        def shmap_body(stages, embed, final_ln, lm_head, xm):
            s = jax.lax.axis_index(axis)
            hp = {"embed": embed, "final_ln": final_ln, "lm_head": lm_head}
            mbl = xm.shape[1]  # this replica's micro-batch rows (mb / dp)
            positions = jnp.broadcast_to(jnp.arange(T), (mbl, T))
            # under tp the mask carries this shard's alibi slope slice
            mask = build_mask(spec, T, T, tp_axis, tp)
            rope = rope_tables(spec, positions) if spec.pos == "rope" else None
            # this device's (lps, ...) stage slice (leading pp axis is 1)
            local = jax.tree_util.tree_map(
                lambda v: None if v is None else v[0], stages,
                is_leaf=lambda v: v is None)

            def stage_apply(h):
                def body(hc, lp):
                    lst: list = []
                    out, _, _ = block_forward(spec, lp, hc,
                                              positions=positions,
                                              mask=mask, rope=rope,
                                              tp_axis=tp_axis,
                                              moe_aux=lst)
                    aux = lst[0] if lst else jnp.zeros((), jnp.float32)
                    return out.astype(hc.dtype), aux

                h, auxs = jax.lax.scan(body, h, local)
                return h, jnp.sum(auxs)

            def tick(carry, t):
                recv, sums, aux_sum = carry
                ids_in = xm[jnp.clip(t, 0, n_micro - 1)]
                emb = embed_forward(spec, hp, ids_in, positions)
                inp = jnp.where(s == 0, emb.astype(emb_dtype), recv)
                h, aux = stage_apply(inp)
                m_out = t - (pp - 1)
                ids_out = xm[jnp.clip(m_out, 0, n_micro - 1)]
                vals = jnp.stack([fn(spec, hp, h, ids_out)
                                  for fn in micro_fns])
                use = jnp.logical_and(s == pp - 1, m_out >= 0)
                sums = sums + jnp.where(use, vals, 0.0)
                # MoE aux loss: EVERY stage contributes its own layers'
                # load-balancing terms, valid only for ticks where this
                # stage processed a real micro-batch (t - s in range)
                m_here = t - s
                aux_ok = jnp.logical_and(m_here >= 0, m_here < n_micro)
                aux_sum = aux_sum + jnp.where(aux_ok, aux, 0.0)
                sent = (jax.lax.ppermute(h, axis, fwd_perm) if pp > 1 else h)
                return (sent, sums, aux_sum), None

            # the carry is device-varying (each stage holds different
            # activations, each dp replica different data); mark the zero
            # init as such for the VMA checker
            vaxes = (axis,) + ((dp_axis,) if dp_axis else ())
            init = jax.lax.pcast(
                (jnp.zeros((mbl, T, spec.hidden), emb_dtype),
                 jnp.zeros((n_out,), jnp.float32),
                 jnp.zeros((), jnp.float32)), vaxes, to="varying")
            (_, sums, aux_sum), _ = jax.lax.scan(
                tick, init, jnp.arange(n_micro + pp - 1))
            # loss/acc: only the last stage accumulated (psum over pp
            # replicates the total); aux: every stage contributed its
            # layers (psum over pp sums them). dp sums the replicas'
            # batch-shard means. The aux mean divides by the ROUTED layer
            # count, matching the flat clm_loss's mean over layers.
            out = jax.lax.psum(
                jnp.concatenate([sums, aux_sum[None]]), vaxes)
            out = out / (n_micro * dp)
            return jnp.concatenate(
                [out[:n_out], out[n_out:] / max(1, spec.n_layers)])

        # the stacked stage tree has one layer dict's structure (leaves
        # carry leading (pp, lps) dims), which is what _stage_specs walks
        stage_specs = _stage_specs(spec, stacked["stages"], tp_axis)
        rep = jax.tree_util.tree_map(
            lambda v: None if v is None else P(),
            (stacked["embed"], stacked["final_ln"], stacked["lm_head"]),
            is_leaf=lambda v: v is None)
        return shard_map(
            shmap_body, mesh=mesh,
            in_specs=(stage_specs, *rep,
                      P(None, dp_axis) if dp_axis else P()),
            out_specs=P(),
        )(stacked["stages"], stacked["embed"], stacked["final_ln"],
          stacked["lm_head"], x)

    return metrics_fn


def make_pp_loss(spec: ArchSpec, mesh: Mesh, n_micro: int, axis: str = "pp",
                 moe_aux_weight: float = 0.0):
    """loss(stacked_params, batch) with the GPipe schedule inside one
    shard_map: n_micro + pp - 1 ticks; at tick t stage s processes
    micro-batch t - s (stage 0 embeds micro t; the last stage scores micro
    t - (pp-1)); activations ppermute one stage forward between ticks.
    Warmup/drain ticks run on zero activations (their results are masked
    out of the loss) — the standard bubble, n_micro >> pp amortizes it."""
    metrics = _make_pp_metrics(spec, mesh, n_micro, axis, (_micro_ce,))

    def loss_fn(stacked: dict, batch: jax.Array) -> jax.Array:
        out = metrics(stacked, batch)
        loss = out[0]
        if moe_aux_weight and spec.n_experts:
            # Switch load-balancing term, collected per stage through the
            # schedule (matches finetune.clm_loss's flat-path aux)
            loss = loss + moe_aux_weight * out[1]
        return loss

    return loss_fn


def make_pp_eval(spec: ArchSpec, mesh: Mesh, n_micro: int, axis: str = "pp"):
    """eval(stacked_params, batch) -> (mean CE loss, mean top-1 accuracy)
    through the same stage-sharded GPipe schedule as training — each device
    only ever holds its own stage's layers, so evaluation fits in the same
    HBM budget the pipeline was chosen for (never gathers the full model
    onto one device)."""
    metrics = _make_pp_metrics(spec, mesh, n_micro, axis,
                               (_micro_ce, _micro_acc))

    def eval_fn(stacked: dict, batch: jax.Array):
        out = metrics(stacked, batch)
        return out[0], out[1]

    return eval_fn


def make_pp_train_step(spec: ArchSpec,
                       optimizer: optax.GradientTransformation,
                       mesh: Mesh, n_micro: int, axis: str = "pp",
                       moe_aux_weight: float = 0.01):
    """(init_state, step) over pipeline-layout params: step(stacked,
    opt_state, batch) -> (stacked, opt_state, loss). Grads flow backward
    through the ppermute schedule (reverse permutes); optimizer state
    inherits each leaf's stage sharding. MoE models train with the
    load-balancing aux loss like the flat path (ignored when dense)."""
    loss_fn = make_pp_loss(
        spec, mesh, n_micro, axis,
        moe_aux_weight=moe_aux_weight if spec.n_experts else 0.0)

    def init_state(stacked):
        return optimizer.init(stacked)

    @jax.jit
    def step(stacked, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(stacked, batch)
        updates, opt_state = optimizer.update(grads, opt_state, stacked)
        stacked = optax.apply_updates(stacked, updates)
        return stacked, opt_state, loss

    return init_state, step
