"""Recovery fine-tuning harness (CLM) — the reference's finetune/train.py
counterpart, TPU-native.

The reference wraps HF Trainer (reference: finetune/train.py:245-650,
recipe train.sh: adafactor, bf16, block 2048). Here the train step is one
jitted, mesh-sharded program: CLM cross-entropy + optax (adafactor or
adamw), dp-sharded batch, tp-sharded weights — the `_mp_fn` xla_spawn hook
(finetune/train.py:653-655) becomes `jax.distributed.initialize` +
`make_mesh`.
"""

from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gptq_tpu.models.common import ArchSpec, model_forward
from gptq_tpu.parallel.mesh import param_specs


def clm_loss(spec: ArchSpec, params: dict, batch: jax.Array,
             moe_aux_weight: float = 0.0) -> jax.Array:
    """Mean next-token cross-entropy over a (B, T) id batch.

    moe_aux_weight > 0 (training MoE models) adds the Switch
    load-balancing loss averaged over the routed layers so the router
    keeps experts balanced; eval keeps the pure cross-entropy (0.0)."""
    aux: list | None = [] if (moe_aux_weight and spec.n_experts) else None
    logits, _ = model_forward(spec, params, batch, moe_aux=aux)
    logits = logits[:, :-1].astype(jnp.float32)
    targets = batch[:, 1:]
    logz = jax.nn.logsumexp(logits, axis=-1)
    tok = jnp.take_along_axis(logits, targets[..., None], axis=-1)[..., 0]
    loss = jnp.mean(logz - tok)
    if aux:
        loss = loss + moe_aux_weight * jnp.mean(jnp.stack(aux))
    return loss


def clm_accuracy(spec: ArchSpec, params: dict, batch: jax.Array) -> jax.Array:
    """Next-token argmax accuracy (the reference Trainer's eval metric,
    finetune/train.py compute_metrics + preprocess_logits_for_metrics)."""
    logits, _ = model_forward(spec, params, batch)
    pred = jnp.argmax(logits[:, :-1], axis=-1)
    return jnp.mean((pred == batch[:, 1:]).astype(jnp.float32))


def make_schedule(lr: float, kind: str = "constant", total_steps: int = 0,
                  warmup_steps: int = 0):
    """LR schedule (reference: HF Trainer --lr_scheduler_type/--warmup_steps,
    default linear decay with warmup)."""
    if kind == "constant" and not warmup_steps:
        return lr
    if kind == "linear":
        decay = optax.linear_schedule(
            lr, 0.0, max(1, total_steps - warmup_steps))
    elif kind == "cosine":
        decay = optax.cosine_decay_schedule(
            lr, max(1, total_steps - warmup_steps))
    else:
        decay = optax.constant_schedule(lr)
    if warmup_steps:
        warm = optax.linear_schedule(0.0, lr, warmup_steps)
        return optax.join_schedules([warm, decay], [warmup_steps])
    return decay


def make_optimizer(name: str = "adafactor", lr: float = 2e-5,
                   schedule: str = "constant", total_steps: int = 0,
                   warmup_steps: int = 0, grad_accum: int = 1
                   ) -> optax.GradientTransformation:
    """grad_accum > 1 wraps the optimizer in optax.MultiSteps: the train
    step is called per micro-batch and applies updates every grad_accum
    calls (reference: --gradient_accumulation_steps). total_steps and
    warmup_steps are MICRO-step counts (what the training loop iterates);
    MultiSteps advances the schedule once per optimizer update, so the
    horizons convert to optimizer steps here."""
    if grad_accum > 1:
        total_steps = max(1, total_steps // grad_accum)
        warmup_steps = warmup_steps // grad_accum
    sched = make_schedule(lr, schedule, total_steps, warmup_steps)
    opt = (optax.adafactor(learning_rate=sched) if name == "adafactor"
           else optax.adamw(learning_rate=sched))
    if grad_accum > 1:
        opt = optax.MultiSteps(opt, every_k_schedule=grad_accum)
    return opt


def save_opt_state(path: str, opt_state) -> None:
    """Persist an optax state pytree as a flat npz (leaves in tree order).
    Resume parity with the reference Trainer's optimizer.pt
    (finetune/train.py:601-607): without this, LR schedules and moment
    estimates restart from zero on resume."""
    import numpy as np

    leaves = jax.tree_util.tree_leaves(opt_state)
    np.savez(path, **{f"l{i}": np.asarray(l) for i, l in enumerate(leaves)})


def load_opt_state(path: str, opt_state):
    """Restore leaves saved by save_opt_state into the structure of a
    freshly-initialized opt_state. Returns the restored state, or the
    input unchanged (with a warning) on structure mismatch."""
    import numpy as np

    leaves, treedef = jax.tree_util.tree_flatten(opt_state)
    with np.load(path) as z:
        saved = [z[f"l{i}"] for i in range(len(z.files))]
    if len(saved) != len(leaves):
        print("opt_state structure mismatch; optimizer state not restored")
        return opt_state
    restored = [jnp.asarray(s, l.dtype) if hasattr(l, "dtype") else type(l)(s)
                for s, l in zip(saved, leaves)]
    return jax.tree_util.tree_unflatten(treedef, restored)


def make_train_step(spec: ArchSpec, optimizer: optax.GradientTransformation,
                    mesh: Mesh | None = None,
                    moe_aux_weight: float = 0.01):
    """Returns (init_state, train_step). With a mesh, params follow the TP
    rules of parallel.mesh and the batch is dp-sharded; XLA emits the
    psum/all-reduce collectives from the shardings. MoE models train with
    the load-balancing aux loss (moe_aux_weight; ignored when dense)."""

    def init_state(params):
        opt_state = optimizer.init(params)
        return opt_state

    def _step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(
            partial(clm_loss, spec,
                    moe_aux_weight=moe_aux_weight if spec.n_experts else 0.0)
        )(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    if mesh is None:
        return init_state, jax.jit(_step)

    # params arrive pre-sharded (parallel.mesh.shard_params); constrain the
    # batch to the dp axis and let XLA propagate the rest
    batch_sharding = NamedSharding(mesh, P("dp", None))

    @jax.jit
    def step(params, opt_state, batch):
        batch = jax.lax.with_sharding_constraint(batch, batch_sharding)
        return _step(params, opt_state, batch)

    return init_state, step
