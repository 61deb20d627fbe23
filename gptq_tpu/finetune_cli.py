"""Recovery fine-tuning driver (reference: finetune/train.py:245-650).

The reference wraps HF Trainer; here the loop is explicit: tokenize ->
group_texts(block) -> train steps with optax -> periodic eval
(perplexity = exp(eval_loss), reference: train.py:622-636) -> checkpoint
save/resume (reference: train.py:293-306,601-607).

Recipe parity (reference finetune/train.sh): adafactor, block 2048,
per-device batch via --batch_size, wikitext-2 dataset.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def group_texts(token_stream: np.ndarray, block_size: int) -> np.ndarray:
    """Concatenate-and-chunk (reference: finetune/train.py group_texts)."""
    total = (len(token_stream) // block_size) * block_size
    return token_stream[:total].reshape(-1, block_size)


def latest_checkpoint(out_dir: str) -> str | None:
    """(reference: get_last_checkpoint use at train.py:293-306)."""
    if not os.path.isdir(out_dir):
        return None
    cks = [d for d in os.listdir(out_dir) if d.startswith("checkpoint-")]
    if not cks:
        return None
    return os.path.join(out_dir, max(cks, key=lambda d: int(d.split("-")[1])))


def main(argv=None) -> int:
    p = argparse.ArgumentParser("gptq_tpu.finetune")
    p.add_argument("--model_name_or_path", required=True)
    p.add_argument("--dataset_name", default="wikitext")
    p.add_argument("--dataset_config_name", default="wikitext-2-raw-v1")
    p.add_argument("--block_size", type=int, default=2048)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--learning_rate", type=float, default=2e-5)
    p.add_argument("--lr_scheduler_type", default="constant",
                   choices=["constant", "linear", "cosine"])
    p.add_argument("--warmup_steps", type=int, default=0)
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--optim", default="adafactor", choices=["adafactor", "adamw"])
    p.add_argument("--num_train_epochs", type=float, default=1.0)
    p.add_argument("--max_steps", type=int, default=-1)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--bf16", action="store_true",
                   help="train in bfloat16 (reference recipe: "
                        "--torch_dtype bfloat16 --bf16, finetune/train.sh)")
    p.add_argument("--save_strategy", default="steps",
                   choices=["steps", "epoch"],
                   help="epoch = checkpoint at epoch boundaries "
                        "(reference train.sh save_strategy)")
    p.add_argument("--save_total_limit", type=int, default=0,
                   help="keep only the newest N checkpoints (0 = all; "
                        "reference train.sh --save_total_limit)")
    p.add_argument("--save_steps", type=int, default=500)
    p.add_argument("--eval_steps", type=int, default=500)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--dp", type=int, default=1)
    p.add_argument("--pp", type=int, default=1,
                   help="pipeline stages (GPipe microbatch schedule; "
                        "layers shard by stage — composes with --dp as dp "
                        "pipeline replicas and with --tp as Megatron "
                        "shards inside each stage)")
    p.add_argument("--pp_microbatches", type=int, default=0,
                   help="micro-batches per step under --pp "
                        "(default: batch_size/dp, i.e. micro size 1 "
                        "per replica)")
    p.add_argument("--overwrite_output_dir", action="store_true")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from gptq_tpu.finetune import (clm_accuracy, clm_loss, load_opt_state,
                                   make_optimizer, make_train_step,
                                   save_opt_state)
    from gptq_tpu.io import load_checkpoint, save_checkpoint
    from gptq_tpu.models.convert import params_from_dir

    from transformers import AutoTokenizer
    from datasets import load_dataset

    spec, params = params_from_dir(args.model_name_or_path)
    if args.bf16:
        params = jax.tree_util.tree_map(
            lambda v: v.astype(jnp.bfloat16)
            if jnp.issubdtype(jnp.asarray(v).dtype, jnp.floating) else v,
            params)
    tokenizer = AutoTokenizer.from_pretrained(args.model_name_or_path, use_fast=False)

    raw = load_dataset(args.dataset_name, args.dataset_config_name)
    text_col = "text" if "text" in raw["train"].column_names else raw["train"].column_names[0]
    train_tokens = np.asarray(
        tokenizer("\n\n".join(raw["train"][text_col])).input_ids, dtype=np.int32)
    eval_tokens = np.asarray(
        tokenizer("\n\n".join(raw["validation"][text_col])).input_ids, dtype=np.int32)
    train_blocks = group_texts(train_tokens, args.block_size)
    eval_blocks = group_texts(eval_tokens, args.block_size)

    mesh = None
    if args.pp == 1 and args.tp * args.dp > 1:
        from gptq_tpu.parallel.mesh import make_mesh, shard_params

        mesh = make_mesh(tp=args.tp, dp=args.dp)
        params = shard_params(spec, params, mesh)

    # pipeline parallelism: layers shard by stage over a "pp" mesh axis and
    # train through the GPipe microbatch schedule (parallel/pp.py) —
    # capacity scaling for models too large for one device's HBM (the
    # reference's multi-GPU layer-placement use case, opt.py:404-438)
    pp_mesh = None
    to_flat = lambda p: p  # noqa: E731 — identity outside --pp
    if args.pp > 1:
        from gptq_tpu.parallel.pp import (make_pp_mesh, make_pp_train_step,
                                          stack_stage_params,
                                          unstack_stage_params)

        pp_mesh = make_pp_mesh(args.pp, dp=args.dp, tp=args.tp)
        # each dp replica pipelines batch_size/dp rows; default micro
        # size 1 per replica so B % (n_micro * dp) == 0 out of the box
        n_micro = args.pp_microbatches or max(1, args.batch_size // args.dp)
        params = stack_stage_params(spec, params, args.pp, pp_mesh)
        to_flat = lambda p: unstack_stage_params(spec, p)  # noqa: E731

    rng = np.random.default_rng(args.seed)
    steps_per_epoch = len(train_blocks) // args.batch_size
    total_steps = (args.max_steps if args.max_steps > 0
                   else int(args.num_train_epochs * steps_per_epoch))

    opt = make_optimizer(args.optim, lr=args.learning_rate,
                         schedule=args.lr_scheduler_type,
                         total_steps=total_steps,
                         warmup_steps=args.warmup_steps,
                         grad_accum=args.gradient_accumulation_steps)
    if pp_mesh is not None:
        init, step = make_pp_train_step(spec, opt, pp_mesh, n_micro)
    else:
        init, step = make_train_step(spec, opt, mesh=mesh)
    opt_state = init(params)

    start_step = 0
    resume = latest_checkpoint(args.output_dir)
    if resume and not args.overwrite_output_dir:
        from gptq_tpu.io import conform_params

        spec, loaded, _ = load_checkpoint(os.path.join(resume, "model"))
        # the optimizer state above was built on the LIVE params tree;
        # conform the reloaded arrays to that exact structure (npz drops
        # None leaves and bias normalization can add keys)
        params = conform_params(to_flat(params), loaded)
        if pp_mesh is not None:  # checkpoints store the flat layout
            params = stack_stage_params(spec, params, args.pp, pp_mesh)
        elif mesh is not None:
            from gptq_tpu.parallel.mesh import shard_params as _shard

            params = _shard(spec, params, mesh)
        with open(os.path.join(resume, "state.json")) as f:
            start_step = json.load(f)["step"]
        # restore optimizer state (schedule count, adafactor/adam moments,
        # grad-accum counter) so LR schedules CONTINUE instead of
        # restarting warmup (reference Trainer restores optimizer.pt)
        opt_path = os.path.join(resume, "opt_state.npz")
        if os.path.exists(opt_path):
            opt_state = load_opt_state(opt_path, opt_state)
        else:
            print("checkpoint has no opt_state.npz; optimizer restarts")
        # replay the data-index stream so resumed runs see the same batch
        # sequence an uninterrupted run would
        for _ in range(start_step):
            rng.integers(0, len(train_blocks), size=args.batch_size)
        print(f"resumed from {resume} at step {start_step}")

    if pp_mesh is not None:
        # evaluate through the stage-sharded pipeline schedule: unstacking
        # to the flat path would gather the whole model onto one device —
        # the exact HBM footprint --pp exists to avoid
        from gptq_tpu.parallel.pp import make_pp_eval

        pp_eval = jax.jit(make_pp_eval(spec, pp_mesh, n_micro))

        def eval_pair(p, b):
            loss, acc = pp_eval(p, b)
            return float(loss), float(acc)
    else:
        eval_fn = jax.jit(lambda p, b: clm_loss(spec, p, b))
        acc_fn = jax.jit(lambda p, b: clm_accuracy(spec, p, b))

        def eval_pair(p, b):
            return float(eval_fn(p, b)), float(acc_fn(p, b))

    def evaluate() -> tuple[float, float]:
        losses, accs = [], []
        for i in range(0, min(len(eval_blocks), 16), args.batch_size):
            b = eval_blocks[i : i + args.batch_size]
            if pp_mesh is not None:
                # GPipe schedule needs B % (n_micro*dp) == 0: trim the
                # tail batch to the largest divisible size instead of
                # dropping it (a short validation file would otherwise
                # leave NO batches and print nan perplexity)
                q = n_micro * args.dp
                b = b[: (len(b) // q) * q]
                if not len(b):
                    continue
            loss, acc = eval_pair(params, jnp.asarray(b))
            losses.append(loss)
            accs.append(acc)
        if not losses:
            print("eval skipped: no validation batch divisible by "
                  f"n_micro*dp={n_micro * args.dp}")
            return float("inf"), 0.0
        return float(np.exp(np.mean(losses))), float(np.mean(accs))

    t0 = time.time()
    for s in range(start_step, total_steps):
        idx = rng.integers(0, len(train_blocks), size=args.batch_size)
        batch = jnp.asarray(train_blocks[idx])
        params, opt_state, loss = step(params, opt_state, batch)
        if (s + 1) % 50 == 0:
            print(f"step {s+1}/{total_steps} loss={float(loss):.4f} "
                  f"({(s + 1 - start_step) / (time.time() - t0):.2f} it/s)")
        if (s + 1) % args.eval_steps == 0:
            ppl, acc = evaluate()
            print(f"eval ppl = {ppl:.4f} accuracy = {acc:.4f}")
        save_every = (max(1, steps_per_epoch)
                      if args.save_strategy == "epoch" else args.save_steps)
        if (s + 1) % save_every == 0 or s + 1 == total_steps:
            ck = os.path.join(args.output_dir, f"checkpoint-{s+1}")
            os.makedirs(ck, exist_ok=True)
            save_checkpoint(os.path.join(ck, "model"), spec, to_flat(params))
            save_opt_state(os.path.join(ck, "opt_state.npz"), opt_state)
            with open(os.path.join(ck, "state.json"), "w") as f:
                json.dump({"step": s + 1}, f)
            print(f"saved {ck}")
            if args.save_total_limit > 0:
                import shutil

                cks = sorted(
                    (d for d in os.listdir(args.output_dir)
                     if d.startswith("checkpoint-")),
                    key=lambda d: int(d.split("-")[1]))
                for old in cks[:-args.save_total_limit]:
                    shutil.rmtree(os.path.join(args.output_dir, old))
                    print(f"pruned {old} (save_total_limit)")

    ppl, acc = evaluate()
    print(f"final eval ppl = {ppl:.4f} accuracy = {acc:.4f}")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
