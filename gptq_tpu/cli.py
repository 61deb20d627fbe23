"""Unified CLI — one driver for every architecture.

Replaces the reference's four ~700-line __main__ blocks (reference:
opt.py:510-721, llama.py:340-488, bloom.py:421-467, gemma.py) with a single
argparse surface whose flags match the reference's (SURVEY.md §2.4), so
recipes in script/*.sh translate directly:

    python -m gptq_tpu.cli facebook/opt-125m c4 --wbits 4 --save q.npz
    python -m gptq_tpu.cli meta-llama/Llama-2-7b-hf c4 --wbits 4 \
        --true-sequential --act-order --new-eval
    python -m gptq_tpu.cli MODEL c4 --load q.npz --benchmark 128 --check
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("gptq_tpu")
    p.add_argument("model", type=str,
                   help="HF model id or local checkpoint directory")
    p.add_argument("dataset", type=str, nargs="?", default="c4",
                   choices=["wikitext2", "ptb", "c4", "ptb-new", "c4-new"])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--nsamples", type=int, default=128)
    p.add_argument("--percdamp", type=float, default=0.01)
    p.add_argument("--nearest", action="store_true")
    p.add_argument("--wbits", type=int, default=16, choices=[1, 2, 3, 4, 8, 16])
    p.add_argument("--trits", action="store_true")
    p.add_argument("--groupsize", type=int, default=-1)
    p.add_argument("--sym", action="store_true")
    p.add_argument("--save", type=str, default="")
    p.add_argument("--load", type=str, default="")
    p.add_argument("--benchmark", type=int, default=0)
    p.add_argument("--benchmark_batch", type=int, default=1,
                   help="decode batch for --benchmark (reference kernels "
                        "are batch-1 only; ours scale)")
    p.add_argument("--check", action="store_true")
    p.add_argument("--new-eval", action="store_true")
    p.add_argument("--faster-kernel", action="store_true")
    p.add_argument("--act-order", action="store_true")
    p.add_argument("--static-groups", action="store_true")
    p.add_argument("--true-sequential", action="store_true")
    p.add_argument("--load_weights", type=str, default="")
    p.add_argument("--load_safetensor", type=str, default="")
    # BCQ / LUT
    p.add_argument("--bcq", action="store_true")
    p.add_argument("--lut_bench", action="store_true")
    p.add_argument("--quant_lm_head", type=int, default=0, metavar="BITS",
                   help="also quantize the output projection (RTN, e.g. 8); "
                        "beyond-reference serving option")
    p.add_argument("--quant_experts", default="none",
                   choices=["none", "rtn", "gptq"],
                   help="quantize MoE expert stacks (Mixtral-style models): "
                        "rtn = calibration-free grids; gptq = per-expert "
                        "Hessians from dispatched calibration slots first "
                        "(models/moe.py). Storage format from --expert_bits")
    p.add_argument("--expert_bits", type=int, default=8,
                   choices=[2, 3, 4, 8],
                   help="expert storage width for --quant_experts: 8 = "
                        "int8 codes + per-row scales; 2/3/4 = sub-byte "
                        "byteplane PackedExperts banks served by the "
                        "batched-expert Pallas kernel (2-4x less expert "
                        "HBM than int8)")
    p.add_argument("--int8_kv", action="store_true",
                   help="serve with the int8 KV cache (dynamic per-token-"
                        "head scales; fused dequant attention kernel) — "
                        "halves cache HBM footprint/bandwidth; beyond-"
                        "reference serving option")
    p.add_argument("--lut_eval", action="store_true")
    p.add_argument("--bcq_round", type=int, default=5)
    p.add_argument("--columnwise", action="store_true")
    # BooleanOptionalAction so --no-use_bst reaches the non-BST find_B
    # path (the reference defaults False, lut_gemm argparse; our BST
    # default is the better fit — but it must be switchable)
    p.add_argument("--use_bst", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--apot_nums", type=int, default=2)
    # non-linear
    p.add_argument("--non_linear", action="store_true")
    p.add_argument("--hyperbits", type=int, default=5)
    p.add_argument("--exploreBits", type=int, default=1)
    p.add_argument("--exploreSplit", type=int, default=20)
    # mixed precision
    p.add_argument("--linearmix", action="store_true")
    p.add_argument("--layermix", action="store_true")
    p.add_argument("--quant_config", type=str, default="")
    # zero-shot / analysis extras
    p.add_argument("--task", type=str, default="",
                   help="comma-separated zero-shot tasks to run after quantization")
    p.add_argument("--analyse", action="store_true",
                   help="run sensitivity analysis instead of quantization")
    p.add_argument("--data_dir", type=str,
                   default=os.environ.get("GPTQ_TPU_DATA_DIR", ""),
                   help="local datasets cache for offline runs "
                        "(default: $GPTQ_TPU_DATA_DIR)")
    p.add_argument("--eval_pack", action="store_true",
                   help="pack weights and evaluate through the serving kernels")
    p.add_argument("--tp", type=int, default=1, help="tensor-parallel ways")
    p.add_argument("--sp", type=int, default=1,
                   help="sequence-parallel ways: long-context serving with "
                        "the KV cache sharded over an sp mesh axis for its "
                        "whole lifetime (ring-attention prefill + SPCache "
                        "decode; composes with --tp on a 2-D mesh). int8 "
                        "cache is the default at max_len >= 1024")
    p.add_argument("--ep", type=int, default=1,
                   help="expert-parallel ways: MoE serving with expert "
                        "stacks sharded over an ep mesh axis (composes "
                        "with --tp on a 2-D mesh)")
    p.add_argument("--max_len", type=int, default=0,
                   help="serving cache capacity for --sp/--ep benchmarks "
                        "(default: benchmark length + headroom)")
    p.add_argument("--results_log", type=str, default="results/ppl.txt")
    return p


def config_from_args(args) -> "QuantConfig":
    from gptq_tpu.config import QuantConfig

    return QuantConfig(
        wbits=args.wbits, trits=args.trits, groupsize=args.groupsize,
        sym=args.sym, percdamp=args.percdamp, act_order=args.act_order,
        static_groups=args.static_groups, true_sequential=args.true_sequential,
        nearest=args.nearest, dataset=args.dataset, nsamples=args.nsamples,
        seed=args.seed, lut_eval=args.lut_eval, columnwise=args.columnwise,
        bcq_round=args.bcq_round, use_bst=args.use_bst,
        apot_nums=args.apot_nums, bcq=args.bcq, non_linear=args.non_linear,
        hyperbits=args.hyperbits, exploreBits=args.exploreBits,
        exploreSplit=args.exploreSplit, layermix=args.layermix,
        linearmix=args.linearmix,
        quant_config=args.quant_config or None,
        save=args.save or None, load=args.load or None,
        benchmark=args.benchmark, check=args.check,
        faster_kernel=args.faster_kernel, new_eval=args.new_eval,
    )


def _cfg_path(name: str) -> str:
    """Prefer a local quant_bit/ (reference layout) then repo configs/."""
    for cand in (os.path.join("quant_bit", name), os.path.join("configs", name),
                 os.path.join(os.path.dirname(os.path.dirname(
                     os.path.abspath(__file__))), "configs", name)):
        if os.path.exists(cand):
            return cand
    return name


def load_mixed_precision(args, model_name: str):
    from gptq_tpu.config import MixedPrecision

    if args.quant_config:
        with open(args.quant_config) as f:
            return MixedPrecision(module_config=json.load(f))
    if args.layermix:
        with open(_cfg_path("layerwise.json")) as f:
            table = json.load(f)
        return MixedPrecision(layer_bits=table[model_name.split("/")[-1]])
    if args.linearmix:
        with open(_cfg_path("linearwise.json")) as f:
            return MixedPrecision(linear_bits=json.load(f))
    return None


def append_result_log(path: str, args, ppl: float, dataset: str,
                      protocol: str = "eval") -> None:
    """Structured result line (reference: opt.py:335-357). `protocol` tags
    which measurement produced the number (eval | chained | per-token |
    batchN) so a chained-decode PPL and a full eval are distinguishable in
    the log."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    line = (f"model = {args.model.split('/')[-1]}, dataset = {dataset}, "
            f"wbits = {args.wbits}, groupsize = {args.groupsize}, "
            f"lut = {args.lut_eval}, nonLinear = {args.non_linear}, "
            f"columnwise = {args.columnwise}, protocol = {protocol}"
            f"   :   {ppl}")
    if args.non_linear:
        line += (f"  ||  hyperbits = {args.hyperbits}, exploreBits = "
                 f"{args.exploreBits}, exploreSplit = {args.exploreSplit}")
    if args.lut_eval or args.columnwise:
        line += (f"  ||  bcq_round = {args.bcq_round}  ||  apot_nums = "
                 f"{args.apot_nums} use_bst = {args.use_bst}")
    with open(path, "a") as f:
        f.write(line + "\n")


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax

    from gptq_tpu.data import get_loaders
    from gptq_tpu.eval.ppl import eval_ppl
    from gptq_tpu.io import (enable_compilation_cache, load_checkpoint,
                             save_checkpoint)

    enable_compilation_cache()
    from gptq_tpu.models.convert import params_from_dir

    cfg = config_from_args(args)

    if args.lut_bench:
        from gptq_tpu.ops.kernel_bench import bench_kernels

        bench_kernels(groupsize=max(args.groupsize, -1))
        return 0

    if args.load:
        spec, params, loaded_cfg = load_checkpoint(args.load)
        print(f"loaded packed checkpoint {args.load}")
        if loaded_cfg is not None:
            # result-log fidelity: a loaded checkpoint's lines must carry
            # ITS quantization config, not this invocation's defaults (a
            # w4a8 benchmark was logged as "wbits = 16" before this)
            for f in ("wbits", "groupsize", "lut_eval", "columnwise",
                      "non_linear", "trits", "sym", "hyperbits",
                      "exploreBits", "exploreSplit", "bcq_round",
                      "apot_nums", "use_bst"):
                if hasattr(loaded_cfg, f):
                    setattr(args, f, getattr(loaded_cfg, f))
        else:
            # cfg-less checkpoint (programmatic save_checkpoint without a
            # QuantConfig): the packed weights still know their own bits —
            # infer, so the result log never claims "wbits = 16" for a
            # 4-bit serve
            import jax as _jax

            from gptq_tpu.ops.pack import PackedWeight as _PW

            for leaf in _jax.tree.leaves(
                    params, is_leaf=lambda x: isinstance(x, _PW)):
                if isinstance(leaf, _PW):
                    args.wbits = leaf.bits
                    args.groupsize = leaf.groupsize
                    args.lut_eval = leaf.fmt == "bcq"
                    break
        if args.quant_lm_head:
            from gptq_tpu.pipeline import quantize_lm_head

            if quantize_lm_head(spec, params, bits=args.quant_lm_head,
                                tp=max(1, args.tp)):
                print(f"lm_head quantized to {args.quant_lm_head} bits")
    else:
        spec, params = params_from_dir(args.model)
        if args.load_safetensor or args.load_weights:
            # overlay fine-tuned fp weights (reference: opt.py:670-679,
            # safetensors load with strict=False)
            from gptq_tpu.models.convert import params_from_state_dict

            src = args.load_safetensor or args.load_weights
            if src.endswith(".safetensors"):
                from safetensors import safe_open

                sd = {}
                with safe_open(src, framework="np") as fh:
                    for k in fh.keys():
                        sd[k] = fh.get_tensor(k)
            else:
                import torch

                sd = torch.load(src, map_location="cpu", weights_only=True)
            params = params_from_state_dict(sd, spec)
            print(f"loaded fine-tuned weights from {src}")

    # tokenizer only matters for calibration/eval; a --load --benchmark run
    # (packed decode on random ids, reference: opt.py:661-702) must work
    # offline without tokenizer files
    from transformers import AutoTokenizer

    def _hub_reachable(timeout: float = 3.0) -> bool:
        # cheap connectivity probe: without it, an offline host pays
        # hf-hub's full retry backoff (~25 s per file, two files) before
        # the tokenizer fallback kicks in. A raw socket doesn't see
        # proxies, so when a proxy or hub mirror is configured trust it
        # and let hf-hub try (requests honors HTTPS_PROXY; we can't).
        import socket
        from urllib.parse import urlparse

        for var in ("HTTPS_PROXY", "https_proxy", "ALL_PROXY", "all_proxy"):
            if os.environ.get(var):
                return True
        host = urlparse(
            os.environ.get("HF_ENDPOINT") or "https://huggingface.co"
        ).hostname or "huggingface.co"
        try:
            socket.create_connection((host, 443), timeout=timeout).close()
            return True
        except OSError:
            return False

    from gptq_tpu.models.convert import resolve_model_path

    # honor GPTQ_TPU_CKPT_DIR for the tokenizer too (a mounted checkpoint
    # directory carries its tokenizer files alongside the weights)
    tok_src = resolve_model_path(args.model)
    try:
        # local/cached first: skips hf-hub's ~30s retry backoff when the
        # hub is unreachable (offline serving hosts)
        tokenizer = AutoTokenizer.from_pretrained(
            tok_src, use_fast=False, local_files_only=True)
    except Exception as e:  # noqa: BLE001
        if args.benchmark and args.load and not args.task:
            # packed decode on random ids needs no tokenizer
            # (reference: opt.py:661-702); still try the hub once so an
            # ONLINE host without a populated cache keeps its post-
            # benchmark PPL evals, but don't fail the benchmark over it
            tokenizer = None
            if _hub_reachable():
                try:
                    tokenizer = AutoTokenizer.from_pretrained(tok_src,
                                                              use_fast=False)
                except Exception:  # noqa: BLE001
                    pass
            if tokenizer is None:
                print(f"tokenizer unavailable ({type(e).__name__}); "
                      f"benchmark-only run continues, PPL evals skipped")
        else:
            # calibration/eval/--task genuinely need it: let hub errors
            # propagate — but fail fast with the local-cache error when
            # the hub is unreachable instead of retrying for a minute
            if not _hub_reachable():
                raise
            tokenizer = AutoTokenizer.from_pretrained(tok_src,
                                                      use_fast=False)
    seqlen = spec.max_pos

    if args.sp > 1 and args.ep > 1:
        raise SystemExit("--sp and --ep are separate serving engines; "
                         "pick one (each composes with --tp)")
    if args.tp > 1 and args.sp == 1 and args.ep == 1:
        from gptq_tpu.parallel.mesh import make_mesh, shard_params

        mesh = make_mesh(tp=args.tp)
        params = shard_params(spec, params, mesh)
        print(f"sharded over tp={args.tp}")

    if args.analyse:
        from gptq_tpu.analysis import analyse_model, derive_quant_config

        import jax.numpy as jnp

        calib, _ = get_loaders(args.dataset, nsamples=args.nsamples,
                               seed=args.seed, seqlen=seqlen,
                               tokenizer=tokenizer,
                               data_dir=args.data_dir or None)
        st = analyse_model(spec, params, jnp.asarray(calib))
        qc = derive_quant_config(st, bits=args.wbits,
                                 out_path="results/quant_config.json")
        print(json.dumps(qc, indent=2))
        return 0

    if args.quant_experts != "none":
        # fail loudly on configs the flag cannot act on instead of
        # silently serving dense experts
        if args.load:
            raise SystemExit("--quant_experts has no effect with --load "
                             "(the checkpoint already fixes its expert "
                             "format); quantize before saving")
        if not spec.n_experts:
            raise SystemExit(f"--quant_experts: {args.model} has no MoE "
                             f"expert stacks (n_experts == 0)")
        if args.quant_experts == "gptq" and not (args.wbits < 16
                                                 or args.trits):
            raise SystemExit("--quant_experts gptq needs the calibration "
                             "pass: set --wbits < 16 (use rtn for "
                             "calibration-free int8 experts)")

    quantizers = None
    if not args.load and (args.wbits < 16 or args.trits):
        import jax.numpy as jnp

        from gptq_tpu.pipeline import quantize_model

        calib, _ = get_loaders(args.dataset, nsamples=args.nsamples,
                               seed=args.seed, seqlen=seqlen,
                               tokenizer=tokenizer,
                               data_dir=args.data_dir or None)
        mixed = load_mixed_precision(args, args.model)
        t0 = time.time()
        res = quantize_model(spec, params, jnp.asarray(calib), cfg, mixed=mixed)
        quantizers = res.quantizers
        print(f"quantization done in {time.time() - t0:.1f}s")

        if args.quant_experts == "gptq":
            from gptq_tpu.models.moe import gptq_quantize_experts

            gptq_quantize_experts(spec, params, jnp.asarray(calib), cfg,
                                  log=print,
                                  keep_grids=args.expert_bits < 8)

        if args.eval_pack or args.save:
            from gptq_tpu.pipeline import pack_model

            pack_model(spec, params, quantizers, cfg, tp=max(1, args.tp))
            if args.quant_lm_head:
                from gptq_tpu.pipeline import quantize_lm_head

                if quantize_lm_head(spec, params, bits=args.quant_lm_head,
                                    tp=max(1, args.tp)):
                    print(f"lm_head quantized to {args.quant_lm_head} bits")

    if args.quant_experts != "none":
        # storage compression runs outside the calibration block so
        # calibration-free rtn works at --wbits 16 too (fp attention +
        # compressed experts)
        if args.expert_bits < 8:
            from gptq_tpu.models.moe import pack_experts

            pack_experts(params, bits=args.expert_bits,
                         groupsize=args.groupsize)
            print(f"expert stacks packed ({args.quant_experts} -> "
                  f"{args.expert_bits}-bit byteplane banks)")
        else:
            from gptq_tpu.models.moe import quantize_experts

            quantize_experts(params, bits=8)
            print(f"expert stacks quantized ({args.quant_experts} -> int8 "
                  f"codes + per-row scales)")

    if args.save and not args.load:
        save_checkpoint(args.save, spec, params, cfg)
        print(f"saved {args.save}")

    # PPL eval (reference: opt.py:707-715 evaluates wikitext2/ptb/c4 [+new])
    datasets = ["wikitext2", "ptb", "c4"]
    if args.new_eval:
        datasets = ["wikitext2", "ptb-new", "c4-new"]
    if tokenizer is None:
        datasets = []
    for ds in datasets:
        try:
            _, testenc = get_loaders(ds, seed=args.seed, seqlen=seqlen,
                                     tokenizer=tokenizer,
                                     data_dir=args.data_dir or None)
        except Exception as e:  # noqa: BLE001
            print(f"skipping {ds}: {type(e).__name__}: {e}")
            continue
        ppl = eval_ppl(spec, params, testenc.input_ids, seqlen)
        append_result_log(args.results_log, args, ppl, ds)

    if args.task:
        from gptq_tpu.eval.zeroshot import JaxLM, simple_evaluate
        from gptq_tpu.eval.zeroshot.evaluator import make_table

        lm = JaxLM(spec, params, tokenizer, max_length=seqlen)
        tasks = [t.strip() for t in args.task.split(",") if t.strip()]
        # data_dir only goes to tasks whose download() reads local files
        # (lambada jsonl / storycloze CSV); hub-backed tasks would pass it
        # to datasets.load_dataset as a data-files dir and break
        from gptq_tpu.eval.zeroshot.tasks import TASK_REGISTRY

        tk = ({t: {"data_dir": args.data_dir} for t in tasks
               if getattr(TASK_REGISTRY.get(t), "LOCAL_DATA_DIR", False)}
              if args.data_dir else None)
        res = simple_evaluate(lm, tasks, task_kwargs=tk)
        print(json.dumps(res["results"], indent=2))
        print(make_table(res))

    if args.benchmark:
        from gptq_tpu.engine.decode import (benchmark_decode,
                                            benchmark_decode_chained,
                                            measure_dispatch_rtt)

        ids = np.random.default_rng(args.seed).integers(
            0, spec.vocab, size=(1, args.benchmark))
        if args.sp > 1 or args.ep > 1:
            # sharded serving engines (long-context SPCache / MoE expert
            # parallel), chained on-device protocol
            import jax.numpy as jnp

            from gptq_tpu.engine.serving import EPEngine, SPEngine

            max_len = args.max_len or args.benchmark + args.sp + 8
            cache_dtype = jnp.int8 if args.int8_kv else None
            if args.sp > 1:
                eng = SPEngine(spec, params, sp=args.sp, tp=args.tp,
                               max_len=max_len, cache_dtype=cache_dtype,
                               fuse=True, a8=args.faster_kernel)
                tag = f"sp{args.sp}" + (f"xtp{args.tp}" if args.tp > 1
                                        else "")
            else:
                eng = EPEngine(spec, params, ep=args.ep, tp=args.tp,
                               max_len=max_len,
                               cache_dtype=cache_dtype or jnp.bfloat16,
                               fuse=True, a8=args.faster_kernel)
                tag = f"ep{args.ep}" + (f"xtp{args.tp}" if args.tp > 1
                                        else "")
            r = eng.benchmark_chained(ids, check=args.check)
            append_result_log(args.results_log, args,
                              r.get("ppl", round(r["tokens_per_s"], 2)),
                              "decode-ppl" if args.check else "decode-tok/s",
                              protocol=f"chained-{tag}")
            return 0
        # per-token host-synced timing is the reference protocol
        # (opt.py:440-507), but when a dispatch round-trip costs more than
        # ~1 ms (relayed/remote backends) it measures the link, not the
        # chip — use the on-device chained protocol there
        if args.faster_kernel:
            from gptq_tpu.models.common import fuse_serving

            params = fuse_serving(spec, params, a8=True)
            print("--faster-kernel: serving with dynamic int8 activations")
        import jax.numpy as jnp

        cache_dtype = jnp.int8 if args.int8_kv else jnp.bfloat16
        if args.benchmark_batch > 1:
            # batched lock-step decode (beyond reference); tokens/s scales
            # with batch because weight streaming amortizes
            from gptq_tpu.engine.decode import DecodeEngine
            import time as _t

            eng = DecodeEngine(spec, params, max_len=args.benchmark + 8,
                               batch=args.benchmark_batch,
                               cache_dtype=cache_dtype)
            prompt = np.tile(ids[:1, :1], (args.benchmark_batch, 1))
            # warm with the SAME token count (chunk lengths are compiled in)
            eng.generate_chained(prompt, max_new_tokens=args.benchmark)
            t0 = _t.perf_counter()
            eng.generate_chained(prompt, max_new_tokens=args.benchmark)
            dt = _t.perf_counter() - t0
            rate = args.benchmark * args.benchmark_batch / dt
            print(f"batch {args.benchmark_batch}: {rate:.1f} tok/s "
                  f"({dt/args.benchmark*1e3:.2f} ms/step incl dispatch)")
            append_result_log(args.results_log, args, round(rate, 2),
                              "decode-tok/s",
                              protocol=f"batch{args.benchmark_batch}")
        elif measure_dispatch_rtt(reps=3) > 1e-3:
            print("dispatch RTT > 1ms: using on-device chained protocol")
            r = benchmark_decode_chained(spec, params, ids, check=args.check,
                                         cache_dtype=cache_dtype)
            append_result_log(args.results_log, args,
                              r.get("ppl", round(r["tokens_per_s"], 2)),
                              "decode-ppl" if args.check else "decode-tok/s",
                              protocol="chained")
        else:
            r = benchmark_decode(spec, params, ids, check=args.check,
                                 trace_dir="results/profile" if args.check
                                 else None, cache_dtype=cache_dtype)
            append_result_log(args.results_log, args,
                              r.get("ppl", round(r["tokens_per_s"], 2)),
                              "decode-ppl" if args.check else "decode-tok/s",
                              protocol="per-token")
    return 0


if __name__ == "__main__":
    sys.exit(main())
