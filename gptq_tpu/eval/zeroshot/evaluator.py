"""Zero-shot evaluator (reference: zeroShot/evaluator.py:17-241).

Builds requests for every doc, resolves all loglikelihoods in one batched
LM pass, dispatches results back to each task's process_results and
aggregates with bootstrap stderr. Emits the same results dict shape as the
reference (results/versions keyed by task) plus a markdown table helper."""

from __future__ import annotations

import random
from typing import Any

from gptq_tpu.eval.zeroshot.metrics import mean, stderr_for_metric


def evaluate(lm, task_dict: dict, num_fewshot: int = 0, limit: int | None = None,
             bootstrap_iters: int = 1000, description_dict: dict | None = None) -> dict:
    results: dict[str, dict] = {}
    versions: dict[str, Any] = {}

    all_requests: list[tuple[str, str]] = []
    owners: list[tuple[str, int, int]] = []  # (task, doc_idx, req_idx)
    task_docs: dict[str, list] = {}
    task_reqcount: dict[str, list[int]] = {}

    for task_name, task in task_dict.items():
        versions[task_name] = getattr(task, "VERSION", 0)
        if task.has_validation_docs():
            docs = list(task.validation_docs())
        elif task.has_test_docs():
            docs = list(task.test_docs())
        else:
            raise RuntimeError(f"Task {task_name} has no validation or test docs")
        if limit is not None:
            docs = docs[:limit]
        task_docs[task_name] = docs
        counts = []
        rnd = random.Random(1234)
        desc = (description_dict or {}).get(task_name)
        for di, doc in enumerate(docs):
            ctx = task.fewshot_context(doc, num_fewshot, rnd=rnd, description=desc)
            reqs = task.construct_requests(doc, ctx)
            counts.append(len(reqs))
            for ri, r in enumerate(reqs):
                assert r[0] == "loglikelihood", f"unsupported request {r[0]}"
                all_requests.append((r[1], r[2]))
                owners.append((task_name, di, ri))
        task_reqcount[task_name] = counts

    lls = lm.loglikelihood(all_requests)

    # scatter back
    per_doc: dict[tuple[str, int], list] = {}
    for (task_name, di, ri), res in zip(owners, lls):
        per_doc.setdefault((task_name, di), []).append((ri, res))

    for task_name, task in task_dict.items():
        metric_items: dict[str, list] = {}
        for di, doc in enumerate(task_docs[task_name]):
            rs = [r for _, r in sorted(per_doc.get((task_name, di), []))]
            md = task.process_results(doc, rs)
            for k, v in md.items():
                metric_items.setdefault(k, []).append(v)
        agg = task.aggregation()
        out = {}
        for k, items in metric_items.items():
            out[k] = agg[k](items)
            stderr = stderr_for_metric(agg[k], items, bootstrap_iters)
            if stderr is not None:
                out[f"{k}_stderr"] = stderr
        results[task_name] = out

    return {"results": results, "versions": versions}


def simple_evaluate(lm, tasks: list[str], num_fewshot: int = 0,
                    limit: int | None = None, task_kwargs: dict | None = None) -> dict:
    """(reference: evaluator.py:17-73 without the quantization side effects —
    quantize first via gptq_tpu.pipeline, then evaluate)."""
    from gptq_tpu.eval.zeroshot.tasks import get_task

    task_dict = {t: get_task(t, **(task_kwargs or {}).get(t, {})) for t in tasks}
    res = evaluate(lm, task_dict, num_fewshot=num_fewshot, limit=limit)
    res["config"] = {"num_fewshot": num_fewshot, "limit": limit}
    return res


def make_table(result_dict: dict) -> str:
    """Markdown results table (reference: evaluator.py:215-241)."""
    lines = ["|Task|Version|Metric|Value||Stderr|",
             "|---|---|---|---|---|---|"]
    for task, metrics in result_dict["results"].items():
        version = result_dict["versions"].get(task, "")
        for k, v in metrics.items():
            if k.endswith("_stderr"):
                continue
            se = metrics.get(f"{k}_stderr")
            se_s = f"± {se:.4f}" if se is not None else ""
            lines.append(f"|{task}|{version}|{k}|{v:.4f}||{se_s}|")
    return "\n".join(lines)


def make_latex_table(result_dict: dict) -> str:
    """LaTeX (booktabs) results table — the reference emits both markdown
    and latex writers (reference: evaluator.py:217-240)."""
    lines = [r"\begin{tabular}{lllrlr}", r"\toprule",
             r"Task & Version & Metric & Value &  & Stderr \\",
             r"\midrule"]
    for task, metrics in result_dict["results"].items():
        version = result_dict["versions"].get(task, "")
        for k, v in metrics.items():
            if k.endswith("_stderr"):
                continue
            se = metrics.get(f"{k}_stderr")
            se_s = rf"$\pm$ {se:.4f}" if se is not None else ""
            tex_task = str(task).replace("_", r"\_")
            tex_k = str(k).replace("_", r"\_")
            lines.append(
                rf"{tex_task} & {version} & {tex_k} & {v:.4f} &  & {se_s} \\")
    lines += [r"\bottomrule", r"\end{tabular}"]
    return "\n".join(lines)
