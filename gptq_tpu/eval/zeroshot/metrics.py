"""Aggregation metrics + bootstrap stderr (reference: zeroShot/metrics.py)."""

from __future__ import annotations

import math
import random
from collections.abc import Iterable

import numpy as np


def mean(items: Iterable[float]) -> float:
    items = list(items)
    return sum(items) / len(items)


def perplexity(items: Iterable[float]) -> float:
    return math.exp(-mean(items))


def weighted_mean(items):
    a, b = zip(*items)
    return sum(a) / sum(b)


def weighted_perplexity(items):
    return math.exp(-weighted_mean(items))


def matthews_corrcoef(items):
    preds, golds = zip(*items)
    tp = sum(p == 1 and g == 1 for p, g in zip(preds, golds))
    tn = sum(p == 0 and g == 0 for p, g in zip(preds, golds))
    fp = sum(p == 1 and g == 0 for p, g in zip(preds, golds))
    fn = sum(p == 0 and g == 1 for p, g in zip(preds, golds))
    den = math.sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
    return 0.0 if den == 0 else (tp * tn - fp * fn) / den


def f1_score(items):
    """Binary macro-less F1 over (pred, gold) pairs (sklearn-free)."""
    preds, golds = zip(*items)
    tp = sum(p == 1 and g == 1 for p, g in zip(preds, golds))
    fp = sum(p == 1 and g == 0 for p, g in zip(preds, golds))
    fn = sum(p == 0 and g == 1 for p, g in zip(preds, golds))
    if tp == 0:
        return 0.0
    prec = tp / (tp + fp)
    rec = tp / (tp + fn)
    return 2 * prec * rec / (prec + rec)


def multi_f1(num_classes):
    """Macro F1 over (pred, gold) pairs (reference CB's cb_multi_fi)."""

    def fn(items):
        preds, golds = zip(*items)
        f1s = []
        for c in range(num_classes):
            p = [int(x == c) for x in preds]
            g = [int(x == c) for x in golds]
            f1s.append(f1_score(list(zip(p, g))))
        return sum(f1s) / num_classes

    return fn


def acc_all(items):
    """MultiRC question-level accuracy: every answer of a question must be
    judged correctly (reference: metrics.py acc_all)."""
    question_map: dict[tuple, list[bool]] = {}
    for pred, doc in items:
        qid = (doc["idx"]["paragraph"], doc["idx"]["question"])
        question_map.setdefault(qid, []).append(bool(pred) == bool(doc["label"]))
    return mean(all(v) for v in question_map.values())


# ---------------------------------------------------------------------------
# squad-style token F1 / EM for ReCoRD
# ---------------------------------------------------------------------------

def _normalize_text(s: str) -> str:
    import re
    import string

    s = s.lower()
    s = "".join(ch for ch in s if ch not in set(string.punctuation))
    s = re.sub(r"\b(a|an|the)\b", " ", s)
    return " ".join(s.split())


def compute_exact(a_gold: str, a_pred: str) -> float:
    return float(_normalize_text(a_gold) == _normalize_text(a_pred))


def compute_f1(a_gold: str, a_pred: str) -> float:
    gold_toks = _normalize_text(a_gold).split()
    pred_toks = _normalize_text(a_pred).split()
    if not gold_toks or not pred_toks:
        return float(gold_toks == pred_toks)
    common: dict[str, int] = {}
    for t in pred_toks:
        common[t] = common.get(t, 0) + 1
    num_same = sum(min(common.get(t, 0), gold_toks.count(t)) for t in set(gold_toks))
    if num_same == 0:
        return 0.0
    prec = num_same / len(pred_toks)
    rec = num_same / len(gold_toks)
    return 2 * prec * rec / (prec + rec)


def metric_max_over_ground_truths(metric_fn, prediction, ground_truths):
    return max(metric_fn(gt, prediction) for gt in ground_truths)


# ---------------------------------------------------------------------------
# bootstrap stderr (reference: metrics.py:192-252)
# ---------------------------------------------------------------------------

def bootstrap_stderr(fn, items, iters=1000, seed=1234) -> float:
    rnd = random.Random(seed)
    items = list(items)
    stats = []
    for _ in range(iters):
        sample = [items[rnd.randrange(len(items))] for _ in range(len(items))]
        stats.append(fn(sample))
    return float(np.std(stats, ddof=1))


def stderr_for_metric(metric_fn, items, bootstrap_iters=1000):
    if metric_fn is mean:
        vals = list(items)
        if len(vals) < 2:
            return 0.0
        return float(np.std(vals, ddof=1) / math.sqrt(len(vals)))
    try:
        return bootstrap_stderr(metric_fn, items, iters=bootstrap_iters)
    except Exception:  # noqa: BLE001
        return float("nan")
