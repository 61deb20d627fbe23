"""Zero-shot harness tests with injected offline datasets and a toy
word-level tokenizer — exercises request construction, batched
loglikelihood scoring, metric aggregation and the evaluator end-to-end."""

import numpy as np
import jax
import jax.numpy as jnp

from gptq_tpu.eval.zeroshot import JaxLM, evaluate, simple_evaluate
from gptq_tpu.eval.zeroshot.metrics import (
    acc_all,
    compute_exact,
    compute_f1,
    f1_score,
    mean,
    multi_f1,
    stderr_for_metric,
)
from gptq_tpu.eval.zeroshot.tasks import BoolQ, Copa, PiQA
from gptq_tpu.models.common import ArchSpec, init_params

SPEC = ArchSpec(arch="llama", n_layers=2, hidden=32, n_heads=4, n_kv_heads=4,
                ffn=64, vocab=128, max_pos=128, act="silu", pos="rope",
                norm_type="rmsnorm", linear_bias=False, tie_embeddings=False)


class ToyTokenizer:
    """Deterministic word-hash tokenizer; eos=0."""

    eos_token_id = 0

    def __call__(self, s):
        class Enc:
            pass

        e = Enc()
        e.input_ids = [1 + (hash(w) % 126) for w in s.split()]
        return e


def make_lm():
    params = init_params(SPEC, jax.random.PRNGKey(0))
    return JaxLM(SPEC, params, ToyTokenizer(), max_length=64, batch_size=4)


def test_loglikelihood_additivity():
    """ll(ctx, a+b) == ll(ctx, a) + ll(ctx+a, b) for a causal LM."""
    lm = make_lm()
    ctx = "the quick brown fox"
    a = " jumps over"
    b = " the lazy dog"
    (ll_ab, _), (ll_a, _) = lm.loglikelihood([(ctx, a + b), (ctx, a)])
    ll_b, _ = lm.loglikelihood([(ctx + a, b)])[0]
    assert abs(ll_ab - (ll_a + ll_b)) < 1e-3


def test_loglikelihood_order_invariance():
    lm = make_lm()
    pairs = [("alpha beta", " gamma"), ("one two three four five six", " seven"),
             ("x", " y z w")]
    r1 = lm.loglikelihood(pairs)
    r2 = lm.loglikelihood(list(reversed(pairs)))
    for a, b in zip(r1, reversed(r2)):
        assert abs(a[0] - b[0]) < 1e-4


def test_piqa_flow():
    docs = [
        {"goal": "keep drinks cold", "sol1": "put ice in the cooler",
         "sol2": "put fire in the cooler", "label": 0},
        {"goal": "cut paper", "sol1": "use scissors", "sol2": "use a spoon",
         "label": 0},
    ]
    task = PiQA(dataset={"train": docs, "validation": docs})
    lm = make_lm()
    res = evaluate(lm, {"piqa": task})
    assert set(res["results"]["piqa"]) >= {"acc", "acc_norm", "acc_stderr"}
    assert 0.0 <= res["results"]["piqa"]["acc"] <= 1.0


def test_boolq_and_copa_flow():
    boolq_docs = [
        {"passage": "water is wet.", "question": "is water wet", "label": 1},
        {"passage": "fire is cold.", "question": "is fire hot", "label": 0},
    ]
    copa_docs = [
        {"premise": "The man was thirsty.", "question": "effect",
         "choice1": "He drank water.", "choice2": "He slept.", "label": 0},
    ]
    lm = make_lm()
    res = evaluate(lm, {
        "boolq": BoolQ(dataset={"train": boolq_docs, "validation": boolq_docs}),
        "copa": Copa(dataset={"train": copa_docs, "validation": copa_docs}),
    })
    assert "acc" in res["results"]["boolq"]
    assert "acc" in res["results"]["copa"]


def test_fewshot_context():
    docs = [
        {"goal": f"goal {i}", "sol1": "a", "sol2": "b", "label": 0}
        for i in range(5)
    ]
    task = PiQA(dataset={"train": docs, "validation": docs})
    import random

    ctx = task.fewshot_context(docs[0], 2, rnd=random.Random(0))
    assert ctx.count("Question:") == 3  # 2 shots + the query
    assert ctx.endswith("Answer:")


def test_metrics():
    assert f1_score([(1, 1), (1, 0), (0, 1), (1, 1)]) > 0
    assert multi_f1(3)([(0, 0), (1, 1), (2, 2)]) == 1.0
    assert compute_exact("The Cat", "the cat!") == 1.0
    assert 0 < compute_f1("big red dog", "red dog") < 1.0001
    items = [(True, {"idx": {"paragraph": 0, "question": 0}, "label": 1}),
             (False, {"idx": {"paragraph": 0, "question": 0}, "label": 0})]
    assert acc_all(items) == 1.0
    se = stderr_for_metric(mean, [0.0, 1.0, 1.0, 0.0, 1.0])
    assert se > 0


def test_make_table():
    from gptq_tpu.eval.zeroshot.evaluator import make_table

    table = make_table({"results": {"piqa": {"acc": 0.5, "acc_stderr": 0.1}},
                        "versions": {"piqa": 0}})
    assert "|piqa|" in table


def test_make_latex_table():
    from gptq_tpu.eval.zeroshot.evaluator import make_latex_table

    tex = make_latex_table(
        {"results": {"arc_easy": {"acc_norm": 0.25,
                                  "acc_norm_stderr": 0.02}},
         "versions": {"arc_easy": 0}})
    assert r"\begin{tabular}" in tex and r"\bottomrule" in tex
    assert r"arc\_easy" in tex and "0.2500" in tex


def test_lambada_local_jsonl(tmp_path):
    """Offline scoring: a local lambada jsonl (the reference ships a zenodo
    loader, zeroShot/tasks/local_datasets/lambada) loads via data_dir."""
    import json
    from gptq_tpu.eval.zeroshot.tasks import Lambada

    p = tmp_path / "lambada_test.jsonl"
    docs = [{"text": "the cat sat on the mat"},
            {"text": "dogs chase the red ball"}]
    p.write_text("\n".join(json.dumps(d) for d in docs))
    task = Lambada(data_dir=str(tmp_path))
    vd = list(task.validation_docs())
    assert len(vd) == 2
    assert task.doc_to_text(vd[0]).endswith("the")
    assert task.doc_to_target(vd[0]) == " mat"


def test_storycloze_local_csv(tmp_path):
    """Offline scoring: the reference's 2018 CSV format loads via data_dir."""
    from gptq_tpu.eval.zeroshot.tasks import StoryCloze

    p = tmp_path / "cloze_test_val.csv"
    p.write_text(
        "InputStoryid,InputSentence1,InputSentence2,InputSentence3,"
        "InputSentence4,RandomFifthSentenceQuiz1,RandomFifthSentenceQuiz2,"
        "AnswerRightEnding\n"
        "id1,A.,B.,C.,D.,Good end.,Bad end.,1\n"
        "id2,E.,F.,G.,H.,Wrong.,Right.,2\n")
    task = StoryCloze(data_dir=str(tmp_path))
    docs = list(task.validation_docs())
    assert len(docs) == 2
    assert docs[0]["query"] == "A. B. C. D."
    assert docs[0]["choices"] == ["Good end.", "Bad end."]
    assert docs[0]["gold"] == 0
    assert docs[1]["gold"] == 1


def test_local_data_dir_flags():
    """Only the local-file tasks may receive data_dir (the CLI filters on
    LOCAL_DATA_DIR; hub-backed tasks would pass it to load_dataset as a
    data-files dir and break)."""
    from gptq_tpu.eval.zeroshot.tasks import TASK_REGISTRY

    local = {n for n, c in TASK_REGISTRY.items()
             if getattr(c, "LOCAL_DATA_DIR", False)}
    assert local == {"lambada", "storycloze"}
