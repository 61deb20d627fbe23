"""The 13-task registry (reference: zeroShot/tasks/__init__.py:18-32 and the
per-task templates in tasks/{piqa,arc,glue,superglue,lambada,storycloze}.py).

Prompt templates are kept character-identical to the reference so zero-shot
scores are comparable."""

from __future__ import annotations

import numpy as np

from gptq_tpu.eval.zeroshot.base import (
    MultipleChoiceTask,
    Task,
    general_detokenize,
    loglikelihood,
    yesno,
)
from gptq_tpu.eval.zeroshot.metrics import (
    acc_all,
    compute_exact,
    compute_f1,
    mean,
    metric_max_over_ground_truths,
    multi_f1,
    perplexity,
)


class PiQA(MultipleChoiceTask):
    """(reference: tasks/piqa.py:29-66)."""

    DATASET_PATH = "piqa"

    def has_training_docs(self):
        return True

    def training_docs(self):
        if self._training_docs is None:
            self._training_docs = list(map(self._process_doc, self.dataset["train"]))
        return self._training_docs

    def validation_docs(self):
        return map(self._process_doc, self.dataset["validation"])

    def _process_doc(self, doc):
        return {"goal": doc["goal"], "choices": [doc["sol1"], doc["sol2"]],
                "gold": doc["label"]}

    def doc_to_text(self, doc):
        return "Question: " + doc["goal"] + "\nAnswer:"


class ARCEasy(MultipleChoiceTask):
    """(reference: tasks/arc.py:29-74)."""

    DATASET_PATH = "ai2_arc"
    DATASET_NAME = "ARC-Easy"

    def has_training_docs(self):
        return True

    def has_test_docs(self):
        return True

    def training_docs(self):
        if self._training_docs is None:
            self._training_docs = list(map(self._process_doc, self.dataset["train"]))
        return self._training_docs

    def validation_docs(self):
        return map(self._process_doc, self.dataset["validation"])

    def test_docs(self):
        return map(self._process_doc, self.dataset["test"])

    def _process_doc(self, doc):
        num_to_letter = {"1": "A", "2": "B", "3": "C", "4": "D", "5": "E"}
        key = num_to_letter.get(doc["answerKey"], doc["answerKey"])
        return {
            "id": doc["id"],
            "query": "Question: " + doc["question"] + "\nAnswer:",
            "choices": doc["choices"]["text"],
            "gold": ["A", "B", "C", "D", "E"].index(key),
        }

    def doc_to_text(self, doc):
        return doc["query"]


class ARCChallenge(ARCEasy):
    DATASET_PATH = "ai2_arc"
    DATASET_NAME = "ARC-Challenge"


class BoolQ(Task):
    """(reference: tasks/superglue.py:37-97)."""

    DATASET_PATH = "super_glue"
    DATASET_NAME = "boolq"

    def has_training_docs(self):
        return True

    def training_docs(self):
        if self._training_docs is None:
            self._training_docs = list(self.dataset["train"])
        return self._training_docs

    def validation_docs(self):
        return self.dataset["validation"]

    def doc_to_text(self, doc):
        return f"{doc['passage']}\nQuestion: {doc['question']}?\nAnswer:"

    def doc_to_target(self, doc):
        return " " + yesno(doc["label"])

    def construct_requests(self, doc, ctx):
        return [loglikelihood(ctx, " yes"), loglikelihood(ctx, " no")]

    def process_results(self, doc, results):
        (ll_yes, _), (ll_no, _) = results
        return {"acc": 1.0 if (ll_yes > ll_no) == doc["label"] else 0.0}

    def higher_is_better(self):
        return {"acc": True}

    def aggregation(self):
        return {"acc": mean}


class CommitmentBank(Task):
    """(reference: tasks/superglue.py:100-168)."""

    DATASET_PATH = "super_glue"
    DATASET_NAME = "cb"

    def has_training_docs(self):
        return True

    def training_docs(self):
        if self._training_docs is None:
            self._training_docs = list(self.dataset["train"])
        return self._training_docs

    def validation_docs(self):
        return self.dataset["validation"]

    def doc_to_text(self, doc):
        return "{}\nQuestion: {}. True, False or Neither?\nAnswer:".format(
            doc["premise"], doc["hypothesis"])

    def doc_to_target(self, doc):
        return " {}".format({0: "True", 1: "False", 2: "Neither"}[doc["label"]])

    def construct_requests(self, doc, ctx):
        return [loglikelihood(ctx, " True"), loglikelihood(ctx, " False"),
                loglikelihood(ctx, " Neither")]

    def process_results(self, doc, results):
        lls = [r[0] for r in results]
        gold = doc["label"]
        pred = int(np.argmax(lls))
        return {"acc": 1.0 if pred == gold else 0.0, "f1": (pred, gold)}

    def higher_is_better(self):
        return {"acc": True, "f1": True}

    def aggregation(self):
        return {"acc": mean, "f1": multi_f1(3)}


class Copa(Task):
    """(reference: tasks/superglue.py:171-246)."""

    DATASET_PATH = "super_glue"
    DATASET_NAME = "copa"

    def has_training_docs(self):
        return True

    def training_docs(self):
        if self._training_docs is None:
            self._training_docs = list(self.dataset["train"])
        return self._training_docs

    def validation_docs(self):
        return self.dataset["validation"]

    @staticmethod
    def convert_choice(choice):
        return choice[0].lower() + choice[1:]

    def doc_to_text(self, doc):
        connector = {"cause": "because", "effect": "therefore"}[doc["question"]]
        return doc["premise"].strip()[:-1] + f" {connector}"

    def doc_to_target(self, doc):
        correct = doc["choice1"] if doc["label"] == 0 else doc["choice2"]
        return " " + self.convert_choice(correct)

    def construct_requests(self, doc, ctx):
        return [
            loglikelihood(ctx, " " + self.convert_choice(doc["choice1"])),
            loglikelihood(ctx, " " + self.convert_choice(doc["choice2"])),
        ]

    def process_results(self, doc, results):
        pred = int(np.argmax([r[0] for r in results]))
        return {"acc": 1.0 if pred == doc["label"] else 0.0}

    def higher_is_better(self):
        return {"acc": True}

    def aggregation(self):
        return {"acc": mean}


class WiC(Task):
    """(reference: tasks/superglue.py:377-431)."""

    DATASET_PATH = "super_glue"
    DATASET_NAME = "wic"

    def has_training_docs(self):
        return True

    def training_docs(self):
        if self._training_docs is None:
            self._training_docs = list(self.dataset["train"])
        return self._training_docs

    def validation_docs(self):
        return self.dataset["validation"]

    def doc_to_text(self, doc):
        return (
            "Sentence 1: {}\nSentence 2: {}\nQuestion: Is the word '{}' used in the"
            " same way in the two sentences above?\nAnswer:".format(
                doc["sentence1"], doc["sentence2"],
                doc["sentence1"][doc["start1"]: doc["end1"]])
        )

    def doc_to_target(self, doc):
        return " {}".format({0: "no", 1: "yes"}[doc["label"]])

    def construct_requests(self, doc, ctx):
        return [loglikelihood(ctx, " yes"), loglikelihood(ctx, " no")]

    def process_results(self, doc, results):
        (ll_yes, _), (ll_no, _) = results
        return {"acc": 1.0 if (ll_yes > ll_no) == doc["label"] else 0.0}

    def higher_is_better(self):
        return {"acc": True}

    def aggregation(self):
        return {"acc": mean}


class WSC(Task):
    """(reference: tasks/superglue.py:434-499)."""

    DATASET_PATH = "super_glue"
    DATASET_NAME = "wsc"

    def has_training_docs(self):
        return True

    def training_docs(self):
        if self._training_docs is None:
            self._training_docs = [d for d in self.dataset["train"] if d["label"]]
        return self._training_docs

    def validation_docs(self):
        return self.dataset["validation"]

    def doc_to_text(self, doc):
        raw = doc["text"]
        pre = " ".join(raw.split()[: doc["span2_index"]])
        post = raw[len(pre) + len(doc["span2_text"]) + 1:]
        passage = general_detokenize(pre + " *{}*".format(doc["span2_text"]) + post)
        return (
            f"Passage: {passage}\n"
            + f'Question: In the passage above, does the pronoun "*{doc["span2_text"]}*" '
            + f'refer to "*{doc["span1_text"]}*"?\n'
            + "Answer:"
        )

    def doc_to_target(self, doc):
        return " " + yesno(doc["label"])

    def construct_requests(self, doc, ctx):
        return [loglikelihood(ctx, " yes"), loglikelihood(ctx, " no")]

    def process_results(self, doc, results):
        (ll_yes, _), (ll_no, _) = results
        return {"acc": 1.0 if (ll_yes > ll_no) == doc["label"] else 0.0}

    def higher_is_better(self):
        return {"acc": True}

    def aggregation(self):
        return {"acc": mean}


class MultiRC(Task):
    """(reference: tasks/superglue.py:249-282)."""

    DATASET_PATH = "super_glue"
    DATASET_NAME = "multirc"

    def has_training_docs(self):
        return True

    def training_docs(self):
        if self._training_docs is None:
            self._training_docs = list(self.dataset["train"])
        return self._training_docs

    def validation_docs(self):
        return self.dataset["validation"]

    def doc_to_text(self, doc):
        return f"{doc['paragraph']}\nQuestion: {doc['question']}\nAnswer:"

    @staticmethod
    def format_answer(answer, label):
        label_str = "yes" if label else "no"
        return f"{answer}\nIs the answer correct? {label_str}"

    def doc_to_target(self, doc):
        return " " + self.format_answer(doc["answer"], doc["label"])

    def construct_requests(self, doc, ctx):
        t = self.format_answer(doc["answer"], True)
        f = self.format_answer(doc["answer"], False)
        return [loglikelihood(ctx, f" {t}"), loglikelihood(ctx, f" {f}")]

    def process_results(self, doc, results):
        (ll_t, _), (ll_f, _) = results
        return {"acc": (ll_t > ll_f, doc)}

    def higher_is_better(self):
        return {"acc": True}

    def aggregation(self):
        return {"acc": acc_all}


class ReCoRD(Task):
    """(reference: tasks/superglue.py:285-375)."""

    DATASET_PATH = "super_glue"
    DATASET_NAME = "record"

    def has_training_docs(self):
        return True

    def training_docs(self):
        if self._training_docs is None:
            self._training_docs = [
                self._process_doc(d) for d in self.dataset["train"]
            ]
        return self._training_docs

    def validation_docs(self):
        return map(self._process_doc, self.dataset["validation"])

    @classmethod
    def _process_doc(cls, doc):
        return {
            "passage": doc["passage"],
            "query": doc["query"],
            "entities": sorted(set(doc["entities"])),
            "answers": sorted(set(doc["answers"])),
        }

    def doc_to_text(self, doc):
        initial_text, *highlights = doc["passage"].strip().split("\n@highlight\n")
        text = initial_text + "\n\n"
        for h in highlights:
            text += f"  - {h}.\n"
        return text

    @classmethod
    def format_answer(cls, query, entity):
        return f"  - {query}".replace("@placeholder", entity)

    def doc_to_target(self, doc):
        return self.format_answer(doc["query"], doc["answers"][0])

    def construct_requests(self, doc, ctx):
        return [
            loglikelihood(ctx, self.format_answer(doc["query"], entity))
            for entity in doc["entities"]
        ]

    def process_results(self, doc, results):
        max_idx = int(np.argmax([r[0] for r in results]))
        prediction = doc["entities"][max_idx]
        golds = doc["answers"]
        return {
            "f1": metric_max_over_ground_truths(compute_f1, prediction, golds),
            "em": metric_max_over_ground_truths(compute_exact, prediction, golds),
        }

    def higher_is_better(self):
        return {"f1": True, "em": True}

    def aggregation(self):
        return {"f1": mean, "em": mean}


class RTE(Task):
    """(reference: tasks/glue.py:335-385)."""

    DATASET_PATH = "glue"
    DATASET_NAME = "rte"

    def has_training_docs(self):
        return True

    def training_docs(self):
        if self._training_docs is None:
            self._training_docs = list(self.dataset["train"])
        return self._training_docs

    def validation_docs(self):
        return self.dataset["validation"]

    def doc_to_text(self, doc):
        return "{}\nQuestion: {} True or False?\nAnswer:".format(
            doc["sentence1"], doc["sentence2"])

    def doc_to_target(self, doc):
        return " {}".format({0: "True", 1: "False"}[doc["label"]])

    def construct_requests(self, doc, ctx):
        return [loglikelihood(ctx, " True"), loglikelihood(ctx, " False")]

    def process_results(self, doc, results):
        (ll_true, _), (ll_false, _) = results
        pred = ll_false > ll_true
        return {"acc": float(pred == doc["label"])}

    def higher_is_better(self):
        return {"acc": True}

    def aggregation(self):
        return {"acc": mean}


class Lambada(Task):
    """(reference: tasks/lambada.py:42-90; the local zenodo loader —
    tasks/local_datasets/lambada/lambada.py — becomes a plain jsonl load:
    pass data_dir containing a lambada *.jsonl to score fully offline)."""

    DATASET_PATH = "EleutherAI/lambada_openai"
    DATASET_NAME = "en"
    LOCAL_DATA_DIR = True  # download() consumes data_dir (offline files)

    def download(self, data_dir=None, cache_dir=None):
        import glob
        import json
        import os

        if data_dir:
            cands = (glob.glob(os.path.join(data_dir, "lambada*.jsonl"))
                     or glob.glob(os.path.join(data_dir, "*.jsonl")))
            if len(cands) > 1:
                raise ValueError(
                    f"ambiguous lambada data_dir (several jsonl files): "
                    f"{sorted(cands)}; keep exactly one")
            if cands:
                with open(cands[0]) as f:
                    docs = [json.loads(line) for line in f if line.strip()]
                self.dataset = {"test": docs}
                return
        super().download(data_dir, cache_dir)

    @staticmethod
    def preprocess(text):
        text = text.replace("“", '"').replace("”", '"')
        text = text.replace("''", '"').replace("``", '"')
        return "\n" + text.strip()

    def validation_docs(self):
        split = "validation" if "validation" in self.dataset else "test"
        return self.dataset[split]

    def doc_to_text(self, doc):
        return self.preprocess(doc["text"].strip()).rsplit(" ", 1)[0]

    def doc_to_target(self, doc):
        return " " + doc["text"].rsplit(" ", 1)[1]

    def construct_requests(self, doc, ctx):
        return [loglikelihood(ctx, self.doc_to_target(doc))]

    def process_results(self, doc, results):
        ((ll, is_greedy),) = results
        return {"ppl": ll, "acc": int(is_greedy)}

    def aggregation(self):
        return {"ppl": perplexity, "acc": mean}

    def higher_is_better(self):
        return {"ppl": False, "acc": True}


class StoryCloze(MultipleChoiceTask):
    """(reference: tasks/storycloze.py loads a local 2018 CSV from
    tasks/local_datasets/storyCloze2018; pass data_dir containing that CSV
    — columns InputSentence1..4, RandomFifthSentenceQuiz1/2,
    AnswerRightEnding — to score fully offline)."""

    DATASET_PATH = "story_cloze"
    DATASET_NAME = "2018"
    LOCAL_DATA_DIR = True  # download() consumes data_dir (offline CSV)

    def download(self, data_dir=None, cache_dir=None):
        import csv
        import glob
        import os

        if data_dir:
            # prefer the validation-split CSV (the 2018 release ships
            # cloze_test_val*.csv next to the test split); error rather
            # than silently scoring the wrong file
            cands = (glob.glob(os.path.join(data_dir, "*val*.csv"))
                     or glob.glob(os.path.join(data_dir, "*.csv")))
            if len(cands) > 1:
                raise ValueError(
                    f"ambiguous storycloze data_dir (several CSVs): "
                    f"{sorted(cands)}; keep one *val*.csv")
            if cands:
                docs = []
                with open(cands[0], newline="") as f:
                    for row in csv.DictReader(f):
                        docs.append({
                            "input_sentence_1": row["InputSentence1"],
                            "input_sentence_2": row["InputSentence2"],
                            "input_sentence_3": row["InputSentence3"],
                            "input_sentence_4": row["InputSentence4"],
                            "sentence_quiz1": row["RandomFifthSentenceQuiz1"],
                            "sentence_quiz2": row["RandomFifthSentenceQuiz2"],
                            "answer_right_ending":
                                int(row["AnswerRightEnding"]),
                        })
                self.dataset = {"validation": docs}
                return
        super().download(data_dir, cache_dir)

    def validation_docs(self):
        return map(self._process_doc, self.dataset["validation"])

    def _process_doc(self, doc):
        return {
            "query": " ".join([
                doc["input_sentence_1"], doc["input_sentence_2"],
                doc["input_sentence_3"], doc["input_sentence_4"],
            ]),
            "choices": [doc["sentence_quiz1"], doc["sentence_quiz2"]],
            "gold": doc["answer_right_ending"] - 1,
        }

    def doc_to_text(self, doc):
        return doc["query"]

    def process_results(self, doc, results):
        lls = np.asarray([r[0] for r in results])
        return {"acc": 1.0 if int(np.argmax(lls)) == doc["gold"] else 0.0}

    def higher_is_better(self):
        return {"acc": True}

    def aggregation(self):
        return {"acc": mean}


TASK_REGISTRY = {
    "lambada": Lambada,
    "piqa": PiQA,
    "arc_easy": ARCEasy,
    "arc_challenge": ARCChallenge,
    "boolq": BoolQ,
    "cb": CommitmentBank,
    "copa": Copa,
    "wic": WiC,
    "wsc": WSC,
    "multirc": MultiRC,
    "rte": RTE,
    "record": ReCoRD,
    "storycloze": StoryCloze,
}


def get_task(name: str, **kw) -> Task:
    return TASK_REGISTRY[name](**kw)
