"""Task abstractions (reference: zeroShot/tasks/tasks_utils.py:98-449).

Requests are plain tuples ("loglikelihood", context, continuation) instead
of the reference's RequestFactory indirection; the evaluator resolves them
in one batched LM pass and hands each task back exactly the list its
construct_requests declared."""

from __future__ import annotations

import abc
import random
from typing import Any

from gptq_tpu.eval.zeroshot.metrics import mean

Request = tuple  # ("loglikelihood", ctx: str, cont: str)


def loglikelihood(ctx: str, cont: str) -> Request:
    return ("loglikelihood", ctx, cont)


def general_detokenize(s: str) -> str:
    s = s.replace(" n't", "n't").replace(" )", ")").replace("( ", "(")
    s = s.replace('" ', '"').replace(' "', '"').replace(" 's", "'s")
    for p in (",", ";", ":", ".", "?", "!"):
        s = s.replace(f" {p}", p)
    return s


def yesno(x) -> str:
    return "yes" if x else "no"


class Task(abc.ABC):
    VERSION = 0
    DATASET_PATH: str | None = None
    DATASET_NAME: str | None = None
    # True when download() reads local files from data_dir (offline tasks);
    # hub-backed tasks must NOT receive a data_dir (HF datasets would treat
    # it as the builder's data-files location)
    LOCAL_DATA_DIR = False

    def __init__(self, data_dir=None, cache_dir=None, dataset=None):
        """`dataset` may inject a pre-loaded/dict-of-splits dataset (offline
        tests, local CSVs); otherwise HF datasets loads DATASET_PATH."""
        if dataset is not None:
            self.dataset = dataset
        else:
            self.download(data_dir, cache_dir)
        self._training_docs = None
        self._fewshot_docs = None

    def download(self, data_dir=None, cache_dir=None):
        import datasets

        self.dataset = datasets.load_dataset(
            path=self.DATASET_PATH, name=self.DATASET_NAME,
            data_dir=data_dir, cache_dir=cache_dir,
        )

    def has_training_docs(self) -> bool:
        return False

    def has_validation_docs(self) -> bool:
        return True

    def has_test_docs(self) -> bool:
        return False

    def training_docs(self):
        return []

    def validation_docs(self):
        return []

    def test_docs(self):
        return []

    def _process_doc(self, doc):
        return doc

    def fewshot_examples(self, k, rnd):
        if self._training_docs is None:
            self._training_docs = list(self.training_docs())
        return rnd.sample(self._training_docs, k)

    @abc.abstractmethod
    def doc_to_text(self, doc) -> str: ...

    @abc.abstractmethod
    def doc_to_target(self, doc) -> str: ...

    @abc.abstractmethod
    def construct_requests(self, doc, ctx) -> list[Request]: ...

    @abc.abstractmethod
    def process_results(self, doc, results) -> dict[str, Any]: ...

    @abc.abstractmethod
    def aggregation(self) -> dict[str, Any]: ...

    @abc.abstractmethod
    def higher_is_better(self) -> dict[str, bool]: ...

    def fewshot_context(self, doc, num_fewshot, rnd: random.Random,
                        description: str | None = None) -> str:
        """(reference: tasks_utils.py:301-368)."""
        description = description + "\n\n" if description else ""
        if num_fewshot == 0:
            labeled = ""
        else:
            if self.has_training_docs():
                shots = self.fewshot_examples(k=num_fewshot, rnd=rnd)
            else:
                if self._fewshot_docs is None:
                    self._fewshot_docs = list(
                        self.validation_docs() if self.has_validation_docs()
                        else self.test_docs()
                    )
                shots = rnd.sample(self._fewshot_docs, num_fewshot + 1)
                shots = [x for x in shots if x != doc][:num_fewshot]
            labeled = "\n\n".join(
                self.doc_to_text(d) + self.doc_to_target(d) for d in shots
            ) + "\n\n"
        return description + labeled + self.doc_to_text(doc)


class MultipleChoiceTask(Task):
    """(reference: tasks_utils.py:371-404)."""

    def doc_to_target(self, doc):
        return " " + doc["choices"][doc["gold"]]

    def construct_requests(self, doc, ctx):
        return [loglikelihood(ctx, f" {choice}") for choice in doc["choices"]]

    def process_results(self, doc, results):
        import numpy as np

        lls = np.asarray([r[0] for r in results])
        gold = doc["gold"]
        acc = 1.0 if int(np.argmax(lls)) == gold else 0.0
        lens = np.asarray([float(len(c)) for c in doc["choices"]])
        acc_norm = 1.0 if int(np.argmax(lls / lens)) == gold else 0.0
        return {"acc": acc, "acc_norm": acc_norm}

    def higher_is_better(self):
        return {"acc": True, "acc_norm": True}

    def aggregation(self):
        return {"acc": mean, "acc_norm": mean}
