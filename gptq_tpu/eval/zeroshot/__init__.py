"""Zero-shot task harness (lm-evaluation-harness style).

Re-design of the reference's vendored fork (reference: zeroShot/): Task /
MultipleChoiceTask ABCs (tasks_utils.py:98,371), 13-task registry
(tasks/__init__.py:18-32), batched length-sorted loglikelihood scoring
(models/models_utils.py:239-409) and bootstrap-stderr aggregation
(metrics.py:192-252)."""

from gptq_tpu.eval.zeroshot.base import MultipleChoiceTask, Task  # noqa: F401
from gptq_tpu.eval.zeroshot.evaluator import evaluate, simple_evaluate  # noqa: F401
from gptq_tpu.eval.zeroshot.lm import JaxLM  # noqa: F401
from gptq_tpu.eval.zeroshot.tasks import TASK_REGISTRY, get_task  # noqa: F401
