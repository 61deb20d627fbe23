from gptq_tpu.eval.ppl import eval_ppl  # noqa: F401
