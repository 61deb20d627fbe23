from gptq_tpu.engine.decode import DecodeEngine, benchmark_decode  # noqa: F401
