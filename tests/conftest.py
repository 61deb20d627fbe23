"""Test configuration: run everything on a virtual 8-device CPU mesh so
sharding logic is testable without a pod (SURVEY.md §4 implication (d)).

Note: this container's sitecustomize registers a remote "axon" TPU backend
and forces jax_platforms="axon,cpu"; the env var alone is not enough, the
config must be overridden after import (eager dispatch over the TPU tunnel
makes tests ~30x slower)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# cache compiled executables across test runs (compile time dominates)
jax.config.update("jax_compilation_cache_dir", "/tmp/gptq_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
