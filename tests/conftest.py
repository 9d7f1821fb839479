"""Test config: run on CPU with 8 virtual devices so sharding/collective
tests work without a TPU pod (the JAX-idiomatic fake multi-device backend;
replaces the reference's CUDA-twin skipif pattern, SURVEY.md §4)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
