"""Test config: run on CPU with 8 virtual devices so sharding/collective
tests work without a TPU pod (the JAX-idiomatic fake multi-device backend;
replaces the reference's CUDA-twin skipif pattern, SURVEY.md §4).

The container's sitecustomize imports jax and pins JAX_PLATFORMS=axon (the
TPU tunnel) at interpreter startup, so mutating os.environ here is too
late for the platform choice — use jax.config.update, which works any time
before first backend use. XLA_FLAGS is still read lazily at backend init.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.device_count() == 8, jax.devices()
