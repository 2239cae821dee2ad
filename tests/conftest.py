"""Test environment: force the CPU backend with 8 virtual devices so
sharding tests run without TPU hardware (SURVEY.md §4.4)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The environment's sitecustomize registers a TPU-tunnel backend and
# force-sets jax_platforms before user code runs; the env var alone is
# too late. Override the config directly (backends aren't initialized
# until first use, so this still wins).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
