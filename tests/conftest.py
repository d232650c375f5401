"""Test configuration: force the CPU backend with 8 virtual devices.

The container's sitecustomize registers the axon TPU backend in every Python
process and overrides JAX_PLATFORMS; tests must NOT touch the (single,
exclusive-access) TPU tunnel, so we flip the already-imported jax config back
to cpu here, before any backend is initialized, and request 8 virtual host
devices for multi-chip sharding tests (SURVEY §4: CPU-simulated distributed
tests).
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
