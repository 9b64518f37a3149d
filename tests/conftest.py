"""Test env: force CPU with 8 virtual devices so multi-chip sharding paths
run without TPU hardware (SURVEY.md §4 implication (e)).

The container's sitecustomize registers the TPU backend and forces
``jax_platforms`` at interpreter start, so the env var alone is not enough —
we re-point jax at CPU here, before any test touches a device.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) == 8
