"""Test configuration: run everything on CPU with 8 virtual devices so
multi-chip sharding is exercised without TPU hardware (SURVEY.md §4).

The environment pre-sets JAX_PLATFORMS to the TPU tunnel; tests must override
it (not setdefault) and also set the config flag, which wins over the plugin.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu", jax.devices()
