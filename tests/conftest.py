"""Test configuration: run everything on CPU with 8 virtual devices so
multi-chip sharding is exercised without TPU hardware (SURVEY.md §4).

The environment pre-sets JAX_PLATFORMS to the TPU tunnel; tests must override
it (not setdefault) and also set the config flag, which wins over the plugin.
The tunnel plugin site dir must also come OFF the import path: its
get_backend hook initializes the tunnel client even under JAX_PLATFORMS=cpu,
and when the tunnel relay is down that init retries forever — hanging the
whole suite at the first jax call.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
sys.path[:] = [p for p in sys.path if ".axon_site" not in p]
os.environ["PYTHONPATH"] = os.pathsep.join(
    p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep)
    if p and ".axon_site" not in p)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu", jax.devices()
