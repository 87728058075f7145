"""Test configuration: force a local 8-device CPU mesh + float64.

This image boots every Python process with an `axon` TPU-tunnel PJRT
plugin (sitecustomize on PYTHONPATH) whose register() call sets
jax_platforms="axon,cpu", overriding any JAX_PLATFORMS env var and
routing all arrays to the remote TPU — where f64 is emulated at f32
precision and every dispatch pays tunnel latency. Unit tests need the
real CPU backend (tight float64 oracles + an 8-device simulated mesh
for the shard_map distributed tests, SURVEY.md §4.3), so we override
the config again here — conftest runs before any test imports jax and
before any backend is initialized, which is early enough.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(__file__))  # for `import oracle`
