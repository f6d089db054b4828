"""Test configuration: force JAX onto 8 virtual CPU devices.

Multi-chip sharding logic is validated on a virtual CPU mesh
(xla_force_host_platform_device_count), the pattern recommended for testing
pjit/shard_map code without real TPU hardware.

Note: the environment's sitecustomize registers the axon TPU backend at
interpreter startup, so plain env vars are too late here — we use
jax.config.update, which takes effect as long as no computation ran yet.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert all(d.platform == "cpu" for d in jax.devices()), jax.devices()
assert len(jax.devices()) == 8, jax.devices()
