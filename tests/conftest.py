"""Test harness configuration.

Forces the CPU backend (the axon sitecustomize pins JAX_PLATFORMS=axon, which
would route every test through the remote TPU tunnel with emulated f64) with
8 virtual devices for mesh/sharding tests, and enables x64 so parity oracles
run at full precision.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
