"""Test config: force CPU backend with 8 virtual devices.

Multi-chip sharding is tested on a fake 8-device CPU mesh
(xla_force_host_platform_device_count) so the suite runs anywhere; the
driver separately dry-run-compiles the multi-chip path and benchmarks on a
real TPU chip.

Note: the environment may pre-register an accelerator platform at
interpreter start (sitecustomize) and override JAX_PLATFORMS, so the CPU
selection must go through jax.config.update *after* import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
