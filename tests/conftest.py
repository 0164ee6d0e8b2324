"""Test configuration: run JAX on CPU with 8 virtual devices so multi-chip
sharding logic is exercised without TPU hardware (and without the slow
axon tunnel round-trips). All parity math in the ops is backend-independent
integer/float32 arithmetic, so CPU results equal TPU results.

Note: the axon TPU plugin ignores the JAX_PLATFORMS env var, so we must
force the platform through jax.config before any device initialization.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
