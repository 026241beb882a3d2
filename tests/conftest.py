"""Test configuration: force an 8-virtual-device CPU platform.

Multi-chip sharding is validated on a virtual CPU mesh (no multi-chip TPU
hardware in CI); single-chip numerics are identical across backends at the
tolerances used here.

Note: some installed pytest plugins import jax before this conftest runs,
so setting JAX_PLATFORMS in os.environ alone is too late — we must also go
through jax.config (backends are not initialized until first use, so this
still takes effect).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
