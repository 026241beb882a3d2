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
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# This box has ONE physical core; an 8-thread collective rendezvous can
# take minutes to assemble under load, and XLA:CPU ABORTS the process
# when a participant misses its default terminate timeout (observed as
# "Fatal Python error: Aborted" in block_until_ready in the dp tests;
# pytest's capture swallows the rendezvous log). Give collectives ample
# time instead of crashing.
if "collective_call_terminate_timeout" not in flags:
    flags += (
        " --xla_cpu_collective_call_terminate_timeout_seconds=3600"
        " --xla_cpu_collective_timeout_seconds=3600"
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
    )
os.environ["XLA_FLAGS"] = flags

import jax

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache is OPT-IN (SPS_TEST_CACHE=1): XLA:CPU AOT cache
# entries are keyed without host CPU features, and on this migrating
# container loading an entry compiled elsewhere SIGSEGVs/SIGILLs inside
# backend_compile (observed twice, including entries written within the
# same run — the "+prefer-no-scatter" pseudo-feature mismatch). A cold
# suite recompiles (~60 min on the single core) but finishes.
if os.environ.get("SPS_TEST_CACHE") == "1":
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
        ),
    )
    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
