"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on XLA's host platform with 8 virtual devices.  Must run before the
first ``import jax`` anywhere in the test process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell may preset a TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The axon TPU plugin ignores the env var; force the platform via config too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# The interpreter-mode Pallas kernels compile to huge CPU programs (minutes
# each on a small runner); persist compiled artifacts so repeat runs of the
# suite pay seconds instead.  Safe across code changes: the cache key is the
# HLO, so any kernel change recompiles.
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_dbde_tests"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
