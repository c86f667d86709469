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

# Pin the band-kernel grid blocks to the 128-row geometry (BANDS_MULT=2)
# for the CPU suite.  The production width-adaptive 256-row blocks
# (pallas_band.BANDS_MULT=None) quadruple the interpreter-mode padding cost
# of the small CI geometries and produce CPU programs big enough to
# segfault XLA's CPU backend_compile in long pytest sessions (observed at
# W=1024, groups=32 decode after ~10 prior kernel compiles).  The seam
# paths the multi-block tests exist for (cross-block decode window
# prefetch, encode carry) are identical code at every block height — and
# 128-row blocks give the same tests MORE seams (H=300 → nb=3 instead of
# 2).  The shipped 256-row geometry is covered on real TPUs by
# tools/tpu_quickcheck.py and every bench integrity check.
from dbde_tpu.ops import pallas_band as _pb  # noqa: E402

_pb.BANDS_MULT = 2

# Bound the process's live memory-map count.  Root cause (diagnosed on the
# round-3 rig, /proc/self/maps sampled across a cold run): every live
# compiled CPU executable + its device buffers holds thousands of anonymous
# mappings, tests keep codecs/jits referenced for the whole session, and at
# vm.max_map_count (default 65530) a failed mmap inside XLA:CPU is
# unchecked — the suite dies with SIGSEGV in backend_compile or
# executable.serialize() (observed deterministically at ~62k maps, test 51
# of a cold run).  Two independent layers:
#   1. raise the kernel limit when permitted (CI images run as root);
#   2. an autouse fixture that clears jax's executable caches when the map
#      count nears the effective limit.  jax.clear_caches() releases the
#      mappings even while DbdeCodec/jit wrapper objects stay alive
#      (measured 7801 -> 526 maps), and re-runs reload big kernels from the
#      persistent disk cache above (~3x faster than a cold compile), so a
#      trip costs minutes, not a crash.
# DBDE_TEST_MAPS_LIMIT overrides the trip threshold (and skips the kernel
# bump) so the fixture path itself stays testable.
import gc  # noqa: E402

import pytest  # noqa: E402

_MAPS_LIMIT_ENV = os.environ.get("DBDE_TEST_MAPS_LIMIT")
if _MAPS_LIMIT_ENV is None:
    try:
        with open("/proc/sys/vm/max_map_count", "w") as _f:
            _f.write("1048576")
    except OSError:
        pass


def _max_map_count() -> int:
    try:
        with open("/proc/sys/vm/max_map_count") as f:
            return int(f.read())
    except (OSError, ValueError):
        return 65530


_MAPS_LIMIT = (
    int(_MAPS_LIMIT_ENV) if _MAPS_LIMIT_ENV else int(_max_map_count() * 0.7)
)


def _nmaps() -> int:
    try:
        with open("/proc/self/maps") as f:
            return sum(1 for _ in f)
    except OSError:
        return 0


@pytest.fixture(autouse=True)
def _bound_jit_code_maps():
    yield
    if _nmaps() > _MAPS_LIMIT:
        jax.clear_caches()
        gc.collect()
