"""Subprocess child for test_prod_geometry: the PRODUCTION block geometry.

Runs the band codec with the shipped adaptive grid-block policy
(``pallas_band.BANDS_MULT = None`` — H-aware ladder choice, split
encode/decode caps) in Pallas interpreter mode and checks byte parity
against the numpy oracle.  The main CPU suite pins ``BANDS_MULT = 2``
for the whole process (tests/conftest.py — the bigger production
programs segfault XLA:CPU in long sessions at the kernel's mmap-count
limit), so the production policy's *kernel execution* only happens here,
in a fresh process whose map count never nears the limit.

Geometry (W=1024, H=136, the smallest multi-block production choice):
the H-aware ladder must pick 64-row blocks (pad 136 → 192 rows, 3 grid
blocks — cheaper than 128-row at 256 or 256-row at 256 under the
measured per-row block penalty), and ``n_bands`` inference from the
padded shape must agree — a pad_rows/n_bands/kernel interaction
regression fails this script.  Content is the adversarial exact-depth
generator (depth-0 runs, depth-8 group tails, extreme minima).

Run directly (``python tests/prod_geom_child.py``) or via the parent
test.  Exit 0 = parity holds.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# share the suite's persistent kernel cache: cold interpreter compiles of
# these programs take minutes; repeats load in seconds
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_dbde_tests"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402

_orig_pallas_call = pl.pallas_call


def _interp(*a, **kw):
    kw["interpret"] = True
    return _orig_pallas_call(*a, **kw)


pl.pallas_call = _interp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dbde_tpu.ops import pallas_band as pb  # noqa: E402

assert pb.BANDS_MULT is None, (
    f"production default changed: BANDS_MULT={pb.BANDS_MULT!r}")

H, W = 136, 1024

# policy: 64-row blocks, 192 padded rows (not the 128/256-row ladder entries)
assert pb.pad_rows(H, W) == 192, pb.pad_rows(H, W)
# inference from the padded shape agrees, under both kernel caps
assert pb.n_bands(W, 192) == 8, pb.n_bands(W, 192)
assert pb.n_bands(W, 192, pb.BLOCK_GROUPS_CAP_DEC) == 8

from dbde_tpu import ref_numpy as ref  # noqa: E402
from dbde_tpu.bench_core import make_adversarial  # noqa: E402
from dbde_tpu.codec import DbdeCodec, pack_frames_bytes  # noqa: E402

frames = make_adversarial(W, H, 2, maxd=8, seed=5)
codec = DbdeCodec(height=H, width=W, backend="band")
enc = codec.encode(frames)
recs = pack_frames_bytes(enc)
for b in range(len(frames)):
    assert recs[b][20:] == ref.pack_image(frames[b]), f"encode bytes, frame {b}"
out = codec.decode(enc.depths, enc.mins, enc.payload)
np.testing.assert_array_equal(out, frames)
print("prod-geometry parity OK")
