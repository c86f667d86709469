#!/usr/bin/env python
"""Where does full-path decode time go beyond the Pallas kernel? (real TPU)

The DEC_GROUPS_PER_STAGE sweep measured the decode *kernel* at ~68 Gpix/s
(camera 8x2048²) while the full jitted _decode_fn_band path benches 58.7 —
this dumps the device-timeline event breakdown of the full program to name
the overhead (stream_meta cumsum? lax.switch? output slice/copy?).
Usage: python tools/probe_decode_overhead.py [content]
"""
import sys
import tempfile
import shutil

sys.path.insert(0, ".")

import jax
import numpy as np

from dbde_tpu.bench_core import make_content
from dbde_tpu.codec import DbdeCodec
from dbde_tpu.utils.profiling import device_event_times

content = sys.argv[1] if len(sys.argv) > 1 else "camera"
H = W = 2048
B = 8
src = make_content(W, H, B, content)
codec = DbdeCodec(height=H, width=W, backend="band")
enc = codec.encode(src)
npix = B * H * W

args = (enc.depths, enc.mins, enc.payload)
out = jax.block_until_ready(codec._decode(*args))
np.testing.assert_array_equal(
    np.asarray(out).view(np.uint8)[:, :H, :W], src
)

reps = 8
d = tempfile.mkdtemp(prefix="dbde_prof_")
try:
    with jax.profiler.trace(d):
        for _ in range(reps):
            out = codec._decode(*args)
        jax.block_until_ready(out)
    times = device_event_times(d)
finally:
    shutil.rmtree(d, ignore_errors=True)

rows = sorted(times.items(), key=lambda kv: -kv[1][0])
total_top = rows[0][1][0] if rows else 0.0
print(f"content={content}  reps={reps}  (us total over reps, count)")
for name, (us, n) in rows[:25]:
    print(f"  {us*1e6:10.1f} us  x{n:3d}   {name}")
if rows:
    per = total_top / reps
    print(f"dominant event: {rows[0][0]}  {per*1e3:.3f} ms/exec  "
          f"-> {npix/per/1e9:.1f} Gpix/s")
