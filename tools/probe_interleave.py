#!/usr/bin/env python
"""Measure INTERLEAVE_WIDTH x mplanes payload-kernel variants (real TPU).

The step-major compaction searches interleave kernel_common.INTERLEAVE_WIDTH
groups; width 8 with everything interleaved spilled vregs at mplanes=8
(33.1 -> 28.7).  The reduced-plane variants (mplanes=5) cut the candidate
stage's register pressure ~2x, so wider search interleaves may now fit.
Usage: python tools/probe_interleave.py [content] [mplanes] [widths ...]
"""
import sys

sys.path.insert(0, ".")

import numpy as np
import jax

from dbde_tpu.bench_core import make_content
from dbde_tpu.codec import DbdeCodec
from dbde_tpu.ops import kernel_common as kc
from dbde_tpu.ops import pallas_band as pb
from dbde_tpu.utils.profiling import measure_device_seconds

content = sys.argv[1] if len(sys.argv) > 1 else "camera"
mp = int(sys.argv[2]) if len(sys.argv) > 2 else 5
widths = [int(a) for a in sys.argv[3:]] or [4, 6, 8]
H = W = 2048
B = 8
src = make_content(W, H, B, content)
codec = DbdeCodec(height=H, width=W, backend="band")
img32 = codec._to_img32(src)
d3, m3 = pb.encode_depths_kernel(img32)
meta = jax.jit(lambda d: pb.stream_meta(d, W))(d3)
live = 2 * np.asarray(d3).astype(np.int64).reshape(B, -1).sum(1)
ref_payload = None
for iw in widths:
    kc.INTERLEAVE_WIDTH = iw
    fn = jax.jit(lambda meta, img32, d3, m3, mp=mp, iw=iw: pb.encode_payload_kernel(
        meta, img32, d3, m3, mplanes=mp, pair_rows=8 - 0 * iw))  # iw baked via global
    t = measure_device_seconds(fn, meta, img32, d3, m3, reps=6)
    payload = np.asarray(fn(meta, img32, d3, m3))
    if ref_payload is None:
        ref_payload = payload
        ok = "(baseline)"
    else:
        ok = all(
            (payload.reshape(B, -1)[b, : live[b]] ==
             ref_payload.reshape(B, -1)[b, : live[b]]).all()
            for b in range(B)
        )
        ok = "parity OK" if ok else "PARITY FAIL"
    print(f"iw={iw} mplanes={mp}: payload kernel {t*1e3:.3f} ms  {ok}", flush=True)
kc.INTERLEAVE_WIDTH = 4
