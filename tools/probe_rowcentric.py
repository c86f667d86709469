#!/usr/bin/env python
"""A/B the row-centric compaction (real TPU): payload-kernel time + parity.

Row-centric (kernel_common._compact_chunk_rowcentric) shapes compaction ops
(groups, 128) with a pair-row LEVEL loop bounded by mplanes — the branchless
depth-class grid split ENCODE_COMPACT_CLASSES' header names as the only
viable route.  Usage:

  python tools/probe_rowcentric.py [content] [WxH] [mplanes ...]
"""
import sys

sys.path.insert(0, ".")

import numpy as np

from dbde_tpu.bench_core import make_content
from dbde_tpu.codec import DbdeCodec
from dbde_tpu.ops import pallas_band as pb
from dbde_tpu.utils.profiling import measure_device_seconds

import jax

content = sys.argv[1] if len(sys.argv) > 1 else "camera"
geom = sys.argv[2] if len(sys.argv) > 2 else "2048x2048"
W, H = (int(x) for x in geom.split("x"))
variants = [int(a) for a in sys.argv[3:]] or [5, 8]
B = 8
src = make_content(W, H, B, content)
codec = DbdeCodec(height=H, width=W, backend="band")
img32 = codec._to_img32(src)
npix = B * H * W

d3, m3 = pb.encode_depths_kernel(img32)
maxd = int(np.asarray(d3).max())
print(f"content={content} geom={geom} batch max depth = {maxd}")
meta = jax.jit(lambda d: pb.stream_meta(d, img32.shape[2] * 4))(d3)
live = 2 * np.asarray(d3).astype(np.int64).reshape(B, -1).sum(1)

ref_payload = None
for mp in variants:
    if mp < maxd:
        print(f"mplanes={mp}: skipped (< max depth {maxd})")
        continue
    for rc, pf in ((False, False), (True, False), (True, True)):
        pb.ENCODE_ROWCENTRIC_COMPACTION = rc
        pb.ENCODE_CHUNK_PREFETCH = pf
        tag = f"mplanes={mp} rowcentric={rc} prefetch={pf}"
        fn = jax.jit(lambda meta, img32, d3, m3, mp=mp, _=(rc, pf):
                     pb.encode_payload_kernel(meta, img32, d3, m3, mplanes=mp))
        try:
            t = measure_device_seconds(fn, meta, img32, d3, m3, reps=6)
            payload = np.asarray(fn(meta, img32, d3, m3))
        except Exception as e:
            print(f"{tag}: FAILED {type(e).__name__}: {e}")
            continue
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
        print(f"{tag}: payload kernel {t*1e3:.3f} ms  {ok}")

# whole-encode effect at the best setting per mplanes
def _enc(img32, mp):
    d3, m3 = pb.encode_depths_kernel(img32)
    meta = pb.stream_meta(d3, img32.shape[2] * 4)
    payload = pb.encode_payload_kernel(meta, img32, d3, m3, mplanes=mp)
    return d3, m3, payload

for mp in variants:
    if mp < maxd:
        continue
    for rc, pf in ((False, False), (True, False), (True, True)):
        pb.ENCODE_ROWCENTRIC_COMPACTION = rc
        pb.ENCODE_CHUNK_PREFETCH = pf
        enc = jax.jit(lambda img32, mp=mp, _=(rc, pf): _enc(img32, mp))
        t = measure_device_seconds(enc, img32, reps=6)
        print(f"mplanes={mp} rowcentric={rc} prefetch={pf}: whole encode "
              f"{t*1e3:.3f} ms = {npix/t/1e9:.1f} Gpix/s")
pb.ENCODE_ROWCENTRIC_COMPACTION = False
pb.ENCODE_CHUNK_PREFETCH = False
