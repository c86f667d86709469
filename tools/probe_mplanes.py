#!/usr/bin/env python
"""Measure the reduced-plane payload-kernel variants (real TPU).

mplanes bounds every tile depth in the batch; camera content is depth <= 5,
so the mplanes=5 variant skips 3 of 8 candidate planes in the compaction --
the encode's dominant gather-row cost -- plus their pack/zero work.
Usage: python tools/probe_mplanes.py [content] [mplanes ...]
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
rest = sys.argv[2:]
sigma = None
if rest and "." in rest[0]:  # optional noise-scale override (e.g. 0.35)
    sigma = float(rest[0])
    rest = rest[1:]
variants = [int(a) for a in rest] or [8, 6, 5, 4]
H = W = 2048
B = 8
src = make_content(W, H, B, content, sigma=sigma)
codec = DbdeCodec(height=H, width=W, backend="band")
img32 = codec._to_img32(src)
maxd = 0

d3, m3 = pb.encode_depths_kernel(img32)
maxd = int(np.asarray(d3).max())
print(f"content={content} batch max depth = {maxd}")

meta = jax.jit(lambda d: pb.stream_meta(d, W))(d3)
ref_payload = None
npix = B * H * W
for mp in variants:
    if mp < maxd:
        print(f"mplanes={mp}: skipped (< max depth {maxd})")
        continue
    fn = jax.jit(lambda meta, img32, d3, m3, mp=mp: pb.encode_payload_kernel(
        meta, img32, d3, m3, mplanes=mp))
    t = measure_device_seconds(fn, meta, img32, d3, m3, reps=6)
    payload = np.asarray(fn(meta, img32, d3, m3))
    n64 = int(np.asarray(d3).astype(np.int64).sum() // B)  # avg, words per frame
    if ref_payload is None:
        ref_payload = payload
        ok = "(baseline)"
    else:
        # compare the live prefix per frame
        live = 2 * np.asarray(d3).astype(np.int64).reshape(B, -1).sum(1)
        ok = all(
            (payload.reshape(B, -1)[b, : live[b]] ==
             ref_payload.reshape(B, -1)[b, : live[b]]).all()
            for b in range(B)
        )
        ok = "parity OK" if ok else "PARITY FAIL"
    print(f"mplanes={mp}: payload kernel {t*1e3:.3f} ms  {ok}")

# whole-encode effect
def _enc(img32, mp):
    d3, m3 = pb.encode_depths_kernel(img32)
    meta = pb.stream_meta(d3, W)
    payload = pb.encode_payload_kernel(meta, img32, d3, m3, mplanes=mp)
    return d3, m3, payload

for mp in variants:
    if mp < maxd:
        continue
    enc = jax.jit(lambda img32, mp=mp: _enc(img32, mp))
    t = measure_device_seconds(enc, img32, reps=6)
    print(f"mplanes={mp}: whole encode {t*1e3:.3f} ms = {npix/t/1e9:.1f} Gpix/s")
