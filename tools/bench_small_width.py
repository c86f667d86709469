#!/usr/bin/env python
"""Band-with-column-pad vs tile-layout backend at small widths (real TPU).

The band kernels require W % 1024 == 0 and pad narrower frames with
constant columns (depth-0 tiles, zero payload), so their *effective* rate
on real pixels scales ~W/1024.  The tile-layout path handles any W at a
flat rate.  This records the crossover that sets DbdeCodec's fallback
threshold (codec.py band_width(W) <= K*W rule).
"""
import json
import sys

sys.path.insert(0, ".")

from dbde_tpu.bench_core import _run_bench

H, B = 2048, 8
for W in (320, 256, 192, 128):
    row = {"width": W}
    for backend in ("band", "tiles"):
        try:
            r = _run_bench(W, H, B, 8, "camera", backend)
            row[f"{backend}_enc"] = r["encode_gpix_per_s"]
            row[f"{backend}_dec"] = r["value"]
        except Exception as e:  # noqa: BLE001
            row[f"{backend}_err"] = repr(e)[:120]
    print(json.dumps(row), flush=True)
