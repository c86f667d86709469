#!/usr/bin/env python
"""Record the round perf matrix on the real TPU (device-timeline time).

Covers the reference driver's bench matrix (dbde_util_test.cpp:303-364):
content x geometry, plus the narrow-width row-folded band path.  One JSON
line per config; integrity is asserted inline by _run_bench (never report
perf on wrong results).
"""
import json
import sys

sys.path.insert(0, ".")

from dbde_tpu.bench_core import _run_bench

B = 8
CONFIGS = [
    # geometry sweep, camera content
    ("camera", 2048, 2048, "auto"),
    ("camera", 1920, 1080, "auto"),
    ("camera", 2536, 2048, "auto"),
    # content sweep at 2048^2
    ("random", 2048, 2048, "auto"),
    ("flat", 2048, 2048, "auto"),
    # narrow widths: row-folded band path (H=2048)
    ("camera", 320, 2048, "band"),
    ("camera", 256, 2048, "band"),
    ("camera", 192, 2048, "band"),
    ("camera", 128, 2048, "band"),
]

for content, w, h, backend in CONFIGS:
    try:
        r = _run_bench(w, h, B, 8, content, backend)
        print(json.dumps({k: r[k] for k in (
            "geometry", "content", "backend", "encode_gpix_per_s", "value",
            "compression_ratio")}), flush=True)
    except Exception as e:  # noqa: BLE001 - record the failure, keep sweeping
        print(json.dumps({"geometry": f"{B}x{h}x{w}", "content": content,
                          "backend": backend, "error": repr(e)[:160]}),
              flush=True)
