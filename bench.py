#!/usr/bin/env python
"""Headline benchmark: DBDE decode throughput per chip on a 2048x2048 u8 stream.

Prints ONE JSON line:
  {"metric": "decode_gpix_per_s", "value": N, "unit": "Gpix/s", "vs_baseline": N, ...}

vs_baseline is relative to the reference C library's single-core decode
(~2.9 Gpix/s measured in this environment, library -O3 / driver -O0 —
build provenance and clock convention in BASELINE.md).
"""

import json
import sys

sys.path.insert(0, ".")

from dbde_tpu.bench_core import run_bench

if __name__ == "__main__":
    print(json.dumps(run_bench(width=2048, height=2048, frames=8, iters=20, content="camera")))
