#!/usr/bin/env python
"""Headline benchmark: DBDE codec throughput per chip, three configs.

Prints ONE JSON line.  Top-level fields are the flagship config (camera
2048x2048 decode Gpix/s — BASELINE.json's north star); the ``configs``
object carries the other two regimes the codec's dispatch ladder serves:

  * ``random_2048``  — incompressible, all tiles depth 8: the uniform-8
    closed-form permutation kernels (the reference's own depth-8 special
    case, dbde_util.cpp:57-63).
  * ``random_2536x2048`` — the reference test driver's own default bench
    geometry (dbde_util_test.cpp:303-349), ragged width (k=2 band fold).

vs_baseline is relative to the reference C library's single-core numbers
(~2.8 enc / 2.9 dec Gpix/s measured in this environment, library -O3 /
driver -O0 — build provenance and clock convention in BASELINE.md).
Every config's throughput is integrity-checked inline (bench_core._run_bench
asserts decoded pixels == source before reporting).
"""

import json
import sys

sys.path.insert(0, ".")

from dbde_tpu.bench_core import run_bench


def _sub(r: dict) -> dict:
    """Compact per-config record for the nested ``configs`` object."""
    return {
        "decode_gpix_per_s": r["value"],
        "decode_vs_baseline": r["vs_baseline"],
        "encode_gpix_per_s": r["encode_gpix_per_s"],
        "encode_vs_baseline": r["encode_vs_baseline"],
        "geometry": r["geometry"],
        "content": r["content"],
        "compression_ratio": r["compression_ratio"],
    }


if __name__ == "__main__":
    out = run_bench(width=2048, height=2048, frames=8, iters=20, content="camera")
    configs = {"camera_2048": _sub(out)}
    for key, kw in (
        ("random_2048", dict(width=2048, height=2048, frames=8, iters=12,
                             content="random")),
        ("random_2536x2048", dict(width=2536, height=2048, frames=8, iters=12,
                                  content="random")),
    ):
        try:
            configs[key] = _sub(run_bench(**kw))
        except Exception as e:  # one flaky config must not hide the others
            configs[key] = {"error": f"{type(e).__name__}: {e}"}
    out["configs"] = configs
    print(json.dumps(out))
