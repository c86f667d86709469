#!/usr/bin/env python
"""Measure the sharded file layer's HOST legs (no device needed).

The mesh walker's per-batch host work is: record parse (shared with the
single-chip walker, measured in the composed bench) + ``split_payload_host``
(file-flat → per-shard segments) on read, and ``assemble_payload_padded``
(per-shard segments → record-ready padded matrix) on write.  This tool times
those two glue functions standalone on realistic camera-statistics payloads,
so the sharded-walker numbers rest on measurement (round-4 verdict weak #3:
"host glue correctness-grade, unmeasured").

Usage: python tools/probe_sharded_io.py [WxH] [batch] [n_tiles ...]
"""
import sys
import time

sys.path.insert(0, ".")

import numpy as np

geom = sys.argv[1] if len(sys.argv) > 1 else "2048x2048"
W, H = (int(x) for x in geom.split("x"))
B = int(sys.argv[2]) if len(sys.argv) > 2 else 16
tile_variants = [int(a) for a in sys.argv[3:]] or [4, 8]

from dbde_tpu.format import tile_grid
from dbde_tpu.parallel.sharding import (
    assemble_payload_padded,
    segment_slot_words,
    split_payload_host,
)

rng = np.random.default_rng(0)
h, w = tile_grid(W, H)
T = h * w

# camera-statistics depth grid (mixed 0..5, mean ≈ 2.2 — matches
# bench_core.make_content("camera") encodes measured on TPU)
depths = np.minimum(rng.poisson(2.2, (B, T)), 5).astype(np.uint8)
words = 2 * depths.astype(np.int64).sum(1)
mx = int(words.max())
payload = rng.integers(0, 1 << 32, (B, mx), dtype=np.uint32)
print(f"geom {B}x{H}x{W}: T={T} tiles, mean depth "
      f"{depths.mean():.2f}, {words.mean()/1e3:.0f}k words/frame "
      f"({words.mean()*4/1e6:.1f} MB/frame live)")


def timeit(fn, reps=5):
    fn()  # warm (allocator, page faults)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


for n_tiles in tile_variants:
    if h % n_tiles:
        print(f"n_tiles={n_tiles}: skipped (h={h} not divisible)")
        continue
    S_local = segment_slot_words(W, H, n_tiles, backend="band")
    t_split = timeit(lambda: split_payload_host(
        payload, depths, H, W, n_tiles, backend="band"))
    segs = split_payload_host(payload, depths, H, W, n_tiles, backend="band")
    t_split_pool = timeit(lambda: split_payload_host(
        payload, depths, H, W, n_tiles, backend="band", out=segs))
    totals = (2 * depths.reshape(B, n_tiles, -1).astype(np.int64).sum(-1)).T
    t_asm = timeit(lambda: assemble_payload_padded(segs, totals))
    pay, _ = assemble_payload_padded(segs, totals)
    t_asm_pool = timeit(lambda: assemble_payload_padded(segs, totals, out=pay))
    live_mb = words.sum() * 4 / 1e6
    print(f"n_tiles={n_tiles} (slot {S_local*4/1e6:.2f} MB/shard): "
          f"split {t_split*1e3:.2f} ms/batch fresh / {t_split_pool*1e3:.2f} "
          f"pooled ({live_mb/t_split_pool/1e3:.1f} GB/s), "
          f"assemble {t_asm*1e3:.2f} fresh / {t_asm_pool*1e3:.2f} reused "
          f"({live_mb/t_asm_pool/1e3:.1f} GB/s)")
