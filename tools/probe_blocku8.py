#!/usr/bin/env python
"""A/B the per-BLOCK uniform-8 decode window fast path (real TPU).

DECODE_BLOCK_U8 replaces the 17-row window select chain with a 2-gather
stream alignment + static permutation for grid blocks whose kmask is exactly
1<<8.  Three regimes:
  * mixed   — half the grid blocks pure depth-8, half shallow camera-like:
              the regime the batch-level u8 gate can never serve (one
              shallow tile reverts the whole batch to the general kernels).
  * camera  — no qualifying blocks: measures the pure branch overhead.
  * uniform — every block qualifies: upper bound, compare against the
              dedicated batch-level u8 kernel (decode_band_u8_kernel).

Usage: python tools/probe_blocku8.py [WxH] [frames]
"""
import sys

sys.path.insert(0, ".")

import numpy as np

from dbde_tpu.bench_core import make_content, make_uniform8
from dbde_tpu.codec import DbdeCodec
from dbde_tpu.ops import pallas_band as pb
from dbde_tpu.utils.profiling import measure_device_seconds

import jax

geom = sys.argv[1] if len(sys.argv) > 1 else "2048x2048"
W, H = (int(x) for x in geom.split("x"))
B = int(sys.argv[2]) if len(sys.argv) > 2 else 8
npix = B * H * W

blk = pb.BANDS_MULT * 64 if pb.BANDS_MULT else 256  # grid block pixel rows


def mixed_frames():
    img = np.empty((B, H, W), np.uint8)
    cam = make_content(W, H, B, "camera")
    uni = make_uniform8(W, H, B, seed=2)
    for r0 in range(0, H, blk):
        src = uni if (r0 // blk) % 2 == 0 else cam
        img[:, r0 : r0 + blk] = src[:, r0 : r0 + blk]
    return img


codec = DbdeCodec(height=H, width=W, backend="band")
# camera first: no qualifying blocks, so the u8 arm compiles + ships but
# never fires — the lowest-risk first hardware exposure of the new
# constructs (a bad program wedges the chip; see CLAUDE.md)
for name, frames in (("camera", make_content(W, H, B, "camera")),
                     ("mixed", mixed_frames()),
                     ("uniform", make_uniform8(W, H, B, seed=3))):
    print(f"--- {name}: encoding...", flush=True)
    img32 = jax.device_put(codec._to_img32(frames))
    d3, m3, payload = jax.jit(pb.encode_band_kernel)(img32)
    base = None
    for flag in (False, True):
        pb.DECODE_BLOCK_U8 = flag
        fn = jax.jit(lambda d3, m3, p, _=flag: pb.decode_band_kernel(
            d3, m3, p, W))
        t = measure_device_seconds(fn, d3, m3, payload, reps=6)
        out = np.asarray(fn(d3, m3, payload))
        if base is None:
            base = out
            ok = "(baseline)"
        else:
            ok = "parity OK" if (out == base).all() else "PARITY FAIL"
        print(f"{name}: block_u8={flag} decode {t*1e3:.3f} ms "
              f"= {npix/t/1e9:.1f} Gpix/s  {ok}", flush=True)
    if name == "uniform":
        from dbde_tpu.codec import uniform8_supported

        if uniform8_supported(H, W) and W % 1024 == 0:
            fn = jax.jit(lambda m3, p: pb.decode_band_u8_kernel(
                m3, p, W, wpp=W // 8, w_real=W // 8))
            t = measure_device_seconds(fn, m3, payload, reps=6)
            out = np.asarray(fn(m3, payload))
            ok = "parity OK" if (out == base).all() else "PARITY FAIL"
            print(f"{name}: dedicated u8 kernel {t*1e3:.3f} ms "
                  f"= {npix/t/1e9:.1f} Gpix/s  {ok}", flush=True)
pb.DECODE_BLOCK_U8 = False
