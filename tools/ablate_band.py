#!/usr/bin/env python
"""Stage-cost profile of the band kernels (real TPU).

A Pallas kernel is one opaque fusion to the profiler, so per-stage times are
measured by ablation: the PRODUCTION kernels (dbde_tpu/ops/pallas_band.py)
take a trace-time ``ablate_stage`` that truncates after stage N, keeping
that stage's outputs alive so Mosaic cannot dead-code-eliminate the work.
Stage cost = time difference between consecutive variants.  Ablated outputs
are garbage by design — only the device time matters.  Because the variants
ARE the shipped kernels, this tool cannot drift from the shipped design
(round-2 verdict weak #4).

Usage: tools/ablate_band.py [content] [--mult N] [--geom HxW] [--frames B]
  content: camera (default) | random | flat
  --mult:  override pallas_band.BANDS_MULT (grid-block height multiplier)
"""
import functools
import sys

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from dbde_tpu.bench_core import make_content
from dbde_tpu.codec import DbdeCodec
from dbde_tpu.ops import pallas_band as pb
from dbde_tpu.utils.profiling import measure_device_seconds


def main():
    args = sys.argv[1:]
    content, H, W, B = "camera", 2048, 2048, 8
    i = 0
    while i < len(args):
        if args[i] == "--mult":
            pb.BANDS_MULT = int(args[i + 1])
            i += 2
        elif args[i] == "--geom":
            H, W = (int(x) for x in args[i + 1].split("x"))
            i += 2
        elif args[i] == "--frames":
            B = int(args[i + 1])
            i += 2
        else:
            content = args[i]
            i += 1

    img = make_content(W, H, B, content)
    codec = DbdeCodec(height=H, width=W, backend="band")
    img32 = jax.device_put(codec._to_img32(img))
    enc = codec.encode(img)
    npix = B * H * W
    Wk = pb_width(W, H)
    hp8 = img32.shape[1]
    benc = pb.n_bands(Wk, hp8)
    bdec = pb.n_bands(Wk, hp8, pb.BLOCK_GROUPS_CAP_DEC)
    print(f"geom {B}x{H}x{W} {content}; BANDS_MULT={pb.BANDS_MULT} "
          f"(kernel width {Wk}, blocks enc {8*benc}/dec {8*bdec} rows, "
          f"{benc * (Wk // 8 // pb.LANES)}/{bdec * (Wk // 8 // pb.LANES)} groups)")

    print("== encode ==")
    t_a = measure_device_seconds(jax.jit(pb.encode_depths_kernel), img32, reps=8)
    print(f"  phase A (depths/mins)             {t_a*1e3:7.3f} ms")
    meta_fn = jax.jit(functools.partial(pb.stream_meta, width=Wk))
    d3, m3 = jax.jit(pb.encode_depths_kernel)(img32)
    t_m = measure_device_seconds(meta_fn, d3, reps=8)
    print(f"  stream_meta XLA pass              {t_m*1e3:7.3f} ms")
    meta = meta_fn(d3)
    names = ["deint+extract", "+pack", "+compaction", "full(+splice/stage/DMA)"]
    prev = 0.0
    for st in (0, 1, 2, None):
        fn = jax.jit(functools.partial(pb.encode_payload_kernel, ablate_stage=st))
        t = measure_device_seconds(fn, meta, img32, d3, m3, reps=8)
        nm = names[3 if st is None else st]
        print(f"  B.{st} {nm:28s} cum {t*1e3:7.3f} ms  delta {(t-prev)*1e3:7.3f} ms")
        prev = t
    tot = t_a + t_m + prev
    print(f"  pipeline total ≈ {tot*1e3:.3f} ms  ({npix/tot/1e9:6.2f} Gpix/s)")

    print("== decode ==")
    tp = codec.tiles  # NOTE: padded tile count comes from the encode outputs
    d3r, m3r, p3 = _decode_inputs(enc, H, W)
    names = ["dma+meta", "+window gathers", "+unpack", "full(+repack/transpose)"]
    prev = 0.0
    for st in (0, 1, 2, None):
        fn = jax.jit(functools.partial(pb.decode_band_kernel, width=pb_width(W, H),
                                       ablate_stage=st))
        t = measure_device_seconds(fn, d3r, m3r, p3, reps=8)
        nm = names[3 if st is None else st]
        print(f"  D.{st} {nm:28s} cum {t*1e3:7.3f} ms  delta {(t-prev)*1e3:7.3f} ms"
              f"  ({npix/t/1e9:6.2f} Gpix/s cum)")
        prev = t


def pb_width(W, H):
    """Fold-aware band kernel width (codec.band_fold: k*Wp)."""
    from dbde_tpu.codec import band_fold
    from dbde_tpu.format import tile_grid

    h, _ = tile_grid(W, H)
    Wp, k = band_fold(W, h)
    return k * Wp


def _decode_inputs(enc, H, W):
    """Rebuild the padded+folded decode-kernel inputs the way
    _decode_fn_band does."""
    from dbde_tpu.codec import band_fold
    from dbde_tpu.format import tile_grid

    B, T = enc.depths.shape
    h, w = tile_grid(W, H)
    Wp, k = band_fold(W, h)
    Wk = k * Wp
    wpp = Wp // 8
    hpf = pb.pad_rows(8 * ((-(-h // k) * k) // k), Wk) // 8  # folded tile rows
    tp = hpf * k * wpp
    rows = pb.payload_rows(tp)
    d = jnp.zeros((B, hpf * k, wpp), jnp.uint8).at[:, :h, :w].set(enc.depths.reshape(B, h, w))
    m = jnp.zeros((B, hpf * k, wpp), jnp.uint8).at[:, :h, :w].set(enc.mins.reshape(B, h, w))
    if enc.payload.ndim == 3:  # kernel-shaped band payload: already (B,R,128)
        p3 = enc.payload
    else:
        p = jnp.pad(enc.payload, ((0, 0), (0, rows * pb.LANES - enc.payload.shape[1])))
        p3 = p.reshape(B, rows, pb.LANES)
    return (
        jax.device_put(d.reshape(B, tp // pb.LANES, pb.LANES)),
        jax.device_put(m.reshape(B, tp // pb.LANES, pb.LANES)),
        jax.device_put(p3),
    )


if __name__ == "__main__":
    main()
