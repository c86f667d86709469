#!/usr/bin/env python
"""Stage-cost profile of the band kernels (real TPU), meta-design generation.

A Pallas kernel is one opaque fusion to the profiler, so per-stage times are
measured by ablation: cumulative kernel variants that stop after stage N
(each keeping the previous stage's output alive with a cheap OR so Mosaic
cannot dead-code-eliminate it).  Stage cost = time difference between
consecutive variants.  Outputs of ablated variants are wrong by design —
only the device time matters.  Results recorded in ROUND2_NOTES.md.

Pipeline measured (matches dbde_tpu/ops/pallas_band.py):
  encode: phase-A depths kernel | stream_meta XLA pass | payload kernel
          stages: deint+extract | +pack | +compaction | full(+splice/DMA)
  decode: stages: dma+meta | +window gathers (classed) | +unpack |
          full(+repack/inverse transpose)
"""
import functools
import sys

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dbde_tpu.bench_core import make_content
from dbde_tpu.codec import DbdeCodec
from dbde_tpu.ops.kernel_common import (
    _compact_group_pairs,
    _exclusive_lane_cumsum,
    _lanes,
    _pack_contributions,
    _rows,
    _splice17,
)
from dbde_tpu.ops import pallas_band as pb
from dbde_tpu.utils.profiling import measure_device_seconds

LANES = pb.LANES
STAGE_ROWS = pb.STAGE_ROWS
GROUPS_PER_STAGE = pb.GROUPS_PER_STAGE


def _fill(v, bands, groups_row):
    """Keep-alive: tile a small (r,128) value across the img block shape."""
    v = jnp.concatenate([v] * (8 * bands // v.shape[0]), axis=0)
    v = jnp.concatenate([v] * (2 * groups_row), axis=1)
    return v.reshape(1, 8 * bands, -1)


# --------------------------------------------------------------------------
# decode ablation (mirrors pb._decode_kernel narrow path)
# --------------------------------------------------------------------------


def _decode_kernel_ab(stage, groups_row, bands, nent, meta_ref, depths_ref,
                      mins_ref, payload_ref, img_ref, win_ref, res_ref,
                      rstage_ref, sems):
    groups = bands * groups_row
    b = pl.program_id(0)
    g = pl.program_id(1)
    nb = pl.num_programs(1)
    mbase = (b * nb + g) * nent
    kmask = meta_ref[mbase]

    def read_into(slot, rbase):
        return pltpu.make_async_copy(
            payload_ref.at[b, pl.ds(rbase, STAGE_ROWS), :],
            rstage_ref.at[pl.ds(slot * STAGE_ROWS, STAGE_ROWS), :],
            sems.at[slot],
        )

    depth = depths_ref[0].astype(jnp.int32)
    mn = mins_ref[0].astype(jnp.int32)
    loff_all = _exclusive_lane_cumsum(2 * depth)

    def gather_rows(s, row_base, base_row, R):
        lc = meta_ref[mbase + 1 + s] - (row_base << 7)
        r0 = lc & (LANES - 1)
        lg0 = lc >> 7
        loff_b = jnp.broadcast_to(loff_all[s : s + 1, :], (16, LANES))
        phys = loff_b + _rows((16, LANES)) + r0
        src_row = phys >> 7
        src_lane = phys & (LANES - 1)
        win = jnp.zeros((16, LANES), jnp.uint32)
        for rr in range(R):
            row = jnp.broadcast_to(
                rstage_ref[pl.ds(base_row + lg0 + rr, 1), :], (16, LANES)
            )
            cand = jnp.take_along_axis(row, src_lane, axis=-1)
            win = jnp.where(src_row == rr, cand, win)
        win_ref[:, s, :] = win

    def gather_group(s, row_base, base_row):
        if not pb.DECODE_GATHER_CLASSES:
            gather_rows(s, row_base, base_row, 17)
            return
        lc = meta_ref[mbase + 1 + s] - (row_base << 7)
        total_s = meta_ref[mbase + 2 + s] - meta_ref[mbase + 1 + s]
        need = ((lc & (LANES - 1)) + total_s + (LANES - 1)) >> 7
        prev = 0
        for R in pb.DECODE_GATHER_CLASSES:
            @pl.when((need > prev) & (need <= R))
            def _(R=R):
                gather_rows(s, row_base, base_row, R)
            prev = R

    assert groups <= GROUPS_PER_STAGE
    p = g & 1
    row_base = meta_ref[mbase + 1] >> 7

    @pl.when(g == 0)
    def _():
        read_into(0, row_base).start()

    @pl.when(p == 0)
    def _():
        read_into(0, row_base).wait()

    @pl.when(p == 1)
    def _():
        read_into(1, row_base).wait()

    last = (b * nb + nb - 1) * nent
    nxt_base = meta_ref[jnp.minimum(mbase + nent, last) + 1] >> 7

    @pl.when((p == 0) & (g + 1 < nb))
    def _():
        read_into(1, nxt_base).start()

    @pl.when((p == 1) & (g + 1 < nb))
    def _():
        read_into(0, nxt_base).start()

    if stage == 0:
        img_ref[...] = _fill(rstage_ref[pl.ds(p * STAGE_ROWS, 1), :], bands, groups_row)
        return

    for s in range(groups):
        gather_group(s, row_base, p * STAGE_ROWS)

    if stage == 1:
        img_ref[...] = _fill(win_ref[0] | win_ref[15], bands, groups_row)
        return

    for k in range(1, 9):
        @pl.when((kmask & (1 << k)) != 0)
        def _(k=k):
            sel = depth == k
            for i in range(64):
                bit = i * k
                j, sh = bit >> 5, bit & 31
                v = win_ref[j] >> sh
                if sh + k > 32:
                    v = v | (win_ref[j + 1] << (32 - sh))
                res_ref[i] = jnp.where(sel, v, res_ref[i])

    if stage == 2:
        img_ref[...] = _fill(res_ref[0] | res_ref[63], bands, groups_row)
        return

    dmask = (jnp.uint32(1) << depth.astype(jnp.uint32)) - jnp.uint32(1)
    mn_u = mn.astype(jnp.uint32)
    out_rows = []
    for ww in range(16):
        r, hx = ww >> 1, ww & 1
        base = 8 * r + 4 * hx
        w = (res_ref[base] & dmask) + mn_u
        w = w | (((res_ref[base + 1] & dmask) + mn_u) << 8)
        w = w | (((res_ref[base + 2] & dmask) + mn_u) << 16)
        w = w | (((res_ref[base + 3] & dmask) + mn_u) << 24)
        out_rows.append(w)

    iv = {}
    for grp in range(groups):
        e8 = jnp.concatenate([out_rows[2 * r][grp : grp + 1, :] for r in range(8)], axis=0)
        o8 = jnp.concatenate([out_rows[2 * r + 1][grp : grp + 1, :] for r in range(8)], axis=0)
        iv[(grp, 0)] = pb._interleave_half8(e8, o8, 0)
        iv[(grp, 1)] = pb._interleave_half8(e8, o8, 1)
    img_rows = []
    for img_r in range(8 * bands):
        tr, r = img_r >> 3, img_r & 7
        pieces = []
        for gc in range(groups_row):
            grp = tr * groups_row + gc
            pieces.append(iv[(grp, 0)][r : r + 1, :])
            pieces.append(iv[(grp, 1)][r : r + 1, :])
        img_rows.append(jnp.concatenate(pieces, axis=-1))
    img_ref[...] = jnp.concatenate(img_rows, axis=0).reshape(1, 8 * bands, -1)


def decode_ablated(stage, depths, mins, payload, width):
    B, rows8, _ = depths.shape
    tp = rows8 * LANES
    bands = pb.n_bands(width)
    wp = width // 8
    groups_row = wp // LANES
    groups = bands * groups_row
    hp = tp // wp
    nb = hp // bands
    nent = groups + 2
    meta = pb.stream_meta(depths, width)
    kern = functools.partial(_decode_kernel_ab, stage, groups_row, bands, nent)
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, nb),
            in_specs=[
                pl.BlockSpec((1, groups, LANES), lambda b, g, *_: (b, g, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, groups, LANES), lambda b, g, *_: (b, g, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, 8 * bands, 2 * wp), lambda b, g, *_: (b, g, 0), memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((16, groups, LANES), jnp.uint32),
                pltpu.VMEM((64, groups, LANES), jnp.uint32),
                pltpu.VMEM((2 * STAGE_ROWS, LANES), jnp.uint32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, hp * 8, 2 * wp), jnp.uint32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(meta, depths, mins, payload)


# --------------------------------------------------------------------------
# encode ablation (mirrors pb._payload_kernel; phase A measured as-is)
# --------------------------------------------------------------------------


def _payload_kernel_ab(stage, groups_row, bands, nent, meta_ref, img_ref,
                       depths_ref, mins_ref, payload_ref, carry_ref, words_ref,
                       stage_ref, sem):
    groups = bands * groups_row
    b = pl.program_id(0)
    g = pl.program_id(1)
    nb = pl.num_programs(1)
    mbase = (b * nb + g) * nent
    kmask = meta_ref[mbase]

    @pl.when(g == 0)
    def _():
        carry_ref[...] = jnp.zeros((1, LANES), jnp.uint32)

    depth = depths_ref[0].astype(jnp.int32)
    mn = mins_ref[0].astype(jnp.int32)
    pix = pb._extract_pixels(pb._deinterleave_block(img_ref[0], groups, groups_row))
    res = [(pix[i] - mn).astype(jnp.uint32) for i in range(64)]

    if stage == 0:
        payload_ref  # unused
        s0 = (res[0] | res[63]).astype(jnp.uint32)
        stage_ref[...] = jnp.concatenate(
            [s0[0:1, :]] * STAGE_ROWS, axis=0
        )
        dma = pltpu.make_async_copy(
            stage_ref, payload_ref.at[b, pl.ds(0, STAGE_ROWS), :], sem
        )
        dma.start()
        dma.wait()
        return

    for j in range(16):
        words_ref[j] = jnp.zeros((groups, LANES), jnp.uint32)
    for k in range(1, 9):
        @pl.when((kmask & (1 << k)) != 0)
        def _(k=k):
            sel = depth == k
            for j in range(2 * k):
                words_ref[j] = jnp.where(sel, _pack_contributions(res, k, j), words_ref[j])

    if stage == 1:
        s0 = words_ref[0] | words_ref[15]
        stage_ref[...] = jnp.concatenate([s0[0:1, :]] * STAGE_ROWS, axis=0)
        dma = pltpu.make_async_copy(
            stage_ref, payload_ref.at[b, pl.ds(0, STAGE_ROWS), :], sem
        )
        dma.start()
        dma.wait()
        return

    ploff_all = _exclusive_lane_cumsum(depth)

    if stage == 2:
        acc = jnp.zeros((16, LANES), jnp.uint32)
        for s in range(groups):
            seg, _tot = _compact_group_pairs(
                words_ref, depth, s, ploff_all[s : s + 1, :], None
            )
            acc = acc | seg
        stage_ref[...] = jnp.concatenate([acc] * (STAGE_ROWS // 16), axis=0)[:STAGE_ROWS]
        dma = pltpu.make_async_copy(
            stage_ref, payload_ref.at[b, pl.ds(0, STAGE_ROWS), :], sem
        )
        dma.start()
        dma.wait()
        return

    for c0 in range(0, groups, GROUPS_PER_STAGE):
        row_base = meta_ref[mbase + 1 + c0] >> 7
        stage_v = jnp.zeros((STAGE_ROWS, LANES), jnp.uint32)
        for s in range(c0, min(c0 + GROUPS_PER_STAGE, groups)):
            seg, _ = _compact_group_pairs(
                words_ref, depth, s, ploff_all[s : s + 1, :], None
            )
            lc = meta_ref[mbase + 1 + s] - (row_base << 7)
            win17 = _splice17(seg, carry_ref[...], lc & (LANES - 1))
            pad = jnp.concatenate(
                [win17, jnp.zeros((STAGE_ROWS - 17, LANES), jnp.uint32)], axis=0
            )
            stage_v = stage_v | pltpu.roll(pad, lc >> 7, 0)

            lc_new = meta_ref[mbase + 2 + s] - (row_base << 7)
            ri = (lc_new >> 7) - (lc >> 7)
            win24 = jnp.concatenate([win17, jnp.zeros((7, LANES), jnp.uint32)], axis=0)
            top = pltpu.roll(win24, (24 - ri) % 24, 0)[0:1, :]
            carry_ref[...] = jnp.where(
                _lanes((1, LANES)) < (lc_new & (LANES - 1)), top, jnp.uint32(0)
            )

        stage_ref[...] = stage_v
        dma = pltpu.make_async_copy(
            stage_ref, payload_ref.at[b, pl.ds(row_base, STAGE_ROWS), :], sem
        )
        dma.start()
        dma.wait()


def encode_payload_ablated(stage, meta, img32, d3, m3):
    B, hp8, wq = img32.shape
    W = wq * 4
    bands = pb.n_bands(W)
    wp = W // 8
    groups_row = wp // LANES
    groups = bands * groups_row
    nb = hp8 // (8 * bands)
    tp = (hp8 // 8) * wp
    rows = pb.payload_rows(tp)
    nent = groups + 2
    kern = functools.partial(_payload_kernel_ab, stage, groups_row, bands, nent)
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, nb),
            in_specs=[
                pl.BlockSpec((1, 8 * bands, 2 * wp), lambda b, g, *_: (b, g, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, groups, LANES), lambda b, g, *_: (b, g, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, groups, LANES), lambda b, g, *_: (b, g, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((1, LANES), jnp.uint32),
                pltpu.VMEM((16, groups, LANES), jnp.uint32),
                pltpu.VMEM((STAGE_ROWS, LANES), jnp.uint32),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, rows, LANES), jnp.uint32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(meta, img32, d3, m3)


def main():
    W = H = 2048
    B = 8
    content = sys.argv[1] if len(sys.argv) > 1 else "camera"
    img = make_content(W, H, B, content)
    codec = DbdeCodec(height=H, width=W, backend="band")
    img32 = jax.device_put(codec._to_img32(img))
    enc = codec.encode(img)
    npix = B * H * W

    print(f"== encode ({content}) ==")
    t_a = measure_device_seconds(jax.jit(pb.encode_depths_kernel), img32, reps=8)
    print(f"  phase A (depths/mins)             {t_a*1e3:7.3f} ms")
    meta_fn = jax.jit(functools.partial(pb.stream_meta, width=W))
    d3, m3 = jax.jit(pb.encode_depths_kernel)(img32)
    t_m = measure_device_seconds(meta_fn, d3, reps=8)
    print(f"  stream_meta XLA pass              {t_m*1e3:7.3f} ms")
    meta = meta_fn(d3)
    names = ["deint+extract", "+pack", "+compaction", "full(+splice/stage/DMA)"]
    prev = 0.0
    for st in range(4):
        fn = jax.jit(functools.partial(encode_payload_ablated, st))
        t = measure_device_seconds(fn, meta, img32, d3, m3, reps=8)
        print(f"  B.{st} {names[st]:28s} cum {t*1e3:7.3f} ms  delta {(t-prev)*1e3:7.3f} ms")
        prev = t
    tot = t_a + t_m + prev
    print(f"  pipeline total ≈ {tot*1e3:.3f} ms  ({npix/tot/1e9:6.2f} Gpix/s)")

    print(f"== decode ({content}) ==")
    tp = codec.tiles
    rows = pb.payload_rows(tp)
    d3r = enc.depths.reshape(B, tp // LANES, LANES)
    m3r = enc.mins.reshape(B, tp // LANES, LANES)
    p3 = jnp.pad(enc.payload, ((0, 0), (0, rows * LANES - enc.payload.shape[1])))
    p3 = p3.reshape(B, rows, LANES)
    names = ["dma+meta", "+window gathers", "+unpack", "full(+repack/transpose)"]
    prev = 0.0
    for st in range(4):
        fn = jax.jit(functools.partial(decode_ablated, st, width=W))
        t = measure_device_seconds(fn, d3r, m3r, p3, reps=8)
        print(f"  D.{st} {names[st]:28s} cum {t*1e3:7.3f} ms  delta {(t-prev)*1e3:7.3f} ms  ({npix/t/1e9:6.2f} Gpix/s cum)")
        prev = t


if __name__ == "__main__":
    main()
