#!/usr/bin/env python
"""Stage-cost profile of the band kernels (real TPU).

A Pallas kernel is one opaque fusion to the profiler, so per-stage times are
measured by ablation: cumulative kernel variants that stop after stage N
(each keeping the previous stage's output alive with a cheap OR so Mosaic
cannot dead-code-eliminate it).  Stage cost = time difference between
consecutive variants.  Outputs of ablated variants are wrong by design —
only the device time matters.  Results recorded in ROUND2_NOTES.md.

decode stages: dma+window-read | window gathers | per-depth unpack |
repack+inverse transpose.
encode stages: dma+deint/minmax/depth | per-depth pack | pair compaction |
splice+stage+payload DMA.
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


# --------------------------------------------------------------------------
# decode ablation
# --------------------------------------------------------------------------


def _decode_kernel_ab(stage, groups_row, bands, depths_ref, mins_ref, payload_ref,
                      img_ref, cursor_ref, win_ref, res_ref, rstage_ref, sems):
    groups = bands * groups_row
    b = pl.program_id(0)
    g = pl.program_id(1)
    nb = pl.num_programs(1)

    def read_into(slot, rbase):
        return pltpu.make_async_copy(
            payload_ref.at[b, pl.ds(rbase, STAGE_ROWS), :],
            rstage_ref.at[pl.ds(slot * STAGE_ROWS, STAGE_ROWS), :],
            sems.at[slot],
        )

    depth = depths_ref[0].astype(jnp.int32)
    mn = mins_ref[0].astype(jnp.int32)
    loff_all = _exclusive_lane_cumsum(2 * depth)
    tot_all = jnp.sum(2 * depth, axis=-1, keepdims=True)
    loffs = [loff_all[s : s + 1, :] for s in range(groups)]
    totals = [tot_all[s, 0] for s in range(groups)]

    def gather_group(s, c, row_base, base_row):
        lc = c - (row_base << 7)
        r0 = lc & (LANES - 1)
        lg0 = lc >> 7
        loff_b = jnp.broadcast_to(loffs[s], (16, LANES))
        phys = loff_b + _rows((16, LANES)) + r0
        src_row = phys >> 7
        src_lane = phys & (LANES - 1)
        win = jnp.zeros((16, LANES), jnp.uint32)
        for rr in range(17):
            row = jnp.broadcast_to(
                rstage_ref[pl.ds(base_row + lg0 + rr, 1), :], (16, LANES)
            )
            cand = jnp.take_along_axis(row, src_lane, axis=-1)
            win = jnp.where(src_row == rr, cand, win)
        win_ref[:, s, :] = win


    def fill(v):
        # keep-alive: tile a small (r,128) value across the img block shape
        v = jnp.concatenate([v] * (8 * bands // v.shape[0]), axis=0)
        v = jnp.concatenate([v] * (2 * groups_row), axis=1)
        return v.reshape(1, 8 * bands, -1)
    assert groups <= GROUPS_PER_STAGE
    p = g & 1

    @pl.when(g == 0)
    def _():
        cursor_ref[0] = 0
        read_into(0, 0).start()

    row_base = cursor_ref[0] >> 7

    @pl.when(p == 0)
    def _():
        read_into(0, row_base).wait()

    @pl.when(p == 1)
    def _():
        read_into(1, row_base).wait()

    c_end = cursor_ref[0]
    for s in range(groups):
        c_end = c_end + totals[s]

    @pl.when((p == 0) & (g + 1 < nb))
    def _():
        read_into(1, c_end >> 7).start()

    @pl.when((p == 1) & (g + 1 < nb))
    def _():
        read_into(0, c_end >> 7).start()

    if stage == 0:
        # keep the DMA chain + cursor arithmetic alive; consume one staged row
        cursor_ref[0] = c_end
        img_ref[...] = fill(rstage_ref[pl.ds(p * STAGE_ROWS, 1), :])
        return

    c = cursor_ref[0]
    for s in range(groups):
        gather_group(s, c, row_base, p * STAGE_ROWS)
        c = c + totals[s]
    cursor_ref[0] = c

    if stage == 1:
        img_ref[...] = fill(win_ref[0] | win_ref[15])
        return

    for i in range(64):
        res_ref[i] = jnp.zeros((groups, LANES), jnp.uint32)
    for k in range(1, 9):
        @pl.when(jnp.any(depth == k))
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
        img_ref[...] = fill(res_ref[0] | res_ref[63])
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
    kern = functools.partial(_decode_kernel_ab, stage, groups_row, bands)
    return pl.pallas_call(
        kern,
        grid=(B, nb),
        in_specs=[
            pl.BlockSpec((1, groups, LANES), lambda b, g: (b, g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, groups, LANES), lambda b, g: (b, g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=jax.ShapeDtypeStruct((B, hp * 8, 2 * wp), jnp.uint32),
        out_specs=pl.BlockSpec((1, 8 * bands, 2 * wp), lambda b, g: (b, g, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((1,), jnp.int32),
            pltpu.VMEM((16, groups, LANES), jnp.uint32),
            pltpu.VMEM((64, groups, LANES), jnp.uint32),
            pltpu.VMEM((2 * STAGE_ROWS, LANES), jnp.uint32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(depths, mins, payload)


# --------------------------------------------------------------------------
# encode ablation
# --------------------------------------------------------------------------


def _encode_kernel_ab(stage, groups_row, bands, img_ref, depths_ref, mins_ref,
                      payload_ref, cursor_ref, carry_ref, words_ref, stage_ref, sem):
    groups = bands * groups_row
    b = pl.program_id(0)
    g = pl.program_id(1)

    @pl.when(g == 0)
    def _():
        cursor_ref[0] = 0
        carry_ref[...] = jnp.zeros((1, LANES), jnp.uint32)

    x = img_ref[0]

    deint = {}
    for grp in range(groups):
        tr, gc = grp // groups_row, grp % groups_row
        xa = x[8 * tr : 8 * tr + 8, 256 * gc : 256 * gc + 128]
        xb = x[8 * tr : 8 * tr + 8, 256 * gc + 128 : 256 * gc + 256]
        deint[(grp, 0)] = pb._gather_even_odd8(xa, xb, 0)
        deint[(grp, 1)] = pb._gather_even_odd8(xa, xb, 1)
    x32v = []
    for ww in range(16):
        r, hx = ww >> 1, ww & 1
        x32v.append(
            jnp.concatenate([deint[(grp, hx)][r : r + 1, :] for grp in range(groups)], axis=0)
        )

    pix = []
    for i in range(64):
        r, cc = i >> 3, i & 7
        word = x32v[2 * r + (cc >> 2)]
        bsh = 8 * (cc & 3)
        v = word >> bsh if bsh else word
        pix.append((v & jnp.uint32(0xFF)).astype(jnp.int32))

    mnv = pix[0]
    mxv = pix[0]
    for i in range(1, 64):
        mnv = jnp.minimum(mnv, pix[i])
        mxv = jnp.maximum(mxv, pix[i])
    rng = mxv - mnv
    depth = jnp.zeros((groups, LANES), jnp.int32)
    for i in range(8):
        depth += (rng > (1 << i) - 1).astype(jnp.int32)
    res = [(pix[i] - mnv).astype(jnp.uint32) for i in range(64)]

    depths_ref[...] = depth.astype(jnp.uint8).reshape(1, groups, LANES)
    mins_ref[...] = mnv.astype(jnp.uint8).reshape(1, groups, LANES)

    if stage == 0:
        return

    for j in range(16):
        words_ref[j] = jnp.zeros((groups, LANES), jnp.uint32)
    for k in range(1, 9):
        @pl.when(jnp.any(depth == k))
        def _(k=k):
            sel = depth == k
            for j in range(2 * k):
                words_ref[j] = jnp.where(sel, _pack_contributions(res, k, j), words_ref[j])

    if stage == 1:
        depths_ref[...] = (words_ref[0] | words_ref[15]).astype(jnp.uint8).reshape(1, groups, LANES)
        return

    ploff_all = _exclusive_lane_cumsum(depth)
    tot_all = jnp.sum(2 * depth.astype(jnp.int32), axis=-1, keepdims=True)

    if stage == 2:
        acc = jnp.zeros((16, LANES), jnp.uint32)
        for s in range(groups):
            seg, _tot = _compact_group_pairs(
                words_ref, depth, s, ploff_all[s : s + 1, :], tot_all[s, 0]
            )
            acc = acc | seg
        depths_ref[...] = jnp.broadcast_to(
            (acc[0:1, :] | acc[15:16, :]), (groups, LANES)
        ).astype(jnp.uint8).reshape(1, groups, LANES)
        return

    for c0 in range(0, groups, GROUPS_PER_STAGE):
        row_base = cursor_ref[0] >> 7
        stage_v = jnp.zeros((STAGE_ROWS, LANES), jnp.uint32)
        for s in range(c0, min(c0 + GROUPS_PER_STAGE, groups)):
            seg, total = _compact_group_pairs(
                words_ref, depth, s, ploff_all[s : s + 1, :], tot_all[s, 0]
            )
            c = cursor_ref[0]
            lc = c - (row_base << 7)
            win17 = _splice17(seg, carry_ref[...], lc & (LANES - 1))
            pad = jnp.concatenate(
                [win17, jnp.zeros((STAGE_ROWS - 17, LANES), jnp.uint32)], axis=0
            )
            stage_v = stage_v | pltpu.roll(pad, lc >> 7, 0)

            lc_new = lc + total
            ri = (lc_new >> 7) - (lc >> 7)
            win24 = jnp.concatenate([win17, jnp.zeros((7, LANES), jnp.uint32)], axis=0)
            top = pltpu.roll(win24, (24 - ri) % 24, 0)[0:1, :]
            carry_ref[...] = jnp.where(
                _lanes((1, LANES)) < (lc_new & (LANES - 1)), top, jnp.uint32(0)
            )
            cursor_ref[0] = c + total

        stage_ref[...] = stage_v
        dma = pltpu.make_async_copy(
            stage_ref, payload_ref.at[b, pl.ds(row_base, STAGE_ROWS), :], sem
        )
        dma.start()
        dma.wait()


def encode_ablated(stage, img32):
    B, hp8, wq = img32.shape
    W = wq * 4
    bands = pb.n_bands(W)
    wp = W // 8
    groups_row = wp // LANES
    groups = bands * groups_row
    nb = hp8 // (8 * bands)
    tp = (hp8 // 8) * wp
    rows = pb.payload_rows(tp)
    kern = functools.partial(_encode_kernel_ab, stage, groups_row, bands)
    return pl.pallas_call(
        kern,
        grid=(B, nb),
        in_specs=[
            pl.BlockSpec((1, 8 * bands, 2 * wp), lambda b, g: (b, g, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((B, tp // LANES, LANES), jnp.uint8),
            jax.ShapeDtypeStruct((B, tp // LANES, LANES), jnp.uint8),
            jax.ShapeDtypeStruct((B, rows, LANES), jnp.uint32),
        ),
        out_specs=(
            pl.BlockSpec((1, groups, LANES), lambda b, g: (b, g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, groups, LANES), lambda b, g: (b, g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[
            pltpu.SMEM((1,), jnp.int32),
            pltpu.VMEM((1, LANES), jnp.uint32),
            pltpu.VMEM((16, groups, LANES), jnp.uint32),
            pltpu.VMEM((STAGE_ROWS, LANES), jnp.uint32),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(img32)


def main():
    W = H = 2048
    B = 8
    content = sys.argv[1] if len(sys.argv) > 1 else "camera"
    img = make_content(W, H, B, content)
    codec = DbdeCodec(height=H, width=W, backend="band")
    img32 = codec._to_img32(img)
    img32 = jax.device_put(img32)
    enc = codec.encode(img)
    npix = B * H * W

    print(f"== encode stages ({content}) ==")
    names = ["deint+minmax+depth", "+pack", "+compaction", "full(+splice/stage/DMA)"]
    prev = 0.0
    for st in range(4):
        fn = jax.jit(functools.partial(encode_ablated, st))
        t = measure_device_seconds(fn, img32, reps=8)
        print(f"  stage{st} {names[st]:28s} cum {t*1e3:7.3f} ms  delta {(t-prev)*1e3:7.3f} ms  ({npix/t/1e9:6.2f} Gpix/s cum)")
        prev = t

    print(f"== decode stages ({content}) ==")
    tp = codec.tiles  # W=H=2048: no pad tiles
    rows = pb.payload_rows(tp)
    d3 = enc.depths.reshape(B, tp // LANES, LANES)
    m3 = enc.mins.reshape(B, tp // LANES, LANES)
    p3 = jnp.pad(enc.payload, ((0, 0), (0, rows * LANES - enc.payload.shape[1])))
    p3 = p3.reshape(B, rows, LANES)
    names = ["dma+cursor", "+window gathers", "+unpack", "full(+repack/transpose)"]
    prev = 0.0
    for st in range(4):
        fn = jax.jit(functools.partial(decode_ablated, st, width=W))
        t = measure_device_seconds(fn, d3, m3, p3, reps=8)
        print(f"  stage{st} {names[st]:28s} cum {t*1e3:7.3f} ms  delta {(t-prev)*1e3:7.3f} ms  ({npix/t/1e9:6.2f} Gpix/s cum)")
        prev = t


if __name__ == "__main__":
    main()
