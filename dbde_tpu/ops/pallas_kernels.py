"""Tile-layout Pallas kernels: the general-geometry TPU codec path.

Used by DbdeCodec for widths where the image-layout band kernels
(pallas_band.py) would pad too much (band_width(W) > 3*W, i.e. W < ~342).
The per-tile semantics reproduce dbde_util.cpp:22-103/216-279; the serial
payload cursor (dbde_util.cpp:150-158) becomes a lane prefix-sum + vectorized
binary-search compaction (kernel_common.py).

Design notes (each measured on TPU v5e):
  * tiles cross the kernel boundary as u32 words packing 4 pixels
    (``tiles_W`` layout, (B, 16, Tp)): u8 arrays DMA ~10x slower than u32 on
    this TPU runtime (they live in (32,128)-packed VMEM tiling), and XLA
    u8 tile transposes dominated the end-to-end time of the earlier u8-IO
    variant (~3x slower end to end; deleted in round 2).  Pixels are
    extracted / re-packed with in-register byte shifts.
  * the whole 1024-tile block's payload stream is assembled in one (160,128)
    VMEM staging VALUE via dynamic sublane rolls + OR accumulation (group
    windows only ever OR over zeros or identical carry lanes), then moved
    with a single 80KB DMA — 8 small DMAs per block were ~1.1us each of
    latency.
  * the decode unpack is depth-predicated through a scratch ref (blocks only
    pay for bit-depths present).

tiles_W word layout: word ww = 2*r + hx of tile t packs pixels
(r, 4*hx .. 4*hx+3) little-endian — i.e. the tile's row bytes in image
order, so ``image.view(u32)`` transforms are pure u32 reshapes/transposes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .kernel_common import (
    _compact_group_pairs,
    _exclusive_lane_cumsum,
    _lanes,
    _pack_contributions,
    _rightmost_le,
    _rows,
    _splice17,
)

TILES_BLOCK = 1024
GROUPS = 8
LANES = 128
STAGE_ROWS = 160  # 129 data rows + window slack, 8-aligned


def payload_rows(tp: int) -> int:
    return tp * 16 // LANES + STAGE_ROWS + 8


def pad_tiles(t: int) -> int:
    return -(-t // TILES_BLOCK) * TILES_BLOCK


def _extract_pixels(x32):
    """x32 (16, G, 128) u32 tiles_W block → 64 pixel arrays (G,128) i32."""
    out = []
    for i in range(64):
        r, cc = i >> 3, i & 7
        word = x32[2 * r + (cc >> 2)]
        b = cc & 3
        v = word >> (8 * b) if b else word
        out.append((v & jnp.uint32(0xFF)).astype(jnp.int32))
    return out




# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------


def _encode_kernel(tiles_ref, depths_ref, mins_ref, payload_ref,
                   cursor_ref, carry_ref, words_ref, stage_ref, sem):
    b = pl.program_id(0)
    g = pl.program_id(1)

    @pl.when(g == 0)
    def _():
        cursor_ref[0] = 0
        carry_ref[...] = jnp.zeros((1, LANES), jnp.uint32)

    x32 = tiles_ref[0].reshape(16, GROUPS, LANES)
    pix = _extract_pixels(x32)  # 64 x (G,128) i32
    mn = pix[0]
    mx = pix[0]
    for i in range(1, 64):
        mn = jnp.minimum(mn, pix[i])
        mx = jnp.maximum(mx, pix[i])
    rng = mx - mn
    depth = jnp.zeros((GROUPS, LANES), jnp.int32)
    for i in range(8):
        depth += (rng > (1 << i) - 1).astype(jnp.int32)
    res = [(pix[i] - mn).astype(jnp.uint32) for i in range(64)]

    depths_ref[...] = depth.astype(jnp.uint8).reshape(1, GROUPS, LANES)
    mins_ref[...] = mn.astype(jnp.uint8).reshape(1, GROUPS, LANES)

    for j in range(16):
        words_ref[j] = jnp.zeros((GROUPS, LANES), jnp.uint32)
    for k in range(1, 9):
        @pl.when(jnp.any(depth == k))
        def _(k=k):
            sel = depth == k
            for j in range(2 * k):
                words_ref[j] = jnp.where(sel, _pack_contributions(res, k, j), words_ref[j])

    # ---- assemble the whole block's stream in one staging value ----
    row_base = cursor_ref[0] >> 7
    ploff_all = _exclusive_lane_cumsum(depth)  # pair offsets, all groups
    tot_all = jnp.sum(2 * depth, axis=-1, keepdims=True)
    stage = jnp.zeros((STAGE_ROWS, LANES), jnp.uint32)
    for s in range(GROUPS):
        seg, total = _compact_group_pairs(
            words_ref, depth, s, ploff_all[s : s + 1, :], tot_all[s, 0]
        )
        c = cursor_ref[0]
        lc = c - (row_base << 7)
        win17 = _splice17(seg, carry_ref[...], lc & (LANES - 1))
        pad = jnp.concatenate(
            [win17, jnp.zeros((STAGE_ROWS - 17, LANES), jnp.uint32)], axis=0
        )
        stage = stage | pltpu.roll(pad, lc >> 7, 0)

        # new carry = low lanes of the (lc+total) partial row; row index is
        # dynamic, so pick it out of the window with a sublane roll to row 0
        lc_new = lc + total
        ri = (lc_new >> 7) - (lc >> 7)  # 0..16 within win17
        win24 = jnp.concatenate([win17, jnp.zeros((7, LANES), jnp.uint32)], axis=0)
        top = pltpu.roll(win24, (24 - ri) % 24, 0)[0:1, :]
        carry_ref[...] = jnp.where(
            _lanes((1, LANES)) < (lc_new & (LANES - 1)), top, jnp.uint32(0)
        )
        cursor_ref[0] = c + total

    stage_ref[...] = stage
    dma = pltpu.make_async_copy(
        stage_ref, payload_ref.at[b, pl.ds(row_base, STAGE_ROWS), :], sem
    )
    dma.start()
    dma.wait()


def encode_tiles_kernel(tiles_w: jnp.ndarray):
    """tiles_W (B, 16, Tp) u32 → (depths (B,Tp//128,128) u8,
    mins (B,Tp//128,128) u8, payload (B, R, 128) u32)."""
    B, sixteen, tp = tiles_w.shape
    assert sixteen == 16 and tp % TILES_BLOCK == 0
    nb = tp // TILES_BLOCK
    rows = payload_rows(tp)
    return pl.pallas_call(
        _encode_kernel,
        grid=(B, nb),
        in_specs=[
            pl.BlockSpec((1, 16, TILES_BLOCK), lambda b, g: (b, 0, g), memory_space=pltpu.VMEM),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((B, tp // LANES, LANES), jnp.uint8),
            jax.ShapeDtypeStruct((B, tp // LANES, LANES), jnp.uint8),
            jax.ShapeDtypeStruct((B, rows, LANES), jnp.uint32),
        ),
        out_specs=(
            pl.BlockSpec((1, GROUPS, LANES), lambda b, g: (b, g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, GROUPS, LANES), lambda b, g: (b, g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[
            pltpu.SMEM((1,), jnp.int32),
            pltpu.VMEM((1, LANES), jnp.uint32),
            pltpu.VMEM((16, GROUPS, LANES), jnp.uint32),
            pltpu.VMEM((STAGE_ROWS, LANES), jnp.uint32),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(tiles_w)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def _decode_kernel(depths_ref, mins_ref, payload_ref, tiles_ref,
                   cursor_ref, win_ref, res_ref, rstage_ref, sem):
    b = pl.program_id(0)
    g = pl.program_id(1)

    @pl.when(g == 0)
    def _():
        cursor_ref[0] = 0

    # start the block's single stream read first; overlap with offset math
    row_base = cursor_ref[0] >> 7
    dma = pltpu.make_async_copy(
        payload_ref.at[b, pl.ds(row_base, STAGE_ROWS), :], rstage_ref, sem
    )
    dma.start()

    depth = depths_ref[0].astype(jnp.int32)  # (8, 128)
    mn = mins_ref[0].astype(jnp.int32)

    loffs, totals = [], []
    for s in range(GROUPS):
        counts = 2 * depth[s : s + 1, :]
        loffs.append(_exclusive_lane_cumsum(counts))
        totals.append(jnp.sum(counts))

    dma.wait()

    c = cursor_ref[0]
    for s in range(GROUPS):
        lc = c - (row_base << 7)
        r0 = lc & (LANES - 1)
        lg0 = lc >> 7
        loff_b = jnp.broadcast_to(loffs[s], (16, LANES))
        phys = loff_b + _rows((16, LANES)) + r0
        src_row = phys >> 7  # 0..16
        src_lane = phys & (LANES - 1)
        win = jnp.zeros((16, LANES), jnp.uint32)
        for rr in range(17):
            row = jnp.broadcast_to(rstage_ref[pl.ds(lg0 + rr, 1), :], (16, LANES))
            cand = jnp.take_along_axis(row, src_lane, axis=-1)
            win = jnp.where(src_row == rr, cand, win)
        win_ref[:, s, :] = win
        c = c + totals[s]
    cursor_ref[0] = c

    # ---- depth-predicated unpack across all 8 groups ----
    for i in range(64):
        res_ref[i] = jnp.zeros((GROUPS, LANES), jnp.uint32)
    for k in range(1, 9):
        @pl.when(jnp.any(depth == k))
        def _(k=k):
            sel = depth == k
            mask = jnp.uint32((1 << k) - 1)
            for i in range(64):
                bit = i * k
                j, sh = bit >> 5, bit & 31
                v = win_ref[j] >> sh
                if sh + k > 32:
                    v = v | (win_ref[j + 1] << (32 - sh))
                res_ref[i] = jnp.where(sel, v & mask, res_ref[i])

    # ---- re-pack pixels into tiles_W u32 words ----
    mn_u = mn.astype(jnp.uint32)
    out_rows = []
    for ww in range(16):
        r, hx = ww >> 1, ww & 1
        base = 8 * r + 4 * hx
        w = (res_ref[base] + mn_u)
        w = w | ((res_ref[base + 1] + mn_u) << 8)
        w = w | ((res_ref[base + 2] + mn_u) << 16)
        w = w | ((res_ref[base + 3] + mn_u) << 24)
        out_rows.append(w)
    tiles_ref[...] = jnp.stack(out_rows, axis=0).reshape(1, 16, TILES_BLOCK)


def decode_tiles_kernel(depths: jnp.ndarray, mins: jnp.ndarray, payload: jnp.ndarray):
    """(depths (B,Tp//128,128) u8, mins, payload (B,R,128) u32)
    → tiles_W (B, 16, Tp) u32."""
    B, rows8, _ = depths.shape
    tp = rows8 * LANES
    assert tp % TILES_BLOCK == 0
    nb = tp // TILES_BLOCK
    return pl.pallas_call(
        _decode_kernel,
        grid=(B, nb),
        in_specs=[
            pl.BlockSpec((1, GROUPS, LANES), lambda b, g: (b, g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, GROUPS, LANES), lambda b, g: (b, g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=jax.ShapeDtypeStruct((B, 16, tp), jnp.uint32),
        out_specs=pl.BlockSpec((1, 16, TILES_BLOCK), lambda b, g: (b, 0, g), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((1,), jnp.int32),
            pltpu.VMEM((16, GROUPS, LANES), jnp.uint32),
            pltpu.VMEM((64, GROUPS, LANES), jnp.uint32),
            pltpu.VMEM((STAGE_ROWS, LANES), jnp.uint32),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(depths, mins, payload)


# ---------------------------------------------------------------------------
# XLA-side u32 tile transforms
# ---------------------------------------------------------------------------


def image_to_tiles_w(images: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W) u8 frames → tiles_W (B, 16, Tp) u32 (pure u32 transposes
    after one bitcast; edge padding per the format rule)."""
    from ..format import tile_grid
    from ..ops.tiling import pad_and_tile  # noqa: F401 (edge rule reference)

    B, H, W = images.shape
    h, w = tile_grid(W, H)
    padded = jnp.pad(images, ((0, 0), (0, 8 * h - H), (0, 8 * w - W)), mode="edge")
    x = padded.reshape(B, h, 8, w, 2, 4)
    x32 = jax.lax.bitcast_convert_type(x, jnp.uint32)  # (B,h,8,w,2)
    tw = x32.transpose(0, 2, 4, 1, 3).reshape(B, 16, h * w)
    tp = pad_tiles(h * w)
    if tp != h * w:
        tw = jnp.pad(tw, ((0, 0), (0, 0), (0, tp - h * w)))
    return tw


def tiles_w_to_image(tw: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    """tiles_W (B, 16, Tp) u32 → (B, H, W) u8 frames."""
    from ..format import tile_grid

    B = tw.shape[0]
    h, w = tile_grid(W, H)
    x32 = tw[:, :, : h * w].reshape(B, 8, 2, h, w).transpose(0, 3, 1, 4, 2)
    x = jax.lax.bitcast_convert_type(x32, jnp.uint8)  # (B,h,8,w,2,4)
    return x.reshape(B, 8 * h, 8 * w)[:, :H, :W]
