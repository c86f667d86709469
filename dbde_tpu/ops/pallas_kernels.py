"""Fused Pallas TPU kernels: DBDE tile pack+compact and expand+unpack.

Why these exist: XLA lowers the codec's data-dependent gathers (payload
compaction / window expansion) to *serial* per-element loops on TPU — measured
~139 ms for a 4×2048² roundtrip, ~1000× off speed-of-light.  These kernels
re-express the whole hot path in vector-unit-native form:

  * tiles live in a transposed pixel-major layout (64, T): pixel i of every
    tile is one (8, 128) vector row → min/max/depth/pack are straight VPU ops
    across 1024 tiles per grid step;
  * the payload stream is built 128 tiles at a time: an exclusive lane-cumsum
    gives in-group offsets, a 7-step vectorized binary search (lane gathers
    stay inside one 128-lane group — the TPU's gather limit) maps each output
    word to its source tile, and a 16-candidate gather/select materializes the
    2048-word segment;
  * segments are spliced into the byte stream with a dynamic lane roll and a
    one-row carry register, so every HBM transfer is an aligned (24, 128) DMA
    at a dynamic row offset.  DMAs are double-buffered: group s's transfer
    overlaps group s+1's compute (encode), and decode issues all 8 group
    reads up-front since the cursor chain only needs the depth array.
    The TPU grid is sequential, which makes the word cursor a simple SMEM
    scratch — the reference's serial ``target += depth*8`` cursor
    (dbde_util.cpp:155) survives, but as one scalar add per 128 tiles
    instead of per tile;
  * per-depth work (9 static bit-width variants) is predicated with
    ``@pl.when(any(depth==k))``, so blocks only pay for depths present.

Layouts
  tiles_T : (B, 64, Tp) u8        pixel-major tiles, Tp = ceil(T/1024)*1024
  depths  : (B, Tp//128, 128) u8  per-tile bit depths (row-major == file order)
  mins    : (B, Tp//128, 128) u8  per-tile minima
  payload : (B, R, 128) u32       flat word stream row-major; R = Tp//8 + 32
                                  (slack rows for the 24-row splice windows)

Payload positions past the true stream length (2*n64 words) contain garbage,
not zeros — consumers slice by n64 (the file format does too).

Mosaic driver gotchas learned the hard way (each wedges the TPU runtime):
  * DMA staging shapes must be 8-row aligned — (17, 128) copies crash;
  * dynamic-offset *multi-row* VMEM stores (``ref[pl.ds(i, 16)] = v``) hang;
    single-row dynamic reads are fine.  Hence the fixed-position staging
    buffers + per-group DMAs here instead of one block-level splice.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .kernel_common import (
    _exclusive_lane_cumsum,
    _lanes,
    _pack_contributions,
    _rightmost_le,
    _rows,
)

TILES_BLOCK = 1024  # tiles per grid step = 8 sublane-groups x 128 lanes
GROUPS = 8
LANES = 128
SEG_ROWS = 17  # 16 segment rows + 1 spill row (logical window)
STAGE_ROWS = 24  # staging/DMA rows: 8-aligned superset of the window


def payload_rows(tp: int) -> int:
    """HBM payload rows for Tp tiles (worst case 16 words/tile + splice slack)."""
    return tp * 16 // LANES + STAGE_ROWS + 8


def pad_tiles(t: int) -> int:
    return -(-t // TILES_BLOCK) * TILES_BLOCK







def _compact_group(words_ref, depth, s):
    """Compact group s's 128 tiles → (seg (16,128) u32, total words)."""
    counts = 2 * depth[s : s + 1, :]  # (1, 128)
    loff = _exclusive_lane_cumsum(counts)
    total = jnp.sum(counts)

    q = _rows((16, LANES)) * LANES + _lanes((16, LANES))
    loff_b = jnp.broadcast_to(loff, (16, LANES))
    tile_of = _rightmost_le(loff_b, q)
    within = jnp.minimum(q - jnp.take_along_axis(loff_b, tile_of, axis=-1), 15)

    seg = jnp.zeros((16, LANES), jnp.uint32)
    for jj in range(16):
        row = jnp.broadcast_to(words_ref[jj][s : s + 1, :], (16, LANES))
        cand = jnp.take_along_axis(row, tile_of, axis=-1)
        seg = jnp.where(within == jj, cand, seg)
    return seg, total


def _splice(seg, carry, r0):
    """Align a 2048-word segment to lane offset r0 with a carry first row.

    Returns (out16 (16,128), spill (1,128)) — the 17-row window to land at
    payload row ``cursor >> 7``.
    """
    rolled = pltpu.roll(seg, r0, 1)
    prev = pltpu.roll(rolled, 1, 0)  # row r -> rolled[r-1]
    lanes16 = _lanes((16, LANES))
    out16 = jnp.where(lanes16 >= r0, rolled, prev)
    out16 = jnp.where(
        (_rows((16, LANES)) == 0) & (lanes16 < r0),
        jnp.broadcast_to(carry, (16, LANES)),
        out16,
    )
    spill = jnp.where(_lanes((1, LANES)) < r0, rolled[15:16, :], jnp.uint32(0))
    return out16, spill


# ---------------------------------------------------------------------------
# encode kernel
# ---------------------------------------------------------------------------


def _encode_kernel(tiles_ref, depths_ref, mins_ref, payload_ref,
                   cursor_ref, carry_ref, words_ref, stage0_ref, stage1_ref,
                   sem0, sem1):
    b = pl.program_id(0)
    g = pl.program_id(1)

    @pl.when(g == 0)
    def _():
        cursor_ref[0] = 0
        carry_ref[...] = jnp.zeros((1, LANES), jnp.uint32)

    x = tiles_ref[0].reshape(64, GROUPS, LANES).astype(jnp.int32)
    mn = x.min(axis=0)  # (8, 128)
    mx = x.max(axis=0)
    rng = mx - mn
    depth = jnp.zeros((GROUPS, LANES), jnp.int32)
    for i in range(8):
        depth += (rng > (1 << i) - 1).astype(jnp.int32)
    res = [(x[i] - mn).astype(jnp.uint32) for i in range(64)]

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

    # ---- per-group compaction + splice, with double-buffered DMAs:
    # group s's transfer overlaps group s+1's compute; waits are deferred
    # one step so destination writes stay ordered (overlapping boundary rows).
    stages = (stage0_ref, stage1_ref)
    sems = (sem0, sem1)
    dmas = [None, None]
    for s in range(GROUPS):
        seg, total = _compact_group(words_ref, depth, s)
        c = cursor_ref[0]
        r0 = c & (LANES - 1)
        row0 = c >> 7
        stage, sem = stages[s & 1], sems[s & 1]
        # buffer s&1 was last used by group s-2, whose DMA completed before
        # group s-1's started (sequential wait chain below)
        out16, spill = _splice(seg, carry_ref[...], r0)
        stage[:16] = out16
        stage[16:17] = spill

        c_new = c + total
        ri = (c_new >> 7) - row0  # 0..16: staging row of the new partial tail
        carry_ref[...] = jnp.where(
            _lanes((1, LANES)) < (c_new & (LANES - 1)),
            stage[pl.ds(ri, 1), :],
            jnp.uint32(0),
        )
        if s > 0:
            dmas[(s - 1) & 1].wait()
        dma = pltpu.make_async_copy(
            stage, payload_ref.at[b, pl.ds(row0, STAGE_ROWS), :], sem
        )
        dma.start()
        dmas[s & 1] = dma
        cursor_ref[0] = c_new
    dmas[(GROUPS - 1) & 1].wait()


def encode_tiles_kernel(tiles_t: jnp.ndarray):
    """tiles_T (B, 64, Tp) u8 → (depths (B,Tp//128,128) u8,
    mins (B,Tp//128,128) u8, payload (B, R, 128) u32)."""
    B, sixty_four, tp = tiles_t.shape
    assert sixty_four == 64 and tp % TILES_BLOCK == 0
    nb = tp // TILES_BLOCK
    rows = payload_rows(tp)
    return pl.pallas_call(
        _encode_kernel,
        grid=(B, nb),
        in_specs=[
            pl.BlockSpec((1, 64, TILES_BLOCK), lambda b, g: (b, 0, g), memory_space=pltpu.VMEM),
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
            pltpu.VMEM((STAGE_ROWS, LANES), jnp.uint32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(tiles_t)


# ---------------------------------------------------------------------------
# decode kernel
# ---------------------------------------------------------------------------


def _decode_kernel(depths_ref, mins_ref, payload_ref, tiles_ref,
                   cursor_ref, win_ref, rstage_ref, sems):
    b = pl.program_id(0)
    g = pl.program_id(1)

    @pl.when(g == 0)
    def _():
        cursor_ref[0] = 0

    depth = depths_ref[0].astype(jnp.int32)  # (8, 128)
    mn = mins_ref[0].astype(jnp.int32)

    # the cursor chain needs only the depth sums → issue ALL group reads now
    totals = [jnp.sum(2 * depth[s : s + 1, :]) for s in range(GROUPS)]
    cs = []
    c = cursor_ref[0]
    for s in range(GROUPS):
        cs.append(c)
        c = c + totals[s]
    cursor_ref[0] = c

    dmas = []
    for s in range(GROUPS):
        dma = pltpu.make_async_copy(
            payload_ref.at[b, pl.ds(cs[s] >> 7, STAGE_ROWS), :],
            rstage_ref.at[s],
            sems.at[s],
        )
        dma.start()
        dmas.append(dma)

    # ---- per-group expansion from the fetched windows ----
    for s in range(GROUPS):
        counts = 2 * depth[s : s + 1, :]
        loff = _exclusive_lane_cumsum(counts)
        dmas[s].wait()
        r0 = cs[s] & (LANES - 1)
        loff_b = jnp.broadcast_to(loff, (16, LANES))
        phys = loff_b + _rows((16, LANES)) + r0  # window word (j,t) position
        src_row = phys >> 7  # 0..16
        src_lane = phys & (LANES - 1)
        win = jnp.zeros((16, LANES), jnp.uint32)
        for rr in range(SEG_ROWS):
            row = jnp.broadcast_to(rstage_ref[s, rr : rr + 1, :], (16, LANES))
            cand = jnp.take_along_axis(row, src_lane, axis=-1)
            win = jnp.where(src_row == rr, cand, win)
        win_ref[:, s, :] = win

    # ---- vectorized unpack across all 8 groups at once ----
    res = [jnp.zeros((GROUPS, LANES), jnp.uint32) for _ in range(64)]
    for k in range(1, 9):
        sel = depth == k
        mask = jnp.uint32((1 << k) - 1)
        for i in range(64):
            bit = i * k
            j, sh = bit >> 5, bit & 31
            v = win_ref[j] >> sh
            if sh + k > 32:
                v = v | (win_ref[j + 1] << (32 - sh))
            res[i] = jnp.where(sel, v & mask, res[i])

    out = jnp.stack([(res[i].astype(jnp.int32) + mn).astype(jnp.uint8) for i in range(64)], axis=0)
    tiles_ref[...] = out.reshape(1, 64, TILES_BLOCK)


def decode_tiles_kernel(depths: jnp.ndarray, mins: jnp.ndarray, payload: jnp.ndarray):
    """(depths (B,Tp//128,128) u8, mins (B,Tp//128,128) u8, payload
    (B,R,128) u32) → tiles_T (B, 64, Tp) u8."""
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
        out_shape=jax.ShapeDtypeStruct((B, 64, tp), jnp.uint8),
        out_specs=pl.BlockSpec((1, 64, TILES_BLOCK), lambda b, g: (b, 0, g), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((1,), jnp.int32),
            pltpu.VMEM((16, GROUPS, LANES), jnp.uint32),
            pltpu.VMEM((GROUPS, STAGE_ROWS, LANES), jnp.uint32),
            pltpu.SemaphoreType.DMA((GROUPS,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(depths, mins, payload)
