"""Band-layout Pallas kernels: DBDE codec straight from image memory.

The transpose problem: the codec kernels want tiles on vector lanes, but
images live row-major.  Materializing a tile-major layout in XLA costs ~3 ms
per 33 MB (8-byte-granule scatter, dtype-independent) — more than the codec
kernel itself.  These kernels instead read/write the image layout directly
(contiguous u32 blocks, fast DMA) and perform the pixel↔tile transpose
*in-register* with per-row lane gathers (≈500 thin ops per 1024-tile block,
~15× cheaper than the XLA transpose).

The scalar problem: the format's payload stream is sequential (the
reference's serial cursor, dbde_util.cpp:150-158), and a first-generation
kernel chained an SMEM cursor across grid blocks, extracting per-group word
totals from vectors.  Vector→scalar moves stall the TPU pipeline (~25-30
cycles each; measured ~0.5 ms of a 1.4 ms decode).  This version hoists
*every* scalar to a tiny XLA pre-pass over the depths (:func:`stream_meta`):
per block, a present-depths bitmask plus each lane-group's absolute stream
offset, delivered through scalar-prefetch SMEM.  Kernels consume scalars
from SMEM (cheap) and keep only vector work; encode runs as two phases
(depths/mins kernel → XLA meta → payload kernel) since the offsets derive
from the depths.  Measured on v5e: decode 22.8 → 34.5 Gpix/s.

Geometry fast path: requires ``W % 1024 == 0`` (tile columns per row multiple
of 128, so payload-compaction lane groups align to tile rows).  H is padded
to a multiple of the grid-block rows with zeros — zero tiles have depth 0 and
emit no payload words, so the byte stream is unaffected; the caller slices
the extra depth/min entries and decoded rows away.  The general-geometry
path stays in pallas_kernels.py.

Everything else (per-depth predicated pack, lane-cumsum offsets, vectorized
binary-search compaction, roll-spliced staging with one DMA per chunk)
matches pallas_kernels.py; see that module and dbde_util.cpp:137-180/291-328
for the format semantics being reproduced.

Image arrays cross the boundary as u32 (4 packed pixels): u8 arrays are
~10× slower through the TPU memory system here.  ``(B, H, W) u8`` on host ==
``(B, H, W//4) u32`` via a free numpy view.

Hardware notes for kernel authors (all measured on v5e):
  * vector→scalar extraction stalls ~25-30 cycles — precompute scalars in
    XLA and prefetch via SMEM (see above).
  * dynamic ``pl.when`` around gather chains is a net loss (breaks Mosaic's
    static schedule); per-*block* gating on SMEM scalars is fine.
  * RMW accumulation into strided scratch slices (``ref[:, s, :] |= v``)
    measured 1.7× slower than building the value in registers and storing
    once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .kernel_common import (
    _compact_chunk_interleaved,
    _compact_chunk_pairs,
    _compact_chunk_rowcentric,
    _compact_group_pairs,
    _exclusive_lane_cumsum,
    _lanes,
    _pack_contributions,
    _rows,
    _splice17,
)

LANES = 128
STAGE_ROWS = 144  # max window row 127+17, 8-aligned
GROUPS_PER_STAGE = 8  # lane-groups per stage flush: 8*16 payload rows + a
# 17-row splice window fit in STAGE_ROWS; wider grids (groups > 8, e.g. any
# padded width 3072) run several stage flushes per grid block — without the
# chunking, pltpu.roll wraps modulo STAGE_ROWS and later groups OR-corrupt
# earlier payload rows.


DECODE_GATHER_CLASSES = None  # optional (5, 10, 17): row-count classes for
# the decode window select chain, branched per group on SMEM scalars.
# MEASURED A LOSS — leave None.  Round-2 experiment: parity holds (TPU
# quickcheck green, all geometries) but camera decode drops 32.2 → 26.3
# Gpix/s: ``pl.when`` around the gather chains breaks Mosaic's static
# pipelining even when the condition is an SMEM scalar and the
# dynamic-offset row reads are hoisted out of the branches.  (Hoisting the
# reads IS load-bearing for correctness of the experiment: a variant with
# ``pl.ds``-on-SMEM-scalar reads inside the branch hung the chip outright.)


DECODE_BLOCK_U8 = False  # per-BLOCK uniform depth-8 window fast path: blocks
# whose SMEM kmask is exactly 1<<8 replace the 17-row window select chain
# with a 2-gather stream alignment + a static lane↔row permutation
# (see _decode_kernel).  Targets mixed batches with u8-heavy blocks — the
# batch-level u8 kernel gate (codec.py) requires the WHOLE batch uniform
# and never fires there.  The branch is per-block on an SMEM scalar with
# the staged-row reads hoisted (the per-group DECODE_GATHER_CLASSES cliff
# and the in-branch dynamic-read hang are both documented above).  The
# permutation's direct (16,8,16)-reshape form does NOT lower on Mosaic
# (clean compile error; tools/probe_transpose_when.py); the gated form is
# 8 per-16-lane-block 2D transposes + one static gather, verified on
# hardware standalone.  MEASURED A HEAVY LOSS IN THE FULL KERNEL — leave
# False.  v5e 8x2048² A/B (tools/probe_blocku8.py, parity OK all rows):
#   camera  (branch never taken)  68.2 → 68.3 Gpix/s — untaken arm is free
#   mixed   (arm on half the blocks)  52.6 → 17.9 — 2.9x SLOWER
#   uniform (arm everywhere)  53.6 → 12.3 — 4.4x slower (the dedicated
#     batch-level u8 kernel does 98.8 on the same payload)
# Same Mosaic cliff as DECODE_GATHER_CLASSES: a taken pl.when around the
# window work destroys the static window/DMA pipeline, and the in-arm
# 16x16 transposes serialize.  Per-block class dispatch inside this kernel
# is now a closed negative at both granularities; the profitable class
# split stays at BATCH granularity (codec.py dispatch → dedicated u8
# kernels).

ENCODE_COMPACT_CLASSES = None  # optional (2, 4, 8): pair-row classes for
# encode payload compaction, branched per group on SMEM scalars (a group
# with ≤ 256·PR stream words only needs a (PR,128)-shaped binary search /
# candidate select / interleave).  MEASURED A LOSS — leave None.  Round-2
# experiment: bit-exact (bench integrity check passed) but camera encode
# drops 23.3 → 7.6 Gpix/s — same Mosaic-scheduling cliff as
# DECODE_GATHER_CLASSES, amplified by the per-group seg_ref round-trip the
# branch structure forces.  The win would be ~2x on the dominant stage; a
# branchless formulation (e.g. splitting the *grid* by class) is the only
# viable route.


def payload_rows(tp: int) -> int:
    """Payload buffer rows: worst-case stream + slack for the largest
    staged-window DMA overrun (encode flushes STAGE_ROWS at the last chunk
    base; decode reads dec_stage_rows at it)."""
    return tp * 16 // LANES + max(STAGE_ROWS, dec_stage_rows(DEC_GROUPS_PER_STAGE)) + 8


def _or_fold_rows(v):
    """OR-fold (r, 128) → (1, 128) with static halving slices (Mosaic has no
    unsigned reductions); odd counts overlap the middle row, which is fine —
    this is only used for ablation keep-alive values."""
    r = v.shape[0]
    while r > 1:
        half = (r + 1) // 2
        v = v[:half] | v[r - half : r]
        r = half
    return v


def band_supported(width: int) -> bool:
    return width % 1024 == 0


BANDS_MULT: int | None = None  # grid-block height multiplier over the
# minimal band count.  None (production) = geometry-adaptive: the ladder of
# valid block heights doubles until BLOCK_ROWS_CAP image rows or
# BLOCK_GROUPS_CAP lane-groups, and pad_rows picks the ladder entry
# minimizing padded rows x measured per-row block cost (1080 rows pick
# 128-row blocks: 6.7% pad at +6.4%/row beats 18.5% pad at the 256-row
# optimum; exact multiples keep the tallest block).  Kernels infer the
# choice from the padded shape (n_bands(width, hp8)).  An int forces that
# multiplier everywhere (tools/ablate_band.py --mult, the CI suite pin).
#
# Fewer, taller grid steps amortize per-step overhead (probe_stream_bw:
# 0.23 µs/step at 32-row blocks; pure streaming 283 → 453 → 745 GB/s at
# 32 / 64 / 256-row blocks).  Measured v5e, camera 8x2048² (mult = 2/4/8 ⇒
# 64/128/256-row blocks): encode 28.4 / 31.4 / 33.1 Gpix/s, decode 46.8 /
# 53.3 / 57.0 — monotone up to the caps.  The caps bound VMEM (a 256-row
# 2048-wide block is 512 KiB of image + staging) and unrolled-kernel size
# (the payload/window loops are fully unrolled over the block's groups).

BLOCK_ROWS_CAP = 256
BLOCK_GROUPS_CAP = 64   # encode: the compaction unroll loses past this
# (Wk=5120, camera 8×2048×2536: 80-group blocks measured 35.0 vs 37.1
# Gpix/s at 40 groups — same vreg-pressure cliff as the width-8 interleave)
BLOCK_GROUPS_CAP_DEC = 80  # decode: taller blocks keep paying (48.4 → 50.9
# at the same geometry).  The two kernels may run DIFFERENT block heights
# over the same arrays: stream offsets are absolute, so block partitioning
# never affects the payload bytes — pad_rows pads to the decode (taller)
# block and each kernel infers its own bands from the padded shape.


def _bands_ladder(width: int, groups_cap: int = BLOCK_GROUPS_CAP) -> list[int]:
    """Valid tile-rows-per-grid-step values: the smallest count making the
    group total a multiple of 8 (the depths-output block sublane
    constraint), doubled while the block stays within BLOCK_ROWS_CAP /
    groups_cap."""
    import math

    wp = width // 8
    base = 1024 // math.gcd(wp, 1024)
    groups_row = wp // LANES
    ladder = [base]
    while (16 * ladder[-1] <= BLOCK_ROWS_CAP
           and 2 * ladder[-1] * groups_row <= groups_cap):
        ladder.append(2 * ladder[-1])
    return ladder


# Marginal per-row cost of shorter grid blocks, fitted to the measured v5e
# block-height sweep (camera 8x2048², 64/128/256-row blocks: decode
# 46.8/53.3/57.0 Gpix/s, encode 28.4/31.4/33.1 — both fit t(rows) = a +
# c/rows within 0.1%; this is the encode/decode average of c/a·t(256)).
# pad_rows weighs this against the padded-row waste of taller blocks.
_BLOCK_ROW_PENALTY_SLOPE = 16.5


def _block_penalty(rows: int) -> float:
    return 1.0 + _BLOCK_ROW_PENALTY_SLOPE * (1.0 / rows - 1.0 / 256.0)


def n_bands(width: int, hp8: int | None = None,
            groups_cap: int = BLOCK_GROUPS_CAP) -> int:
    """Tile rows per grid step.

    Without ``hp8``: the tallest ladder entry (production default), or
    BANDS_MULT·base when forced.  With ``hp8`` (a padded image height):
    *inference mode* — the tallest ladder entry dividing hp8//8, so kernels
    and stream_meta recover the grid geometry from the padded array shape
    itself.  The stream layout is block-size independent (offsets are
    absolute), so any consistent inference is correct; pad_rows is the one
    place that *chooses* the padding (it pads to the decode ladder, whose
    units are multiples of every encode unit below them, so both caps
    always find a divisor)."""
    import math

    wp = width // 8
    if BANDS_MULT is not None:
        return BANDS_MULT * (1024 // math.gcd(wp, 1024))
    ladder = _bands_ladder(width, groups_cap)
    if hp8 is None:
        return ladder[-1]
    rows8 = hp8 // 8
    for bands in reversed(ladder):
        if rows8 % bands == 0:
            return bands
    raise ValueError(f"padded height {hp8} not a multiple of the base "
                     f"block ({8 * ladder[0]} rows) for width {width}")


def pad_rows(h_img: int, width: int) -> int:
    """Image rows padded to a whole number of grid blocks.

    H-aware block choice: evaluates every ladder block height (the decode
    ladder — the taller of the two caps) and picks the one minimizing
    padded_rows · per-row cost (shorter blocks pay measured per-step
    overhead — see _BLOCK_ROW_PENALTY_SLOPE; taller blocks pay row padding,
    up to 31% for e.g. 1080 rows at the 256-row maximum).  Ties go to the
    taller block.  Kernels recover the choice from the padded shape via
    ``n_bands(width, hp8, groups_cap)`` — consistency needs pad_rows to
    never pick a block whose padded height a taller ladder block also
    divides, which the cost ordering guarantees (equal padded height →
    taller block has strictly lower cost)."""
    if BANDS_MULT is not None:
        unit = 8 * n_bands(width)
        return -(-h_img // unit) * unit
    best = None
    for bands in _bands_ladder(width, BLOCK_GROUPS_CAP_DEC):
        unit = 8 * bands
        padded = -(-h_img // unit) * unit
        cost = padded * _block_penalty(unit)
        if best is None or cost < best[0] - 1e-9:
            best = (cost, padded)
    return best[1]


def _geometry(width: int, hp8: int | None = None,
              groups_cap: int = BLOCK_GROUPS_CAP):
    bands = n_bands(width, hp8, groups_cap)
    wp = width // 8
    groups_row = wp // LANES
    return bands, wp, groups_row, bands * groups_row


def stream_meta(depths3: jnp.ndarray, width: int,
                groups_cap: int = BLOCK_GROUPS_CAP) -> jnp.ndarray:
    """XLA pre-pass: every scalar the kernels need, from the depth grid.

    depths3: (B, tp//128, 128) u8 in band layout.  Returns flat i32
    ``(B * nb * (groups + 2),)``; per grid block the entries are
    ``[kmask, gstart_0 .. gstart_{groups-1}, gend]`` where ``kmask`` bit k
    (1..8) flags depth-k presence in the block, ``gstart_s`` is lane-group
    s's absolute u32-word offset into the frame's payload stream (the
    format's only serialization, dbde_util.cpp:150-158, reduced to one
    cumsum here), and ``gend`` is the block's end offset.  ``groups_cap``
    must match the consuming kernel's (encode vs decode block heights).
    """
    B, rows8, _ = depths3.shape
    tp = rows8 * LANES
    bands, wp, groups_row, groups = _geometry(
        width, 8 * (tp // (width // 8)), groups_cap)
    nb = tp // (groups * LANES)
    d = depths3.astype(jnp.int32).reshape(B, nb, groups, LANES)
    gtot = 2 * jnp.sum(d, axis=-1)  # (B, nb, groups) u32 words per group
    flat = gtot.reshape(B, nb * groups)
    gstart = (jnp.cumsum(flat, axis=-1) - flat).reshape(B, nb, groups)
    gend = gstart[:, :, -1] + gtot[:, :, -1]  # (B, nb)
    kmask = jnp.zeros((B, nb), jnp.int32)
    for k in range(1, 9):
        present = jnp.any(d == k, axis=(-1, -2)).astype(jnp.int32)
        kmask = kmask | (present << k)
    meta = jnp.concatenate(
        [kmask[..., None], gstart, gend[..., None]], axis=-1
    )
    return meta.reshape(-1)


def _gather_even_odd8(src_a, src_b, hx):
    """Deinterleave 8 rows at once: out[r, l] = (src_a ++ src_b)[r, 2l+hx].

    src_a/src_b are adjacent (8, 128)-lane slices; gathers stay inside one
    128-lane group (and at (8,128) shape — Mosaic rejects thinner gathers).
    """
    l = _lanes((8, LANES))
    ia = jnp.minimum(2 * l + hx, LANES - 1)
    ib = jnp.clip(2 * l + hx - LANES, 0, LANES - 1)
    return jnp.where(
        2 * l + hx < LANES,
        jnp.take_along_axis(src_a, ia, axis=-1),
        jnp.take_along_axis(src_b, ib, axis=-1),
    )


def _interleave_half8(e8, o8, half):
    """Inverse over 8 rows: out[r, u] = e8/o8[r, (u + 128*half) >> 1] by
    parity of u."""
    u = _lanes((8, LANES))
    idx = (u >> 1) + (64 if half else 0)
    return jnp.where(
        (u & 1) == 0,
        jnp.take_along_axis(e8, idx, axis=-1),
        jnp.take_along_axis(o8, idx, axis=-1),
    )


def _deinterleave_block(x, groups, groups_row):
    """Image block (8*bands, 2*wp) u32 → x32v[ww] = (groups, 128) tiles_W
    words (the in-register pixel→tile transpose)."""
    deint = {}
    for grp in range(groups):
        tr, gc = grp // groups_row, grp % groups_row
        xa = x[8 * tr : 8 * tr + 8, 256 * gc : 256 * gc + 128]
        xb = x[8 * tr : 8 * tr + 8, 256 * gc + 128 : 256 * gc + 256]
        deint[(grp, 0)] = _gather_even_odd8(xa, xb, 0)
        deint[(grp, 1)] = _gather_even_odd8(xa, xb, 1)
    x32v = []
    for ww in range(16):
        r, hx = ww >> 1, ww & 1
        x32v.append(
            jnp.concatenate(
                [deint[(grp, hx)][r : r + 1, :] for grp in range(groups)], axis=0
            )
        )
    return x32v


def _extract_pixels(x32v):
    """x32v words → 64 (groups, 128) i32 pixel planes."""
    pix = []
    for i in range(64):
        r, cc = i >> 3, i & 7
        word = x32v[2 * r + (cc >> 2)]
        bsh = 8 * (cc & 3)
        v = word >> bsh if bsh else word
        pix.append((v & jnp.uint32(0xFF)).astype(jnp.int32))
    return pix


# ---------------------------------------------------------------------------
# encode phase A: depths + mins
# ---------------------------------------------------------------------------


def _depths_kernel(groups_row, bands, img_ref, depths_ref, mins_ref):
    groups = bands * groups_row
    pix = _extract_pixels(_deinterleave_block(img_ref[0], groups, groups_row))
    mn = pix[0]
    mx = pix[0]
    for i in range(1, 64):
        mn = jnp.minimum(mn, pix[i])
        mx = jnp.maximum(mx, pix[i])
    rng = mx - mn
    depth = jnp.zeros((groups, LANES), jnp.int32)
    for i in range(8):
        depth += (rng > (1 << i) - 1).astype(jnp.int32)
    depths_ref[...] = depth.astype(jnp.uint8).reshape(1, groups, LANES)
    mins_ref[...] = mn.astype(jnp.uint8).reshape(1, groups, LANES)


def encode_depths_kernel(img32: jnp.ndarray, interpret: bool = False):
    """img32 (B, Hp, W//4) u32 → (depths, mins) (B, tp//128, 128) u8 in band
    layout (encode phase A; dbde_util.cpp:59-75 per-tile min/max/depth)."""
    B, hp8, wq = img32.shape
    W = wq * 4
    bands, wp, groups_row, groups = _geometry(W, hp8)
    assert W % 1024 == 0 and hp8 % (8 * bands) == 0
    nb = hp8 // (8 * bands)
    tp = (hp8 // 8) * wp
    kern = functools.partial(_depths_kernel, groups_row, bands)
    return pl.pallas_call(
        kern,
        grid=(B, nb),
        in_specs=[
            pl.BlockSpec((1, 8 * bands, 2 * wp), lambda b, g: (b, g, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((B, tp // LANES, LANES), jnp.uint8),
            jax.ShapeDtypeStruct((B, tp // LANES, LANES), jnp.uint8),
        ),
        out_specs=(
            pl.BlockSpec((1, groups, LANES), lambda b, g: (b, g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, groups, LANES), lambda b, g: (b, g, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(img32)


# ---------------------------------------------------------------------------
# encode phase B: payload
# ---------------------------------------------------------------------------


def _payload_kernel(groups_row, bands, nent, pair_rows, mplanes, ablate_stage,
                    meta_ref, img_ref, depths_ref, mins_ref, payload_ref,
                    carry_ref, words_ref, stage_ref, seg_ref, sems):
    """``pair_rows`` (trace-time) bounds every lane-group's stream at
    ``256·pair_rows`` u32 words.  Production always uses 8: reduced variants
    measured SLOWER on v5e (1.488 vs 1.273 ms at pair_rows=5 — non-pow2
    sublane-block shapes lower worse than the element saving; see the
    DECODE_CHAIN_VARIANTS comment).  The parameter stays for experiments and
    its parity is pinned by tests.

    ``mplanes`` (trace-time) bounds every tile's depth in the batch: the
    pack loop and the compaction candidate scan skip planes ≥ mplanes
    entirely — statically, so Mosaic's schedule stays intact (unlike the
    per-group ``pl.when`` classes, a measured 3x loss).  The caller
    dispatches on the batch's actual max depth (see encode_band_kernel);
    8 = the general kernel, always correct.

    ``ablate_stage`` (trace-time; None in production) truncates the kernel
    after stage N for per-stage cost profiling (tools/ablate_band.py): 0 =
    deint+extract, 1 = +pack, 2 = +compaction, None/3 = full.  Ablated
    variants write keep-alive garbage — only device time is meaningful."""
    PR = pair_rows
    groups = bands * groups_row
    b = pl.program_id(0)
    g = pl.program_id(1)
    nb = pl.num_programs(1)
    mbase = (b * nb + g) * nent
    kmask = meta_ref[mbase]

    def _keep_flush(v):
        """OR-reduce v to one row, broadcast over the stage buffer, one DMA
        (keeps every input to v alive through the DMA side effect)."""
        v1 = _or_fold_rows(v)
        stage_ref[...] = jnp.broadcast_to(v1, (2 * STAGE_ROWS, LANES))
        dma = pltpu.make_async_copy(
            stage_ref.at[pl.ds(0, STAGE_ROWS), :],
            payload_ref.at[b, pl.ds(0, STAGE_ROWS), :],
            sems.at[0],
        )
        dma.start()
        dma.wait()

    @pl.when(g == 0)
    def _():
        carry_ref[...] = jnp.zeros((1, LANES), jnp.uint32)

    depth = depths_ref[0].astype(jnp.int32)
    mn = mins_ref[0].astype(jnp.int32)
    pix = _extract_pixels(_deinterleave_block(img_ref[0], groups, groups_row))
    res = [(pix[i] - mn).astype(jnp.uint32) for i in range(64)]

    if ablate_stage == 0:
        acc = res[0]
        for i in range(1, 64):  # OR all planes so none is dead-code-eliminated
            acc = acc | res[i]
        _keep_flush(acc)
        return

    for j in range(2 * mplanes):
        words_ref[j] = jnp.zeros((groups, LANES), jnp.uint32)
    for k in range(1, mplanes + 1):
        @pl.when((kmask & (1 << k)) != 0)
        def _(k=k):
            sel = depth == k
            for j in range(2 * k):
                words_ref[j] = jnp.where(sel, _pack_contributions(res, k, j), words_ref[j])

    if ablate_stage == 1:
        _keep_flush(words_ref[0] | words_ref[2 * mplanes - 1])
        return

    def g_total(s):
        """Group s's u32-word count (SMEM scalar — gates the past-stream
        compaction mask, see kernel_common._mask_past_total)."""
        return meta_ref[mbase + 2 + s] - meta_ref[mbase + 1 + s]

    def compact(s):
        """Group s's compacted (16,128) word segment, pair-row-classed on
        the group's SMEM word total when ENCODE_COMPACT_CLASSES is set (the
        class branches write through seg_ref since ``pl.when`` regions
        cannot return values; the first class also covers empty groups —
        their words are all-zero, so the compacted segment is zero)."""
        ploff = ploff_all[s : s + 1, :]
        if not ENCODE_COMPACT_CLASSES:
            seg, _ = _compact_group_pairs(words_ref, depth, s, ploff, g_total(s),
                                          mplanes=mplanes)
            return seg
        need = (g_total(s) + 255) >> 8  # pair rows: 256 u32 words each
        prev = -1
        for PR in ENCODE_COMPACT_CLASSES:
            @pl.when((need > prev) & (need <= PR))
            def _(PR=PR):
                seg, _ = _compact_group_pairs(
                    words_ref, depth, s, ploff, g_total(s), pair_rows=PR
                )
                if PR < 8:
                    seg = jnp.concatenate(
                        [seg, jnp.zeros((16 - 2 * PR, LANES), jnp.uint32)], axis=0
                    )
                seg_ref[...] = seg
            prev = PR
        return seg_ref[...]

    ploff_all = _exclusive_lane_cumsum(depth)  # pair offsets, all groups at once

    def _seg(seg_all, i):
        """Group i-of-chunk's (16, 128) word segment out of the batched
        compaction value, zero-padded past 2·PR rows.  Slots beyond a
        group's word total are zeroed by the compaction's past-stream mask
        (kernel_common._mask_past_total) — they gather the group's LAST
        tile with wm capped at 7, which is real data whenever that tile
        has depth 8, NOT zeros (round-3 fix; the prior "zeroed planes"
        assumption silently corrupted the next group's stream head for
        partial groups ending in a depth-8 tile).  The batched value stays
        register/VMEM-resident — an explicit scratch round-trip measured
        +0.24 ms/33 MB (it serializes against Mosaic's software
        pipelining)."""
        seg = seg_all[2 * PR * i : 2 * PR * i + 2 * PR]
        if PR == 8:
            return seg
        return jnp.concatenate(
            [seg, jnp.zeros((16 - 2 * PR, LANES), jnp.uint32)], axis=0
        )

    rowcentric = (ENCODE_ROWCENTRIC_COMPACTION is True
                  or (ENCODE_ROWCENTRIC_COMPACTION == "auto" and mplanes < 8))
    batched = (ENCODE_BATCHED_COMPACTION and not ENCODE_COMPACT_CLASSES
               and not rowcentric)
    interleaved = (ENCODE_INTERLEAVED_COMPACTION and not batched
                   and not ENCODE_COMPACT_CLASSES and not rowcentric)

    def chunk_segs(c0, ncg):
        """The chunk's ncg (16, 128) word segments, by the configured
        compaction strategy (production: row-centric for reduced-plane
        variants, step-major interleaved searches otherwise)."""
        totals = [g_total(s) for s in range(c0, c0 + ncg)]
        if rowcentric:
            return _compact_chunk_rowcentric(
                words_ref, c0, ncg, ploff_all, totals=totals, mplanes=mplanes
            )
        if interleaved:
            segs = _compact_chunk_interleaved(
                words_ref, c0, ncg, ploff_all, pair_rows=PR, totals=totals,
                mplanes=mplanes,
            )
            if PR < 8:
                segs = [
                    jnp.concatenate(
                        [sg, jnp.zeros((16 - 2 * PR, LANES), jnp.uint32)], axis=0
                    )
                    for sg in segs
                ]
            return segs
        if batched:
            seg_all = _compact_chunk_pairs(
                words_ref, c0, ncg, ploff_all, pair_rows=PR, totals=totals,
                mplanes=mplanes,
            )
            return [_seg(seg_all, i) for i in range(ncg)]
        return [compact(s) for s in range(c0, c0 + ncg)]

    if ablate_stage == 2:
        acc = jnp.zeros((16, LANES), jnp.uint32)
        for c0 in range(0, groups, GROUPS_PER_STAGE):
            ncg = min(c0 + GROUPS_PER_STAGE, groups) - c0
            for sg in chunk_segs(c0, ncg):
                acc = acc | sg
        _keep_flush(acc)
        return

    # the cross-group carry row lives in a register across the block's
    # chunks (one VMEM read here, one write at block end) — the per-group
    # carry_ref round-trip serialized the splice loop
    #
    # Ping-pong staged flush: consecutive chunk windows OVERLAP at the
    # boundary payload row (the next chunk's first row re-writes this
    # chunk's partial last row with the carry spliced in), so two flushes
    # must never be in flight at once — concurrent overlapping writes are
    # an unordered WAW race.  Each chunk therefore computes its stage into
    # the alternate slot, waits the PREVIOUS chunk's DMA, then starts its
    # own: the ordering constraint holds while every flush's latency hides
    # behind the next chunk's compaction (the prior start();wait() exposed
    # the full round trip per chunk).  Parity is the global chunk index
    # (gi·nchunks + ci) & 1 — static when nchunks is even, traced when odd
    # (the decode window pipeline's scheme); the first chunk of the whole
    # grid has nothing to wait on and the last drains its own DMA.
    nchunks = -(-groups // GROUPS_PER_STAGE)
    gi = b * nb + g

    def _dma(slot, row_base):
        return pltpu.make_async_copy(
            stage_ref.at[pl.ds(slot * STAGE_ROWS, STAGE_ROWS), :],
            payload_ref.at[b, pl.ds(row_base, STAGE_ROWS), :],
            sems.at[slot],
        )

    carry = carry_ref[...]
    prefetch = ENCODE_CHUNK_PREFETCH and rowcentric
    segs = chunk_segs(0, min(GROUPS_PER_STAGE, groups)) if prefetch else None
    for ci, c0 in enumerate(range(0, groups, GROUPS_PER_STAGE)):
        ncg = min(c0 + GROUPS_PER_STAGE, groups) - c0
        if prefetch:
            # emit the NEXT chunk's (batched, carry-independent) compaction
            # before this chunk's serial splice chain, so the splice hides
            # in its shadow (the batched strategies otherwise serialize:
            # all segs ready at once, then 8 dependent splices with nothing
            # to overlap — measured +0.10 ms vs their compaction-only cost)
            nc0 = c0 + GROUPS_PER_STAGE
            segs_next = (chunk_segs(nc0, min(nc0 + GROUPS_PER_STAGE, groups) - nc0)
                         if nc0 < groups else None)
        else:
            segs = chunk_segs(c0, ncg)
        row_base = meta_ref[mbase + 1 + c0] >> 7
        stage = jnp.zeros((STAGE_ROWS, LANES), jnp.uint32)
        for s in range(c0, c0 + ncg):
            seg = segs[s - c0]
            lc = meta_ref[mbase + 1 + s] - (row_base << 7)
            win17 = _splice17(seg, carry, lc & (LANES - 1))
            pad = jnp.concatenate(
                [win17, jnp.zeros((STAGE_ROWS - 17, LANES), jnp.uint32)], axis=0
            )
            stage = stage | pltpu.roll(pad, lc >> 7, 0)

            lc_new = meta_ref[mbase + 2 + s] - (row_base << 7)
            ri = (lc_new >> 7) - (lc >> 7)
            win24 = jnp.concatenate([win17, jnp.zeros((7, LANES), jnp.uint32)], axis=0)
            top = pltpu.roll(win24, (24 - ri) % 24, 0)[0:1, :]
            carry = jnp.where(
                _lanes((1, LANES)) < (lc_new & (LANES - 1)), top, jnp.uint32(0)
            )

        p = (ci & 1) if nchunks % 2 == 0 else (gi + ci) & 1

        def _flush(slot, row_base=row_base, stage=stage, first=(ci == 0)):
            stage_ref[slot * STAGE_ROWS : (slot + 1) * STAGE_ROWS, :] = stage
            # wait the previous chunk's flush on the other slot (the wait
            # consumes the semaphore + transfer size; the descriptor's
            # row_base does not matter for waiting)
            if first:
                @pl.when(gi > 0)
                def _():
                    _dma(1 - slot, row_base).wait()
            else:
                _dma(1 - slot, row_base).wait()
            _dma(slot, row_base).start()

        if isinstance(p, int):
            _flush(p)
        else:
            @pl.when(p == 0)
            def _():
                _flush(0)

            @pl.when(p == 1)
            def _():
                _flush(1)

        if ci == nchunks - 1:
            last = (b == pl.num_programs(0) - 1) & (g == nb - 1)
            if isinstance(p, int):
                @pl.when(last)
                def _(row_base=row_base, p=p):
                    _dma(p, row_base).wait()
            else:
                @pl.when(last & (p == 0))
                def _(row_base=row_base):
                    _dma(0, row_base).wait()

                @pl.when(last & (p == 1))
                def _(row_base=row_base):
                    _dma(1, row_base).wait()
        if prefetch:
            segs = segs_next
    carry_ref[...] = carry


def encode_payload_kernel(meta: jnp.ndarray, img32: jnp.ndarray,
                          depths3: jnp.ndarray, mins3: jnp.ndarray,
                          interpret: bool = False, ablate_stage: int | None = None,
                          pair_rows: int = 8, mplanes: int = 8):
    """Encode phase B: compacted payload stream (B, R, 128) u32 from the
    image block + phase-A depth/min grids + prefetched stream offsets.

    ``mplanes`` < 8 compiles a reduced-plane variant that is only correct
    when every tile depth in the batch is ≤ mplanes (see _payload_kernel)."""
    B, hp8, wq = img32.shape
    W = wq * 4
    bands, wp, groups_row, groups = _geometry(W, hp8)
    nb = hp8 // (8 * bands)
    tp = (hp8 // 8) * wp
    rows = payload_rows(tp)
    nent = groups + 2
    kern = functools.partial(_payload_kernel, groups_row, bands, nent,
                             pair_rows, mplanes, ablate_stage)
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
                pltpu.VMEM((2 * mplanes, groups, LANES), jnp.uint32),
                pltpu.VMEM((2 * STAGE_ROWS, LANES), jnp.uint32),
                pltpu.VMEM((16, LANES), jnp.uint32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, rows, LANES), jnp.uint32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(meta, img32, depths3, mins3)


ENCODE_INTERLEAVED_COMPACTION = True  # run the chunk's binary searches
# step-major in sub-chunks of kernel_common.INTERLEAVE_WIDTH groups
# (kernel_common._compact_chunk_interleaved) instead of group-major.  The
# search is a 7-step *dependent* gather chain; per-group program order
# serializes it, while round-robin order hides each step's latency behind
# the other groups' steps at identical shapes and zero extra data movement.
# Measured v5e camera 8x2048²: width 4 encode 33.1 → 34.2 Gpix/s (width 2:
# 34.15; width 8 with candidates+interleave also step-major: 28.7 — vreg
# spills).  False restores the round-2 group-major order for A/B.
#
# Compaction optimization attempts beyond this, all MEASURED NO-GAIN/LOSS
# on v5e (tools/probe_compact*.py, 211 ns/group baseline = the whole
# remaining encode gap; kept as probe tools so they are not re-tried
# blind):
#   * packed2 (two groups per (16,128) vreg op, halved op count): 207 ns —
#     the stage is element-throughput-bound, not op-count-bound.
#   * merged lo/hi candidate gathers ((32,128) per m): 207 ns, same reason.
#   * pltpu.repeat for the pair→word interleave: 207 ns.
#   * interleave via MXU one-hot matmuls (16-bit halves, exact): 476 ns —
#     the int↔f32 casts and small matmuls cost far more than the (16,128)
#     gathers they replace.
#   * wm-fold (track ascent values, drop the final ploff re-gather): 210 ns.
#   * splat-ladder first ascent steps (constant-index steps as broadcasts):
#     Mosaic "Not implemented: Broadcast in both sublanes and lanes" — an
#     element→lanes broadcast needs a gather anyway.
# Conclusion: pair-space compaction sits at its practical VPU floor; the
# encode/decode gap is the format's inverse-map (stream-slot → tile)
# having no closed form, unlike decode's forward map.

ENCODE_ROWCENTRIC_COMPACTION = True  # compact with SUBLANES = GROUPS and
# a pair-row LEVEL loop (kernel_common._compact_chunk_rowcentric): per-group
# work scales with mplanes instead of the worst-case PR=8, sources are
# natural contiguous slices (no row broadcasts/repeats), and the 8 groups'
# binary searches share each (8,128) op.  Alone it is NET-NEUTRAL-TO-LOSS on
# v5e despite ~43% fewer gather elements at mplanes=5 (camera 8x2048²,
# tools/probe_rowcentric.py): payload kernel 0.861 ms vs interleaved 0.842,
# whole encode 34.9 vs 35.6 Gpix/s — the compaction stage itself IS faster
# (ablate_stage=2: 0.759 vs 0.885 ms) but the batched formulation denies
# Mosaic the per-group compaction/splice overlap the interleaved strategy
# gets for free, and the splice re-serializes (+0.10 ms).  WITH
# ENCODE_CHUNK_PREFETCH the overlap comes back explicitly and the saving
# lands at EVERY plane count (whole-encode Gpix/s, 8x2048²):
#   mplanes=5 camera content  35.6 → 45.7   (payload 0.842 → 0.635 ms)
#   mplanes=8 camera content  34.0 → 39.3   (payload 0.887 → 0.754 ms)
#   mplanes=8 random content  34.5 → 40.0   (payload 0.873 → 0.740 ms —
#     full 16-word streams; no vreg spill from the doubled live segments)
# True (production) = all variants; "auto" = reduced-plane variants only
# (mplanes < 8); False = the round-4 interleaved strategy for A/B.

ENCODE_CHUNK_PREFETCH = True  # with a batched compaction strategy
# (rowcentric), compute chunk c+1's segments BEFORE chunk c's splice in
# program order, so the serial 16-row splice chain schedules into the next
# compaction's shadow.  Irrelevant for the per-group strategies (their
# compaction/splice work already interleaves group-by-group).  MEASURED THE
# WIN that makes rowcentric pay (v5e camera 8x2048², mplanes=5,
# tools/probe_rowcentric.py): payload kernel 0.842 → 0.635 ms, whole encode
# 35.6 → 45.7 Gpix/s — the feared vreg spill from the doubled live-segment
# state does not materialize at mplanes ≤ 5 level counts.  Byte parity of
# every strategy combination is pinned in CI
# (test_pallas_kernels.test_encode_compaction_strategy_parity).

ENCODE_BATCHED_COMPACTION = False  # batch the chunk's 8 per-group pair
# compactions into (64,128)-shaped ops.  MEASURED A LOSS on v5e — leave
# False: camera encode 1.35 ms batched vs 1.19 ms per-group.  The batch
# replaces per-group one-row ``broadcast_to`` (free, a lane-constant vreg)
# with ``jnp.repeat`` of 8 distinct rows (real sublane data movement), which
# costs more than the amortized binary-search latency it saves.  Kept behind
# this flag with parity coverage so the negative result stays reproducible.

DEC_GROUPS_PER_STAGE = 32  # lane-groups per decode staged window.  Encode's
# GROUPS_PER_STAGE stays 8 (its flush granularity is register-resident
# stage state); the decode windows are pure DMA staging, so fewer, larger
# windows amortize the pipeline's serial wait points (the dma+meta ablation
# stage is ~10x the pure-stream time of the same bytes — latency, not
# bandwidth).  Measured v5e 8×2048² (gps 8/16/32/64): camera 62.9 / 66.6 /
# 68.2 / 68.4 Gpix/s, random 53.6 at 32 — diminishing past 32, and 64
# doubles the window VMEM (2 · (16·gps+16) rows · 512 B = 540 KB at 32)
# and forces the odd-nch traced ping-pong parity.


def dec_stage_rows(gps: int) -> int:
    """Staged-window rows for a gps-group decode window: the full-depth
    span (16 rows/group) plus the last group's 17-row window overhang,
    8-aligned (16·8+16 = 144 = the original STAGE_ROWS)."""
    return 16 * gps + 16


DECODE_CHAIN_VARIANTS = (6, 11, 17)  # window-gather chain lengths of the
# compiled decode variants (rows of staged payload each group's tile window
# can span), selected per batch by lax.switch.  Measured needs: flat 0,
# camera ≈10, random 16; measured wins (v5e, camera 8×2048²): chain 11 =
# 0.642 ms vs chain 17 = 0.799 ms, switch overhead unmeasurable.  The
# matching ENCODE experiment was a LOSS and is not wired: pair_rows=5
# payload variants measured 1.488 ms vs 1.273 ms for pair_rows=8 (non-pow2
# sublane-block shapes lower worse than the 5/8 element saving), and
# lax.switch on the encode side adds ~0.15 ms (the conditional copies the
# 33 MB img32 operand; decode's switch operands are the compressed stream).


def _group_totals(depths3: jnp.ndarray, width: int):
    """(gstart, gtot): per-lane-group absolute word offsets and word counts
    ((B, nb·groups) i32 each) — the scalars behind both variant selectors."""
    B = depths3.shape[0]
    tp = depths3.shape[1] * LANES
    _, _, _, groups = _geometry(width, 8 * (tp // (width // 8)))
    nb = tp // (groups * LANES)
    d = depths3.astype(jnp.int32).reshape(B, nb * groups, LANES)
    gtot = 2 * jnp.sum(d, axis=-1)
    gstart = jnp.cumsum(gtot, axis=-1) - gtot
    return gstart, gtot


def _variant_index(need, bounds):
    idx = jnp.zeros((), jnp.int32)
    for b in bounds[:-1]:
        idx = idx + (need > b).astype(jnp.int32)
    return idx


def encode_band_kernel(img32: jnp.ndarray, interpret: bool = False,
                       mplanes: int = 8):
    """img32 (B, Hp, W//4) u32 [Hp % block rows == 0, W % 1024 == 0] →
    (depths (B, Tp//128, 128) u8, mins, payload (B, R, 128) u32).

    Two device phases + an XLA scalar pre-pass in between (module
    docstring); the whole pipeline is jittable as one program.
    ``interpret`` runs the kernels in Pallas interpreter mode (CPU) — used
    by the sharded codec on virtual device meshes.

    ``mplanes`` < 8 compiles the reduced-plane payload variant — only
    correct when every tile depth in the batch is ≤ mplanes (the codec
    dispatches on the phase-A max, codec.py)."""
    W = img32.shape[2] * 4
    d3, m3 = encode_depths_kernel(img32, interpret=interpret)
    meta = stream_meta(d3, W)
    payload = encode_payload_kernel(meta, img32, d3, m3, interpret=interpret,
                                    mplanes=mplanes)
    return d3, m3, payload


# ---------------------------------------------------------------------------
# uniform depth-8 fast path (closed-form stream permutation)
#
# When every REAL tile in the batch has depth 8 (the random/full-depth
# regime — the reference's own default bench content, and its own special
# case: dbde_util.cpp:57-63 encode memcpy, :229-244 decode), the format
# collapses: each pixel's residual occupies exactly one payload BYTE, so a
# payload u32 word IS four consecutive residual bytes of one tile row — the
# same byte layout as the image word, minus the tile min in every byte.
# Encoding/decoding a block is therefore a STATIC u32-word permutation
# between image layout and stream layout plus one carry-free byte-wise
# add/subtract of min*0x01010101 (residual <= 255-min and pixel >= min per
# byte, so the u32 add/sub never carries across bytes).  No binary search,
# no pack/unpack, no data-dependent select chain — the two stages the
# random-content ablation shows dominating (encode compaction 0.865 ms of
# 0.976, decode window gathers 0.364 ms of 0.626 at 8x2048²; ROUND4_NOTES).
#
# Pad tiles (column pads and fold pads) have depth 0 and emit nothing; with
# every real depth fixed at 8 their positions make the whole stream layout
# *statically* computable, so the permutation's gather indices and masks are
# trace-time numpy constants (deduplicated — the patterns repeat with the
# pad period, a few hundred distinct (8,128) arrays worst case).  Validity
# is the caller's contract (codec.py gates on the batch's real-depth min
# via the adaptive dispatch); geometry restrictions (no grid-block row
# padding, whole folds, 128-aligned block streams) are checked statically
# by codec.uniform8_supported.
# ---------------------------------------------------------------------------


def _u8_geom(bands: int, wp: int, wpp: int, w_real: int):
    """Static per-block stream layout at uniform depth 8: real-tile mask
    over the block's band-layout lanes (pads = the (wpp - w_real) tail of
    every fold segment), sequential-real-tile -> lane order, and the
    block's total stream words (16 per real tile)."""
    import numpy as np

    t = np.arange(bands * wp)
    real = (t % wpp) < w_real
    order = t[real]
    return real, order, 16 * order.size


def _u8_img_pos(order, wp, w):
    """Stream word index array -> (img row, img u32 col) for uniform-8
    blocks: word w = 16*t_seq + j belongs to real tile order[t_seq], pixel
    row j>>1, u32 half j&1 (the byte layouts coincide — see module note)."""
    t_seq, j = w >> 4, w & 15
    t = order[t_seq]
    return 8 * (t // wp) + (j >> 1), 2 * (t % wp) + (j & 1), t


_U8_ENC_ROWS = 128  # payload rows per encode flush (16 stage8 blocks); the
# chunks tile the block stream exactly (block_words % 128 == 0 is a static
# gate), so consecutive DMAs never overlap — the ping-pong ordering is kept
# for the stage-buffer reuse (a slot must not be rewritten while its DMA is
# in flight), same protocol as the general kernel's.


class _U8Table:
    """Deduplicating builder for the fused (mask, lane-idx) permutation
    table: entry bit 8 = slot valid, bits 0-6 = source lane.  The patterns
    repeat with the pad period, so distinct (8,128) entries number a few
    dozen to a few hundred; the table travels as ONE kernel input tensor
    (pallas kernels may not capture trace-time constants)."""

    def __init__(self):
        self._ids = {}
        self.entries = []

    def add(self, m, ix):
        a = ((ix.astype(np.int32) & 127)
             | (m.astype(np.int32) << 8)).astype(np.int32)
        key = a.tobytes()
        ti = self._ids.get(key)
        if ti is None:
            ti = self._ids[key] = len(self.entries)
            self.entries.append(a)
        return ti

    def tensor(self):
        return np.stack(self.entries)  # (N, 8, 128) i32


@functools.lru_cache(maxsize=None)
def _u8_encode_plan(bands, wp, wpp, w_real):
    """Per-chunk stage8-block source descriptors for the uniform-8 encode.

    chunks[ci][k] describes stage rows [128*ci + 8*k, +8): either None
    (past the block stream — flushed as zeros, overwritten by the next
    block) or (img_sources, min_sources) where img_sources groups the
    block's 8*128 word slots by (img row, 128-lane col group) into fused
    table entries and min_sources by depth-grid group row.  Returns
    (block_rows, nchunks, chunks, table tensor).
    """
    real, order, block_words = _u8_geom(bands, wp, wpp, w_real)
    block_rows = block_words // 128
    assert block_words % 128 == 0
    nchunks = -(-block_rows // _U8_ENC_ROWS)
    tab = _U8Table()
    chunks = []
    for ci in range(nchunks):
        blocks = []
        for r0 in range(0, _U8_ENC_ROWS, 8):
            base = ci * _U8_ENC_ROWS + r0
            if base >= block_rows:
                blocks.append(None)
                continue
            w = base * 128 + np.arange(8 * 128).reshape(8, 128)
            valid = w < block_words
            ir, ic, t = _u8_img_pos(order, wp, np.where(valid, w, 0))
            cg = ic >> 7
            img_sources = []
            for irow, cgi in sorted({(int(a), int(b))
                                     for a, b in zip(ir[valid], cg[valid])}):
                m = valid & (ir == irow) & (cg == cgi)
                img_sources.append(
                    (irow, cgi, tab.add(m, np.where(m, ic & 127, 0))))
            min_sources = []
            grp = t >> 7
            for gr in sorted({int(x) for x in grp[valid]}):
                m = valid & (grp == gr)
                min_sources.append((gr, tab.add(m, np.where(m, t & 127, 0))))
            blocks.append((img_sources, min_sources))
        chunks.append(blocks)
    return block_rows, nchunks, chunks, tab.tensor()


def _u8_gather8(srcs, rows, tab_ref):
    """(8,128) value assembled from fused-table gathers: for each source,
    mask/idx come from the table entry, data from ``rows(*key)`` (1,128)."""
    acc = jnp.zeros((8, LANES), jnp.uint32)
    for entry in srcs:
        t = tab_ref[entry[-1]]
        src = jnp.broadcast_to(rows(*entry[:-1]), (8, LANES))
        acc = jnp.where(t >= 256,
                        jnp.take_along_axis(src, t & 127, axis=-1), acc)
    return acc


def _payload_u8_kernel(bands, wp, wpp, w_real, img_ref, mins_ref, tab_ref,
                       payload_ref, stage_ref, sems):
    block_rows, nchunks, chunks, _ = _u8_encode_plan(bands, wp, wpp, w_real)
    b = pl.program_id(0)
    g = pl.program_id(1)
    nb = pl.num_programs(1)
    gi = b * nb + g
    x = img_ref[0]  # (8*bands, 2*wp)
    mnw = mins_ref[0].astype(jnp.uint32) * jnp.uint32(0x01010101)

    def _dma(slot, row_base):
        return pltpu.make_async_copy(
            stage_ref.at[pl.ds(slot * _U8_ENC_ROWS, _U8_ENC_ROWS), :],
            payload_ref.at[b, pl.ds(row_base, _U8_ENC_ROWS), :],
            sems.at[slot],
        )

    for ci in range(nchunks):
        rows8 = []
        for blk in chunks[ci]:
            if blk is None:
                rows8.append(jnp.zeros((8, LANES), jnp.uint32))
                continue
            img_sources, min_sources = blk
            perm = _u8_gather8(
                img_sources,
                lambda ir, cg: x[ir : ir + 1, 128 * cg : 128 * cg + 128],
                tab_ref,
            )
            sub = _u8_gather8(
                min_sources, lambda gr: mnw[gr : gr + 1, :], tab_ref
            )
            rows8.append(perm - sub)
        stage = jnp.concatenate(rows8, axis=0)
        row_base = g * block_rows + ci * _U8_ENC_ROWS
        # same ping-pong flush ordering as the general payload kernel: the
        # wait gates stage-buffer reuse (chunks here never overlap rows)
        p = (ci & 1) if nchunks % 2 == 0 else (gi + ci) & 1

        def _flush(slot, row_base=row_base, stage=stage, first=(ci == 0)):
            stage_ref[slot * _U8_ENC_ROWS : (slot + 1) * _U8_ENC_ROWS, :] = stage
            if first:
                @pl.when(gi > 0)
                def _():
                    _dma(1 - slot, row_base).wait()
            else:
                _dma(1 - slot, row_base).wait()
            _dma(slot, row_base).start()

        if isinstance(p, int):
            _flush(p)
        else:
            @pl.when(p == 0)
            def _():
                _flush(0)

            @pl.when(p == 1)
            def _():
                _flush(1)

        if ci == nchunks - 1:
            last = (b == pl.num_programs(0) - 1) & (g == nb - 1)
            if isinstance(p, int):
                @pl.when(last)
                def _(row_base=row_base, p=p):
                    _dma(p, row_base).wait()
            else:
                @pl.when(last & (p == 0))
                def _(row_base=row_base):
                    _dma(0, row_base).wait()

                @pl.when(last & (p == 1))
                def _(row_base=row_base):
                    _dma(1, row_base).wait()


def encode_payload_u8_kernel(img32: jnp.ndarray, mins3: jnp.ndarray,
                             wpp: int, w_real: int, interpret: bool = False):
    """Uniform depth-8 payload: the closed-form stream permutation (module
    note above).  ONLY correct when every real tile in the batch has depth
    8 — the codec gates dispatch on the batch's real-depth min and verifies
    (codec.py).  Output contract matches encode_payload_kernel."""
    B, hp8, wq = img32.shape
    W = wq * 4
    bands, wp, groups_row, groups = _geometry(W, hp8)
    nb = hp8 // (8 * bands)
    tp = (hp8 // 8) * wp
    rows = payload_rows(tp)
    _, _, _, tab = _u8_encode_plan(bands, wp, wpp, w_real)
    kern = functools.partial(_payload_u8_kernel, bands, wp, wpp, w_real)
    return pl.pallas_call(
        kern,
        grid=(B, nb),
        in_specs=[
            pl.BlockSpec((1, 8 * bands, 2 * wp), lambda b, g: (b, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, groups, LANES), lambda b, g: (b, g, 0),
                         memory_space=pltpu.VMEM),
            # the fused permutation table: constant across grid steps
            pl.BlockSpec(tab.shape, lambda b, g: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((B, rows, LANES), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((2 * _U8_ENC_ROWS, LANES), jnp.uint32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(img32, mins3, jnp.asarray(tab))


_U8_WIN_ROWS = 512  # payload rows per decode staged window (the uniform
# analogue of DEC_GROUPS_PER_STAGE=32 full groups); windows read +16 rows
# of overhang so an image chunk whose words straddle the boundary stays
# whole (a chunk spans <= 9 rows).


@functools.lru_cache(maxsize=None)
def _u8_decode_plan(bands, wp, wpp, w_real):
    """Per-window image-chunk source descriptors for the uniform-8 decode.

    windows[wi] lists (tr, cg, sources, min_src) image chunks — the (8,128)
    u32 output slice img[8*tr:+8, 128*cg:+128] — whose stream words start in
    payload rows [win*wi, win*(wi+1)); sources are (staged-row-offset,
    table-idx) static gathers, min_src = (group row, table-idx) for the tile
    minima (pad-tile slots keep zero + zero min).  Also returns the window
    row count, windows per block, and the fused table tensor.
    """
    real, order, block_words = _u8_geom(bands, wp, wpp, w_real)
    block_rows = block_words // 128
    win = min(_U8_WIN_ROWS, block_rows)
    nwin = -(-block_rows // win)
    off = np.full(bands * wp, -1, np.int64)
    off[order] = 16 * np.arange(order.size)
    lane = np.arange(128)
    sr = np.arange(8)[:, None]
    tab = _U8Table()
    ones = np.ones((8, 128), bool)
    windows = [[] for _ in range(nwin)]
    for tr in range(bands):
        for cg in range(wp // 64):
            A = tr * wp + 64 * cg
            t = A + (lane >> 1)  # (128,) tile per lane pair
            realm = real[t]
            if not realm.any():
                windows[0].append((tr, cg, [], None))
                continue
            w = off[t][None, :] + 2 * sr + (lane & 1)[None, :]  # (8,128)
            valid = np.broadcast_to(realm[None, :], (8, 128))
            wi = int(w[valid].min()) // (128 * win)
            rel = np.where(valid, w - wi * win * 128, 0)
            srow = rel >> 7
            assert int(srow[valid].max()) < win + 16
            sources = []
            for rr in sorted({int(r) for r in srow[valid]}):
                m = valid & (srow == rr)
                sources.append((rr, tab.add(m, np.where(m, rel & 127, 0))))
            min_src = (A >> 7, tab.add(
                ones, np.broadcast_to((A & 127) + (lane >> 1), (8, 128))))
            windows[wi].append((tr, cg, sources, min_src))
    return block_rows, win, nwin, windows, tab.tensor()


def _decode_u8_kernel(bands, wp, wpp, w_real, stage_rows,
                      mins_ref, tab_ref, payload_ref, img_ref, rstage_ref,
                      sems):
    block_rows, win, nwin, windows, _ = _u8_decode_plan(bands, wp, wpp, w_real)
    b = pl.program_id(0)
    g = pl.program_id(1)
    nb = pl.num_programs(1)
    mnw = mins_ref[0].astype(jnp.uint32) * jnp.uint32(0x01010101)

    def read_into(slot, rbase):
        return pltpu.make_async_copy(
            payload_ref.at[b, pl.ds(rbase, stage_rows), :],
            rstage_ref.at[pl.ds(slot * stage_rows, stage_rows), :],
            sems.at[slot],
        )

    # same cross-window/cross-block ping-pong prefetch as the general
    # decode kernel; bases are g-scaled statics instead of SMEM meta
    for wi in range(nwin):
        p = (wi & 1) if nwin % 2 == 0 else ((g * nwin + wi) & 1)
        base = g * block_rows + wi * win
        if wi == 0:
            @pl.when(g == 0)
            def _():
                read_into(0, base).start()

        if wi + 1 < nwin:
            nxt, cond = base + win, None
        else:
            nxt, cond = (g + 1) * block_rows, g + 1 < nb

        def _start(slot, rbase=nxt, cond=cond):
            if cond is None:
                read_into(slot, rbase).start()
            else:
                @pl.when(cond)
                def _():
                    read_into(slot, rbase).start()

        if isinstance(p, int):
            read_into(p, base).wait()
            _start(1 - p)
            base_row = p * stage_rows
        else:
            @pl.when(p == 0)
            def _(rbase=base):
                read_into(0, rbase).wait()

            @pl.when(p == 1)
            def _(rbase=base):
                read_into(1, rbase).wait()

            @pl.when(p == 0)
            def _():
                _start(1)

            @pl.when(p == 1)
            def _():
                _start(0)

            base_row = p * stage_rows

        for tr, cg, sources, min_src in windows[wi]:
            if min_src is None:  # all-pad chunk: trimmed by the caller
                img_ref[0, 8 * tr : 8 * tr + 8, 128 * cg : 128 * cg + 128] = (
                    jnp.zeros((8, LANES), jnp.uint32))
                continue
            perm = _u8_gather8(
                sources,
                lambda rr: rstage_ref[pl.ds(base_row + rr, 1), :],
                tab_ref,
            )
            gr, ti = min_src
            mn8 = jnp.take_along_axis(
                jnp.broadcast_to(mnw[gr : gr + 1, :], (8, LANES)),
                tab_ref[ti] & 127, axis=-1)
            img_ref[0, 8 * tr : 8 * tr + 8, 128 * cg : 128 * cg + 128] = (
                perm + mn8)


def decode_band_u8_kernel(mins3: jnp.ndarray, payload: jnp.ndarray,
                          width: int, wpp: int, w_real: int,
                          interpret: bool = False):
    """Uniform depth-8 decode: static stream->image permutation + byte-wise
    min add (module note).  ONLY correct when every real tile's depth is 8
    — _decode_fn_band gates on the real depth grid.  Input contract matches
    decode_band_kernel (depths are not needed: the layout is static)."""
    B, rows8, _ = mins3.shape
    tp = rows8 * LANES
    assert width % 1024 == 0
    bands, wp, groups_row, groups = _geometry(
        width, 8 * (tp // (width // 8)), BLOCK_GROUPS_CAP_DEC)
    hp = tp // wp
    nb = hp // bands
    block_rows, win, nwin, _, tab = _u8_decode_plan(bands, wp, wpp, w_real)
    stage_rows = win + 16
    kern = functools.partial(_decode_u8_kernel, bands, wp, wpp, w_real,
                             stage_rows)
    return pl.pallas_call(
        kern,
        grid=(B, nb),
        in_specs=[
            pl.BlockSpec((1, groups, LANES), lambda b, g: (b, g, 0),
                         memory_space=pltpu.VMEM),
            # the fused permutation table: constant across grid steps
            pl.BlockSpec(tab.shape, lambda b, g: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 8 * bands, 2 * wp), lambda b, g: (b, g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, hp * 8, 2 * wp), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((2 * stage_rows, LANES), jnp.uint32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(mins3, jnp.asarray(tab), payload)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def _decode_kernel(groups_row, bands, nent, chain_rows, gps, stage_rows,
                   ablate_stage, meta_ref,
                   depths_ref, mins_ref, payload_ref, img_ref, win_ref,
                   res_ref, rstage_ref, sems):
    """``chain_rows`` (trace-time) is the window-gather select-chain length:
    the number of staged payload rows a group's tile window may span (17 =
    full-depth worst case).  decode_band_kernel compiles one variant per
    DECODE_CHAIN_VARIANTS entry and lax.switches on the batch's actual
    maximum — rows past a group's real words never hold selected data, so a
    shorter chain is exact whenever every group fits it.

    ``gps``/``stage_rows`` (trace-time) size the window pipeline: each
    staged window covers ``gps`` lane-groups (``stage_rows = 16·gps + 16``
    payload rows, the full-depth span plus the last group's 17-row window
    overhang).  Fewer, larger windows amortize the serial DMA wait points
    (see DEC_GROUPS_PER_STAGE).

    ``ablate_stage`` (trace-time; None in production) truncates the kernel
    after stage N for per-stage cost profiling (tools/ablate_band.py): 0 =
    dma+meta, 1 = +window gathers, 2 = +unpack, None/3 = full.  Ablated
    variants write keep-alive garbage — only device time is meaningful."""
    assert not DECODE_GATHER_CLASSES or chain_rows == 17
    groups = bands * groups_row
    b = pl.program_id(0)
    g = pl.program_id(1)
    nb = pl.num_programs(1)
    mbase = (b * nb + g) * nent
    kmask = meta_ref[mbase]
    # per-BLOCK uniform-8 window fast path: kmask == 1<<8 means every tile
    # in the block (pads included — they would set bit 0) has depth 8, so
    # every group's stream is exactly 2048 words at offsets 16·tile and the
    # 17-row select chain collapses to a 2-gather alignment + a static
    # permutation (see gather_group).  A full uniform-8 group spans 17
    # staged rows, so the arm only exists at the full chain variant.
    u8blk = (kmask == jnp.int32(1 << 8)) if (
        DECODE_BLOCK_U8 and chain_rows == 17 and ablate_stage is None
    ) else None

    def _keep(v):
        """OR-reduce v to one row and tile it over the image block (keeps
        every input to v alive through the block output write)."""
        v1 = _or_fold_rows(v)
        row = jnp.concatenate([v1] * (2 * groups_row), axis=-1)
        img_ref[...] = jnp.broadcast_to(
            row, (8 * bands, 2 * groups_row * LANES)
        ).reshape(1, 8 * bands, -1)

    def read_into(slot, rbase):
        return pltpu.make_async_copy(
            payload_ref.at[b, pl.ds(rbase, stage_rows), :],
            rstage_ref.at[pl.ds(slot * stage_rows, stage_rows), :],
            sems.at[slot],
        )

    depth = depths_ref[0].astype(jnp.int32)
    mn = mins_ref[0].astype(jnp.int32)
    loff_all = _exclusive_lane_cumsum(2 * depth)

    def gather_group(s, row_base, base_row):
        """Window of group s's stream words from the staged rows into
        win_ref.  The select chain's row count is branched per group on SMEM
        scalars (DECODE_GATHER_CLASSES): rows touched = ceil((lane offset +
        word total)/128), so shallow groups run a short chain and empty
        groups (depth-0 pad tiles) skip the gathers entirely — their win
        slots keep scratch garbage, which the depth-select unpack never
        reads and the repack dmask zeroes.  The dynamic-offset staged-row
        *reads* stay outside the branches (probed hazard — see
        DECODE_GATHER_CLASSES).  Earlier, gating with *vector*-derived
        scalars measured 1.3-1.7x slower (the vector→scalar extraction, not
        the branch, was the cost); SMEM-scalar branches are cheap."""
        lc = meta_ref[mbase + 1 + s] - (row_base << 7)
        r0 = lc & (LANES - 1)
        lg0 = lc >> 7
        loff_b = jnp.broadcast_to(loff_all[s : s + 1, :], (16, LANES))
        phys = loff_b + _rows((16, LANES)) + r0
        src_row = phys >> 7
        src_lane = phys & (LANES - 1)
        rows17 = [
            rstage_ref[pl.ds(base_row + lg0 + rr, 1), :]
            for rr in range(chain_rows)
        ]

        def chain(R):
            win = jnp.zeros((16, LANES), jnp.uint32)
            for rr in range(R):
                row = jnp.broadcast_to(rows17[rr], (16, LANES))
                cand = jnp.take_along_axis(row, src_lane, axis=-1)
                win = jnp.where(src_row == rr, cand, win)
            win_ref[:, s, :] = win

        if u8blk is not None:
            # branch on the per-BLOCK SMEM-scalar condition only; the
            # dynamic-offset staged-row reads (rows17) stay hoisted above —
            # pl.ds-on-SMEM-scalar reads inside a branch hung the chip in
            # the DECODE_GATHER_CLASSES experiment.
            @pl.when(u8blk)
            def _():
                # stream word w of the group (w = 16·tile + j) sits at
                # staged[lg0 + (r0+w)>>7][(r0+w)&127]; align first (2
                # gathers: lane roll by r0 with a row carry), then the
                # window win[j, t] = aligned[(16t+j)>>7][(16t+j)&127] is a
                # STATIC permutation.  The direct form — reshape (16,8,16)
                # + transpose(2,0,1) — does NOT lower ("infer-vector-layout:
                # unsupported shape cast", tools/probe_transpose_when.py
                # stage 1); this lane-preserving variant does (stage 3):
                # concat_b(aligned[:,16b:+16]^T) lands the value at
                # [j, 16b+o], and one static lane gather 16(l&7)+(l>>3)
                # finishes win[j, 8o+b] = aligned[o, 16b+j].
                lanes16 = _lanes((16, LANES))
                lidx = (r0 + lanes16) & (LANES - 1)
                A = jnp.concatenate(rows17[0:16], axis=0)
                Bn = jnp.concatenate(rows17[1:17], axis=0)
                v0 = jnp.take_along_axis(A, lidx, axis=-1)
                v1 = jnp.take_along_axis(Bn, lidx, axis=-1)
                aligned = jnp.where(lanes16 < LANES - r0, v0, v1)
                xt = jnp.concatenate(
                    [aligned[:, 16 * b : 16 * b + 16].T for b in range(8)],
                    axis=1)
                win_ref[:, s, :] = jnp.take_along_axis(
                    xt, 16 * (lanes16 & 7) + (lanes16 >> 3), axis=-1)

            @pl.when(jnp.logical_not(u8blk))
            def _():
                chain(chain_rows)
            return
        if not DECODE_GATHER_CLASSES:
            chain(chain_rows)
            return
        total_s = meta_ref[mbase + 2 + s] - meta_ref[mbase + 1 + s]
        need = (r0 + total_s + (LANES - 1)) >> 7
        prev = 0
        for R in DECODE_GATHER_CLASSES:
            @pl.when((need > prev) & (need <= R))
            def _(R=R):
                chain(R)
            prev = R

    # Chunked window pipeline with cross-chunk ping-pong prefetch: the
    # block's stream is consumed in GROUPS_PER_STAGE-group windows that
    # alternate staging slots, and each chunk starts the *next* window's
    # read — crossing into the next grid block at the seam — before
    # gathering its own, so window-DMA latency hides behind gather work for
    # narrow and wide grids alike.  Slots must alternate: a single-slot
    # version raced on real TPUs (the next chunk's DMA overwrote rows the
    # previous chunk's gathers were still reading — a WAR hazard Mosaic
    # does not order; interpreter mode and isolated runs passed, compiled
    # jit pipelines corrupted ~64% of pixels at W=3072).  Parity is the
    # global chunk index (g·nch + ci) & 1 — static per chunk when nch is
    # even (branch-free), traced when odd (nch == 1 reduces to the original
    # per-block ping-pong, p = g & 1).
    nch = -(-groups // gps)
    bases = [meta_ref[mbase + 1 + ci * gps] >> 7 for ci in range(nch)]
    # next block's first window base, clamped to the last block for
    # g == nb-1 (the prefetch is dropped by pl.when, but the index must be
    # in bounds when traced)
    last = (b * nb + nb - 1) * nent
    nxt0 = meta_ref[jnp.minimum(mbase + nent, last) + 1] >> 7

    for ci in range(nch):
        p = (ci & 1) if nch % 2 == 0 else ((g * nch + ci) & 1)
        if ci == 0:
            @pl.when(g == 0)
            def _():
                read_into(0, bases[0]).start()

        if ci + 1 < nch:
            nxt, cond = bases[ci + 1], None
        else:
            nxt, cond = nxt0, g + 1 < nb

        def _start(slot, rbase=nxt, cond=cond):
            if cond is None:
                read_into(slot, rbase).start()
            else:
                @pl.when(cond)
                def _():
                    read_into(slot, rbase).start()

        if isinstance(p, int):
            read_into(p, bases[ci]).wait()
            _start(1 - p)
        else:
            @pl.when(p == 0)
            def _(rbase=bases[ci]):
                read_into(0, rbase).wait()

            @pl.when(p == 1)
            def _(rbase=bases[ci]):
                read_into(1, rbase).wait()

            @pl.when(p == 0)
            def _():
                _start(1)

            @pl.when(p == 1)
            def _():
                _start(0)

        if ablate_stage == 0:
            continue  # DMA pipeline only; skip the gathers
        for s in range(ci * gps, min((ci + 1) * gps, groups)):
            gather_group(s, bases[ci], p * stage_rows)

    if ablate_stage == 0:
        _keep(rstage_ref[0:1, :] | rstage_ref[stage_rows : stage_rows + 1, :])
        return
    if ablate_stage == 1:
        _keep(win_ref[0] | win_ref[15])
        return

    # res planes are *not* zero-initialized: lanes no unpack pass writes
    # (depth 0, or depths absent from the block) carry scratch garbage that
    # the dmask AND at repack time zeroes out
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

    if ablate_stage == 2:
        _keep(res_ref[0] | res_ref[63])
        return

    # ---- re-pack pixels into tiles_W words, then inverse transpose ----
    # the unpack above defers truncation: one variable-shift mask per lane
    # (applied in the single repack read of each plane) replaces a static AND
    # per (depth, pixel) — 64 ANDs instead of up to 512
    dmask = (jnp.uint32(1) << depth.astype(jnp.uint32)) - jnp.uint32(1)
    mn_u = mn.astype(jnp.uint32)
    out_rows = []  # [ww] → (groups, 128)
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
        e8 = jnp.concatenate(
            [out_rows[2 * r][grp : grp + 1, :] for r in range(8)], axis=0
        )
        o8 = jnp.concatenate(
            [out_rows[2 * r + 1][grp : grp + 1, :] for r in range(8)], axis=0
        )
        iv[(grp, 0)] = _interleave_half8(e8, o8, 0)
        iv[(grp, 1)] = _interleave_half8(e8, o8, 1)
    img_rows = []
    for img_r in range(8 * bands):
        tr, r = img_r >> 3, img_r & 7
        pieces = []
        for gc in range(groups_row):
            grp = tr * groups_row + gc
            pieces.append(iv[(grp, 0)][r : r + 1, :])
            pieces.append(iv[(grp, 1)][r : r + 1, :])
        img_rows.append(jnp.concatenate(pieces, axis=-1))  # (1, 2*wp)
    img_ref[...] = jnp.concatenate(img_rows, axis=0).reshape(1, 8 * bands, -1)


def decode_band_kernel(depths: jnp.ndarray, mins: jnp.ndarray, payload: jnp.ndarray,
                       width: int, interpret: bool = False,
                       ablate_stage: int | None = None,
                       chain: int | None = None):
    """(depths (B,Tp//128,128) u8, mins, payload (B,R,128) u32) →
    img32 (B, Hp, W//4) u32.

    Compiled in DECODE_CHAIN_VARIANTS gather-chain variants, selected per
    batch by lax.switch on the deepest group's staged-row span (see
    _decode_kernel); pass ``chain`` to force one variant.  Interpreter mode
    compiles only the worst case (dedicated tests pin variant parity)."""
    B, rows8, _ = depths.shape
    tp = rows8 * LANES
    assert width % 1024 == 0
    bands, wp, groups_row, groups = _geometry(
        width, 8 * (tp // (width // 8)), BLOCK_GROUPS_CAP_DEC)
    hp = tp // wp  # padded tile rows
    assert hp % bands == 0
    nb = hp // bands
    nent = groups + 2
    meta = stream_meta(depths, width, BLOCK_GROUPS_CAP_DEC)
    if chain is None and not interpret and ablate_stage is None:
        gstart, gtot = _group_totals(depths, width)
        need = jnp.max(-((gstart % LANES + gtot) // -LANES))  # ceil rows
        return jax.lax.switch(
            _variant_index(need, DECODE_CHAIN_VARIANTS),
            [
                functools.partial(_decode_call, c, width, interpret,
                                  ablate_stage)
                for c in DECODE_CHAIN_VARIANTS
            ],
            meta, depths, mins, payload,
        )
    return _decode_call(chain or 17, width, interpret, ablate_stage,
                        meta, depths, mins, payload)


def _decode_call(chain_rows, width, interpret, ablate_stage,
                 meta, depths, mins, payload):
    B, rows8, _ = depths.shape
    tp = rows8 * LANES
    bands, wp, groups_row, groups = _geometry(
        width, 8 * (tp // (width // 8)), BLOCK_GROUPS_CAP_DEC)
    hp = tp // wp
    nb = hp // bands
    nent = groups + 2
    gps = min(DEC_GROUPS_PER_STAGE, groups)
    stage_rows = dec_stage_rows(gps)
    kern = functools.partial(_decode_kernel, groups_row, bands, nent,
                             chain_rows, gps, stage_rows, ablate_stage)
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
                pltpu.VMEM((2 * stage_rows, LANES), jnp.uint32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, hp * 8, 2 * wp), jnp.uint32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(meta, depths, mins, payload)
