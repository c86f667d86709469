"""Shared in-kernel primitives for the Pallas DBDE codecs.

These are the vector-unit building blocks common to the tile-layout kernels
(pallas_kernels*.py) and the image-layout band kernels (pallas_band.py):
lane-wise prefix sums, the vectorized binary search that replaces the
reference's serial payload cursor (dbde_util.cpp:150-158), the closed-form
bit-pack contributions (dbde_util.cpp:82-100 equivalence), per-group payload
compaction, and the roll-based stream splice.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl  # noqa: F401 (kept for kernel authors)
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _lanes(shape) -> jnp.ndarray:
    return jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)


def _rows(shape) -> jnp.ndarray:
    return jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 2)


def _exclusive_lane_cumsum(x: jnp.ndarray) -> jnp.ndarray:
    """Exclusive prefix-sum along the last (lane) axis via log-step rolls."""
    acc = x
    d = 1
    while d < x.shape[-1]:
        r = jnp.where(_lanes(x.shape) >= d, pltpu.roll(acc, d, len(x.shape) - 1), 0)
        acc = acc + r
        d *= 2
    return acc - x


def _rightmost_le(sorted_b: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Rightmost index t (per lane-row) with sorted_b[..., t] <= q.

    ``sorted_b`` rows are identical sorted (128,) arrays broadcast to q's
    shape; classic binary ascent, all lane gathers within one 128-lane group
    (the TPU's vector-gather limit).
    """
    lo = jnp.zeros_like(q)
    step = LANES // 2
    while step >= 1:
        cand = jnp.minimum(lo + step, LANES - 1)
        v = jnp.take_along_axis(sorted_b, cand, axis=-1)
        lo = jnp.where(v <= q, cand, lo)
        step //= 2
    return lo


def _pack_contributions(res_rows, k: int, j: int):
    """OR of statically-shifted pixel lanes forming u32 word j at depth k.

    Pixel i occupies payload bits [i*k, i*k+k); rel = i*k - 32*j.  u32 shift
    wraparound performs straddle truncation exactly — the closed form of the
    reference's scalar 4k-bit flush loop (dbde_util.cpp:82-100).
    """
    acc = None
    for i in range(64):
        rel = i * k - 32 * j
        if rel <= -k or rel >= 32:
            continue
        contrib = (res_rows[i] << rel) if rel >= 0 else (res_rows[i] >> (-rel))
        acc = contrib if acc is None else (acc | contrib)
    return acc


def _mask_past_total(seg, total):
    """Zero seg word slots at or past the group's word ``total``.

    Slots past a group's stream gather garbage, NOT always zeros: the
    binary search clamps them to the group's last tile with ``wm`` capped
    at 7, so when that tile has depth 8 (planes 14/15 written) they pick
    up its last pair — real data the roll-splice would OR over the NEXT
    group's stream.  (A depth-8 tile in lane 127 of a non-full group is
    all it takes; the round-2 "gathers from zeroed planes, harmless"
    assumption only holds for last-tile depth < 8.)  ``total`` may be a
    traced scalar (SMEM meta entry or vector-reduce extract).
    """
    R = seg.shape[0]
    wq = _rows((R, LANES)) * LANES + _lanes((R, LANES))
    return jnp.where(wq < total, seg, jnp.uint32(0))


def _compact_group_pairs(words_ref, depth, s, ploff, total, pair_rows: int = 8,
                         mplanes: int = 8):
    """Pair-space compaction of group s → (seg (2·pair_rows,128) u32, total).

    Every tile's payload piece starts at an even word offset (offsets are a
    cumsum of ``2*depth``) and has even length, so u32 (lo, hi) pairs are
    atomic: the binary search and candidate selection run at *pair*
    resolution — (pair_rows,128) shapes, 8 pair-candidates — which halves
    the gather traffic of :func:`_compact_group` (gathers here are
    element-cost bound, measured +12%% whole-encode on v5e).  A
    static-index interleave returns to word space.

    ``pair_rows`` bounds the group's stream at ``256·pair_rows`` u32 words
    (8 = the full-depth worst case); callers may shrink it when the group's
    actual word total is known (see ``pallas_band.ENCODE_COMPACT_CLASSES``).

    ``ploff`` is the exclusive lane-cumsum of ``depth`` (pair offsets).
    ``total`` (the group's u32-word count, traced scalar) gates the
    past-stream mask (:func:`_mask_past_total`); None skips it (ONLY safe
    when the caller never splices the tail, e.g. ablation keep-alives).

    ``mplanes`` (trace-time) bounds the candidate pair planes scanned: with
    every tile depth ≤ mplanes, planes ≥ mplanes are never selected (wm <
    depth) and skipping them removes their gathers — the candidate stage is
    the compaction's dominant gather-row cost.  Callers must guarantee the
    depth bound (see pallas_band's batch-max dispatch).  Past-total slots
    clamp wm to 7, which under mplanes < 8 selects nothing → zeros, i.e.
    the :func:`_mask_past_total` invariant holds by construction there too.
    """
    PR = pair_rows
    ploff_b = jnp.broadcast_to(ploff, (PR, LANES))
    pq = _rows((PR, LANES)) * LANES + _lanes((PR, LANES))
    tile_of = _rightmost_le(ploff_b, pq)
    wm = jnp.minimum(pq - jnp.take_along_axis(ploff_b, tile_of, axis=-1), 7)
    lo = jnp.zeros((PR, LANES), jnp.uint32)
    hi = jnp.zeros((PR, LANES), jnp.uint32)
    for m in range(mplanes):
        sel = wm == m
        srcl = jnp.broadcast_to(words_ref[2 * m][s : s + 1, :], (PR, LANES))
        srch = jnp.broadcast_to(words_ref[2 * m + 1][s : s + 1, :], (PR, LANES))
        lo = jnp.where(sel, jnp.take_along_axis(srcl, tile_of, axis=-1), lo)
        hi = jnp.where(sel, jnp.take_along_axis(srch, tile_of, axis=-1), hi)
    # word q = 2p + (lane&1) lives at pair (row q>>8, lane 64*(row&1) + l>>1)
    lo2 = jnp.repeat(lo, 2, axis=0)
    hi2 = jnp.repeat(hi, 2, axis=0)
    l2 = _lanes((2 * PR, LANES))
    idx = jnp.where((_rows((2 * PR, LANES)) & 1) == 1, 64 + (l2 >> 1), l2 >> 1)
    vlo = jnp.take_along_axis(lo2, idx, axis=-1)
    vhi = jnp.take_along_axis(hi2, idx, axis=-1)
    seg = jnp.where((l2 & 1) == 1, vhi, vlo)
    if total is not None:
        seg = _mask_past_total(seg, total)
    return seg, total


def _compact_chunk_pairs(words_ref, c0: int, n: int, ploff_all, pair_rows: int = 8,
                         totals=None, mplanes: int = 8):
    """Pair-space compaction of ``n`` consecutive groups [c0, c0+n) in ONE
    batch of (pair_rows·n, 128)-shaped ops → (2·pair_rows·n, 128) u32 word
    segments, group-major.

    Same math as :func:`_compact_group_pairs`, but the binary search — a
    chain of 7 *dependent* lane gathers — runs once on (pair_rows·n, 128)
    instead of n times on (pair_rows, 128): per-group the chain is
    latency-bound (each step is a thin dependent gather), so batching
    amortizes the serial latency n-fold and cuts the op count of the
    select/interleave stages by the same factor.  Group rows are replicated
    with ``jnp.repeat`` (sublane broadcast), which keeps every gather inside
    one 128-lane group.

    ``pair_rows`` bounds every group's stream at ``256·pair_rows`` u32
    words (8 = full-depth worst case); whole-kernel variants pick smaller
    values from the batch's actual maximum (see pallas_band).

    ``ploff_all`` is the exclusive lane-cumsum of ``depth`` for ALL groups
    ((groups, 128) pair offsets); ``words_ref`` the 16 word planes.
    """
    PR = pair_rows
    R = PR * n
    ploff_b = jnp.repeat(ploff_all[c0 : c0 + n, :], PR, axis=0)  # (R, 128)
    rows = _rows((R, LANES))
    r_in = rows & (PR - 1) if PR & (PR - 1) == 0 else rows % PR
    pq = r_in * LANES + _lanes((R, LANES))
    tile_of = _rightmost_le(ploff_b, pq)
    wm = jnp.minimum(pq - jnp.take_along_axis(ploff_b, tile_of, axis=-1), 7)
    lo = jnp.zeros((R, LANES), jnp.uint32)
    hi = jnp.zeros((R, LANES), jnp.uint32)
    for m in range(mplanes):
        sel = wm == m
        srcl = jnp.repeat(words_ref[2 * m][c0 : c0 + n, :], PR, axis=0)
        srch = jnp.repeat(words_ref[2 * m + 1][c0 : c0 + n, :], PR, axis=0)
        lo = jnp.where(sel, jnp.take_along_axis(srcl, tile_of, axis=-1), lo)
        hi = jnp.where(sel, jnp.take_along_axis(srch, tile_of, axis=-1), hi)
    # word q = 2p + (lane&1) lives at pair (row q>>8, lane 64*(row&1) + l>>1);
    # jnp.repeat keeps group blocks contiguous (16 rows each), and row parity
    # is preserved because blocks are an even number of rows
    lo2 = jnp.repeat(lo, 2, axis=0)
    hi2 = jnp.repeat(hi, 2, axis=0)
    l2 = _lanes((2 * R, LANES))
    idx = jnp.where((_rows((2 * R, LANES)) & 1) == 1, 64 + (l2 >> 1), l2 >> 1)
    vlo = jnp.take_along_axis(lo2, idx, axis=-1)
    vhi = jnp.take_along_axis(hi2, idx, axis=-1)
    seg_all = jnp.where((l2 & 1) == 1, vhi, vlo)
    if totals is not None:
        rows2 = _rows((2 * R, LANES))
        wq_in = (rows2 % (2 * PR)) * LANES + l2
        tot_b = seg_all.astype(jnp.int32) * 0
        for i in range(n):
            grp_rows = (rows2 >= 2 * PR * i) & (rows2 < 2 * PR * (i + 1))
            tot_b = jnp.where(grp_rows, totals[i], tot_b)
        seg_all = jnp.where(wq_in < tot_b, seg_all, jnp.uint32(0))
    return seg_all


def _compact_chunk_interleaved(words_ref, c0: int, n: int, ploff_all,
                               pair_rows: int = 8, totals=None,
                               mplanes: int = 8):
    """Pair-space compaction of ``n`` consecutive groups [c0, c0+n) with the
    binary searches interleaved STEP-MAJOR → list of n (2·pair_rows, 128)
    u32 word segments.

    Same math and same per-group (pair_rows, 128) shapes as
    :func:`_compact_group_pairs` — no ``jnp.repeat`` of source rows (the
    round-2 batched variant's measured cost) — but the searches' 7-step
    *dependent* gather chains run round-robin across the chunk's groups, so
    each step's gather latency hides behind the other groups' steps instead
    of serializing (the chain, not gather element traffic, is what dominates
    the per-group formulation: encode compaction measured ~3x the cost of
    decode's independent-gather stage at a comparable op count).
    """
    PR = pair_rows
    pq = _rows((PR, LANES)) * LANES + _lanes((PR, LANES))
    l2 = _lanes((2 * PR, LANES))
    idx = jnp.where((_rows((2 * PR, LANES)) & 1) == 1, 64 + (l2 >> 1), l2 >> 1)
    segs = []
    for s0 in range(0, n, INTERLEAVE_WIDTH):
        ni = min(s0 + INTERLEAVE_WIDTH, n) - s0
        ploffs = [
            jnp.broadcast_to(ploff_all[c0 + s0 + i : c0 + s0 + i + 1, :], (PR, LANES))
            for i in range(ni)
        ]
        los = [jnp.zeros((PR, LANES), jnp.int32) for _ in range(ni)]
        step = LANES // 2
        while step >= 1:
            for i in range(ni):
                cand = jnp.minimum(los[i] + step, LANES - 1)
                v = jnp.take_along_axis(ploffs[i], cand, axis=-1)
                los[i] = jnp.where(v <= pq, cand, los[i])
            step //= 2
        # candidates + interleave per group: keeping all of them live
        # step-major spills vregs (measured 33.1 → 28.7 at width 8 with
        # everything interleaved)
        for i in range(ni):
            s = c0 + s0 + i
            wm = jnp.minimum(pq - jnp.take_along_axis(ploffs[i], los[i], axis=-1), 7)
            lo_v = jnp.zeros((PR, LANES), jnp.uint32)
            hi_v = jnp.zeros((PR, LANES), jnp.uint32)
            for m in range(mplanes):
                sel = wm == m
                srcl = jnp.broadcast_to(words_ref[2 * m][s : s + 1, :], (PR, LANES))
                srch = jnp.broadcast_to(words_ref[2 * m + 1][s : s + 1, :], (PR, LANES))
                lo_v = jnp.where(sel, jnp.take_along_axis(srcl, los[i], axis=-1), lo_v)
                hi_v = jnp.where(sel, jnp.take_along_axis(srch, los[i], axis=-1), hi_v)
            lo2 = jnp.repeat(lo_v, 2, axis=0)
            hi2 = jnp.repeat(hi_v, 2, axis=0)
            vlo = jnp.take_along_axis(lo2, idx, axis=-1)
            vhi = jnp.take_along_axis(hi2, idx, axis=-1)
            seg = jnp.where((l2 & 1) == 1, vhi, vlo)
            if totals is not None:
                seg = _mask_past_total(seg, totals[s - c0])
            segs.append(seg)
    return segs


def _compact_chunk_rowcentric(words_ref, c0: int, n: int, ploff_all,
                              totals=None, mplanes: int = 8):
    """Row-centric pair-space compaction of ``n`` consecutive groups
    [c0, c0+n) → list of n (16, 128) u32 word segments.

    The branchless grid split by depth class (the route
    ``pallas_band.ENCODE_COMPACT_CLASSES`` names): instead of shaping work
    (pair_rows, 128) per group — which pays the full-depth worst case PR=8
    regardless of content, and whose reduced non-pow2 variants lower worse
    than they save — every op here is (n, 128)-shaped with SUBLANES =
    GROUPS, and the slot loop runs over pair-row LEVELS.  A group's stream
    has at most ``mplanes`` pair rows (each of its 128 tiles emits ≤ mplanes
    pairs), so per-group work scales with the batch's depth bound:
    at mplanes=5 (camera content) the search/candidate/interleave stages
    process 5 levels instead of 8 pair rows, with every op a full vreg.

    Two structural savings over the group-major formulations:
      * sources are natural contiguous sublane slices
        (``ploff_all[c0:c0+n]``, ``words_ref[2m][c0:c0+n]``) — the
        per-group row broadcasts/repeats disappear;
      * the n groups' searches at one level run in ONE (n, 128) op, so the
        7-step dependent chain's latency amortizes n-fold without the
        step-major bookkeeping of :func:`_compact_chunk_interleaved`.

    ``totals`` (per-group SMEM word counts) gates the past-stream mask —
    same contract as :func:`_compact_group_pairs` (past-total slots clamp
    to the group's last tile and MUST be masked).  Segment rows ≥
    2·mplanes are zero-padded so callers splice (16, 128) segments
    unchanged.
    """
    ploff8 = ploff_all[c0 : c0 + n, :]  # (n, 128): row g = group c0+g
    lanes = _lanes((n, LANES))
    word_rows = []  # 2*mplanes arrays (n, 128): row g = group g's word row j
    for i in range(mplanes):
        q = lanes + 128 * i  # pair slots 128i..128i+127, all groups at once
        lo = jnp.zeros((n, LANES), jnp.int32)
        step = LANES // 2
        while step >= 1:
            cand = jnp.minimum(lo + step, LANES - 1)
            v = jnp.take_along_axis(ploff8, cand, axis=-1)
            lo = jnp.where(v <= q, cand, lo)
            step //= 2
        wm = jnp.minimum(q - jnp.take_along_axis(ploff8, lo, axis=-1), 7)
        lo_v = jnp.zeros((n, LANES), jnp.uint32)
        hi_v = jnp.zeros((n, LANES), jnp.uint32)
        for m in range(mplanes):
            sel = wm == m
            lo_v = jnp.where(
                sel,
                jnp.take_along_axis(words_ref[2 * m][c0 : c0 + n, :], lo, axis=-1),
                lo_v,
            )
            hi_v = jnp.where(
                sel,
                jnp.take_along_axis(words_ref[2 * m + 1][c0 : c0 + n, :], lo, axis=-1),
                hi_v,
            )
        # word rows 2i (lanes 0-63 of the pair level) and 2i+1 (lanes 64-127):
        # word q = 2p + (u&1) at lane u ← pair lane 64h + (u>>1)
        for h in (0, 1):
            idx = 64 * h + (lanes >> 1)
            word_rows.append(
                jnp.where(
                    (lanes & 1) == 1,
                    jnp.take_along_axis(hi_v, idx, axis=-1),
                    jnp.take_along_axis(lo_v, idx, axis=-1),
                )
            )
    segs = []
    if ROWCENTRIC_ASSEMBLY == "stack":
        stacked = jnp.stack(word_rows, axis=0)  # (2*mplanes, n, 128)
        for g in range(n):
            seg = stacked[:, g, :]
            if mplanes < 8:
                seg = jnp.concatenate(
                    [seg, jnp.zeros((16 - 2 * mplanes, LANES), jnp.uint32)], axis=0
                )
            if totals is not None:
                seg = _mask_past_total(seg, totals[g])
            segs.append(seg)
        return segs
    if ROWCENTRIC_ASSEMBLY == "wide":
        wide = jnp.concatenate(word_rows, axis=1)  # (n, 2*mplanes*128)
        for g in range(n):
            seg = wide[g : g + 1, :].reshape(2 * mplanes, LANES)
            if mplanes < 8:
                seg = jnp.concatenate(
                    [seg, jnp.zeros((16 - 2 * mplanes, LANES), jnp.uint32)], axis=0
                )
            if totals is not None:
                seg = _mask_past_total(seg, totals[g])
            segs.append(seg)
        return segs
    for g in range(n):
        parts = [word_rows[j][g : g + 1, :] for j in range(2 * mplanes)]
        if mplanes < 8:
            parts.append(jnp.zeros((16 - 2 * mplanes, LANES), jnp.uint32))
        seg = jnp.concatenate(parts, axis=0)
        if totals is not None:
            seg = _mask_past_total(seg, totals[g])
        segs.append(seg)
    return segs


ROWCENTRIC_ASSEMBLY = "concat"  # how _compact_chunk_rowcentric turns its
# (n, 128) word-row arrays into per-group (16, 128) segments for the splice:
# "concat" = 16 thin (1,128) slices concatenated per group; "stack" = one
# (16, n, 128) stack then a middle-axis slice per group; "wide" = one
# (n, 16*128) lane-concat then a (1, 2048)->(16, 128) relayout per group.
# A/B via tools/probe_rowcentric.py.


INTERLEAVE_WIDTH = 4  # groups whose binary searches run step-major together.
# Width 8 with everything interleaved spills vregs (33.1 -> 28.7 Gpix/s
# whole-encode); search-only widths 6/8 re-probed at mplanes=5 (half the
# candidate-stage register pressure) still lose slightly (0.851/0.852 vs
# 0.842 ms payload kernel, tools/probe_interleave.py) — 4 is the plateau.


def _compact_group(words_ref, depth, s, loff=None, total=None):
    """Compact group s's 128 tiles → (seg (16,128) u32 stream, total words).

    Exclusive lane-cumsum gives per-tile offsets (pass ``loff``/``total``
    precomputed for all groups at once to avoid per-group thin cumsums);
    a vectorized binary search maps each of the 2048 output word slots to
    its source tile; a 16-candidate gather/select materializes the segment.
    """
    counts = 2 * depth[s : s + 1, :]
    if loff is None:
        loff = _exclusive_lane_cumsum(counts)
    if total is None:
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


def _splice17(seg, carry, r0):
    """Align a 2048-word segment to lane offset r0 with a carry first row.

    Returns the (17,128) window to land at payload row ``cursor >> 7``:
    16 rolled rows plus the spill row of lanes that wrapped.
    """
    rolled = pltpu.roll(seg, r0, 1)
    prev = pltpu.roll(rolled, 1, 0)
    lanes16 = _lanes((16, LANES))
    out16 = jnp.where(lanes16 >= r0, rolled, prev)
    out16 = jnp.where(
        (_rows((16, LANES)) == 0) & (lanes16 < r0),
        jnp.broadcast_to(carry, (16, LANES)),
        out16,
    )
    spill = jnp.where(_lanes((1, LANES)) < r0, rolled[15:16, :], jnp.uint32(0))
    return jnp.concatenate([out16, spill], axis=0)
