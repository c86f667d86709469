#!/usr/bin/env python
"""Probe cheaper compaction formulations (real TPU, separate process).

V0: production (search IW=4, per-group candidates+interleave)  [baseline]
V1: two groups packed per vreg op: ploff/los/candidate sources hold group a
    in rows 0-7 and group b in rows 8-15 -> halves op count, same rows.
V2: V1 + merged lo/hi candidate gather (one (32,128) gather per m).
V3: production but interleave uses pltpu.repeat instead of jnp.repeat.
"""
import sys
sys.path.insert(0, ".")
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dbde_tpu.ops.kernel_common import (
    LANES, _exclusive_lane_cumsum, _lanes, _rows)
from dbde_tpu.utils.profiling import measure_device_seconds

G = 64
STEPS = 512
IW = 4


def compact_v0(words_ref, ploff_all, s0, n, use_pltpu_repeat=False):
    pq = _rows((8, LANES)) * LANES + _lanes((8, LANES))
    l2 = _lanes((16, LANES))
    idx = jnp.where((_rows((16, LANES)) & 1) == 1, 64 + (l2 >> 1), l2 >> 1)
    segs = []
    ploffs = [jnp.broadcast_to(ploff_all[s:s+1, :], (8, LANES))
              for s in range(s0, s0 + n)]
    los = [jnp.zeros((8, LANES), jnp.int32) for _ in range(n)]
    step = LANES // 2
    while step >= 1:
        for i in range(n):
            cand = jnp.minimum(los[i] + step, LANES - 1)
            v = jnp.take_along_axis(ploffs[i], cand, axis=-1)
            los[i] = jnp.where(v <= pq, cand, los[i])
        step //= 2
    for i in range(n):
        s = s0 + i
        wm = jnp.minimum(pq - jnp.take_along_axis(ploffs[i], los[i], axis=-1), 7)
        lo_v = jnp.zeros((8, LANES), jnp.uint32)
        hi_v = jnp.zeros((8, LANES), jnp.uint32)
        for m in range(8):
            sel = wm == m
            srcl = jnp.broadcast_to(words_ref[2*m][s:s+1, :], (8, LANES))
            srch = jnp.broadcast_to(words_ref[2*m+1][s:s+1, :], (8, LANES))
            lo_v = jnp.where(sel, jnp.take_along_axis(srcl, los[i], axis=-1), lo_v)
            hi_v = jnp.where(sel, jnp.take_along_axis(srch, los[i], axis=-1), hi_v)
        rep = (functools.partial(pltpu.repeat, repeats=2, axis=0)
               if use_pltpu_repeat else
               functools.partial(jnp.repeat, repeats=2, axis=0))
        lo2 = rep(lo_v)
        hi2 = rep(hi_v)
        vlo = jnp.take_along_axis(lo2, idx, axis=-1)
        vhi = jnp.take_along_axis(hi2, idx, axis=-1)
        segs.append(jnp.where((l2 & 1) == 1, vhi, vlo))
    return segs


def compact_packed2(words_ref, ploff_all, s0, n, merged=False):
    """Two groups per (16,128) op: rows 0-7 group a, rows 8-15 group b."""
    assert n % 2 == 0
    pq16 = (_rows((16, LANES)) & 7) * LANES + _lanes((16, LANES))
    l2 = _lanes((32, LANES))
    idx = jnp.where((_rows((32, LANES)) & 1) == 1, 64 + (l2 >> 1), l2 >> 1)
    segs = []
    pairs = [(s0 + 2*j, s0 + 2*j + 1) for j in range(n // 2)]
    ploffs = [jnp.concatenate([
        jnp.broadcast_to(ploff_all[a:a+1, :], (8, LANES)),
        jnp.broadcast_to(ploff_all[b:b+1, :], (8, LANES))], axis=0)
        for a, b in pairs]
    los = [jnp.zeros((16, LANES), jnp.int32) for _ in pairs]
    step = LANES // 2
    while step >= 1:
        for i in range(len(pairs)):
            cand = jnp.minimum(los[i] + step, LANES - 1)
            v = jnp.take_along_axis(ploffs[i], cand, axis=-1)
            los[i] = jnp.where(v <= pq16, cand, los[i])
        step //= 2
    for i, (a, b) in enumerate(pairs):
        wm = jnp.minimum(pq16 - jnp.take_along_axis(ploffs[i], los[i], axis=-1), 7)
        if merged:
            seg32 = jnp.zeros((32, LANES), jnp.uint32)
            idx32 = jnp.concatenate([los[i], los[i]], axis=0)
            wm32 = jnp.concatenate([wm, wm], axis=0)
            for m in range(8):
                src = jnp.concatenate([
                    jnp.broadcast_to(words_ref[2*m][a:a+1, :], (8, LANES)),
                    jnp.broadcast_to(words_ref[2*m][b:b+1, :], (8, LANES)),
                    jnp.broadcast_to(words_ref[2*m+1][a:a+1, :], (8, LANES)),
                    jnp.broadcast_to(words_ref[2*m+1][b:b+1, :], (8, LANES))], axis=0)
                seg32 = jnp.where(wm32 == m,
                                  jnp.take_along_axis(src, idx32, axis=-1), seg32)
            lo_v, hi_v = seg32[:16], seg32[16:]
        else:
            lo_v = jnp.zeros((16, LANES), jnp.uint32)
            hi_v = jnp.zeros((16, LANES), jnp.uint32)
            for m in range(8):
                sel = wm == m
                srcl = jnp.concatenate([
                    jnp.broadcast_to(words_ref[2*m][a:a+1, :], (8, LANES)),
                    jnp.broadcast_to(words_ref[2*m][b:b+1, :], (8, LANES))], axis=0)
                srch = jnp.concatenate([
                    jnp.broadcast_to(words_ref[2*m+1][a:a+1, :], (8, LANES)),
                    jnp.broadcast_to(words_ref[2*m+1][b:b+1, :], (8, LANES))], axis=0)
                lo_v = jnp.where(sel, jnp.take_along_axis(srcl, los[i], axis=-1), lo_v)
                hi_v = jnp.where(sel, jnp.take_along_axis(srch, los[i], axis=-1), hi_v)
        lo2 = jnp.repeat(lo_v, 2, axis=0)   # (32,128)
        hi2 = jnp.repeat(hi_v, 2, axis=0)
        vlo = jnp.take_along_axis(lo2, idx, axis=-1)
        vhi = jnp.take_along_axis(hi2, idx, axis=-1)
        both = jnp.where((l2 & 1) == 1, vhi, vlo)   # rows 0-15 grp a, 16-31 grp b
        segs.append(both[:16])
        segs.append(both[16:])
    return segs


def kern(variant, words_ref, depth_ref, out_ref):
    depth = depth_ref[...].astype(jnp.int32)
    ploff_all = _exclusive_lane_cumsum(depth)
    acc = jnp.zeros((16, LANES), jnp.uint32)
    for s0 in range(0, G, IW):
        if variant == 0:
            segs = compact_v0(words_ref, ploff_all, s0, IW)
        elif variant == 1:
            segs = compact_packed2(words_ref, ploff_all, s0, IW)
        elif variant == 2:
            segs = compact_packed2(words_ref, ploff_all, s0, IW, merged=True)
        else:
            segs = compact_v0(words_ref, ploff_all, s0, IW, use_pltpu_repeat=True)
        for sg in segs:
            acc = acc | sg
    out_ref[...] = acc


def run(variant):
    f = pl.pallas_call(
        functools.partial(kern, variant),
        grid=(STEPS,),
        in_specs=[pl.BlockSpec((16, G, LANES), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((G, LANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((16, LANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, LANES), jnp.uint32),
    )
    rng = np.random.default_rng(0)
    words = jnp.asarray(rng.integers(0, 2**32, size=(16, G, LANES), dtype=np.uint64).astype(np.uint32))
    depth = jnp.asarray(rng.integers(0, 9, size=(G, LANES), dtype=np.int64).astype(np.int32))
    fn = jax.jit(f)
    out = fn(words, depth)
    t = measure_device_seconds(fn, words, depth, reps=4)
    return t, t / (G * STEPS) * 1e9, np.asarray(out)


names = ["V0 production", "V1 packed2", "V2 packed2+merged", "V3 pltpu.repeat"]
ref = None
for v in range(4):
    t, per, out = run(v)
    if ref is None:
        ref = out
    ok = "parity-ok" if np.array_equal(out, ref) else "PARITY-FAIL"
    print(f"{names[v]:20s} total {t*1e3:7.3f} ms  {per:6.1f} ns/group  {ok}")

# V4: interleave on the MXU — static permutation matmuls over 16-bit halves
import numpy as _np

def _zip_mats():
    """In-kernel static permutation matrices (iota compares, hoisted)."""
    j = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    l = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    even = (l & 1) == 0
    Z0lo = (even & (j == (l >> 1))).astype(jnp.float32)
    Z0hi = (~even & (j == (l >> 1))).astype(jnp.float32)
    Z1lo = (even & (j == 64 + (l >> 1))).astype(jnp.float32)
    Z1hi = (~even & (j == 64 + (l >> 1))).astype(jnp.float32)
    r = jax.lax.broadcasted_iota(jnp.int32, (16, 16), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (16, 16), 1)
    Z = ((c == (r >> 1) + 8 * (r & 1))).astype(jnp.float32)
    return Z0lo, Z0hi, Z1lo, Z1hi, Z


def _mxu_zip(zm, lo_v, hi_v):
    """(8,128) pair lo/hi -> (16,128) word segment via 10 small matmuls."""
    _Z0LO, _Z0HI, _Z1LO, _Z1HI, _ZROW = zm

    def halves(x):
        xi = x.astype(jnp.uint32)
        return ((xi & jnp.uint32(0xFFFF)).astype(jnp.int32).astype(jnp.float32),
                (xi >> 16).astype(jnp.int32).astype(jnp.float32))
    out_halves = []
    for lo_h, hi_h in zip(halves(lo_v), halves(hi_v)):
        E = (jnp.dot(lo_h, _Z0LO, preferred_element_type=jnp.float32)
             + jnp.dot(hi_h, _Z0HI, preferred_element_type=jnp.float32))
        O = (jnp.dot(lo_h, _Z1LO, preferred_element_type=jnp.float32)
             + jnp.dot(hi_h, _Z1HI, preferred_element_type=jnp.float32))
        C = jnp.concatenate([E, O], axis=0)
        out_halves.append(jnp.dot(_ZROW, C, preferred_element_type=jnp.float32))
    lo16, hi16 = out_halves
    return (lo16.astype(jnp.int32).astype(jnp.uint32)
            | (hi16.astype(jnp.int32).astype(jnp.uint32) << 16))


def compact_v4(zm, words_ref, ploff_all, s0, n):
    pq = _rows((8, LANES)) * LANES + _lanes((8, LANES))
    segs = []
    ploffs = [jnp.broadcast_to(ploff_all[s:s+1, :], (8, LANES))
              for s in range(s0, s0 + n)]
    los = [jnp.zeros((8, LANES), jnp.int32) for _ in range(n)]
    step = LANES // 2
    while step >= 1:
        for i in range(n):
            cand = jnp.minimum(los[i] + step, LANES - 1)
            v = jnp.take_along_axis(ploffs[i], cand, axis=-1)
            los[i] = jnp.where(v <= pq, cand, los[i])
        step //= 2
    for i in range(n):
        s = s0 + i
        wm = jnp.minimum(pq - jnp.take_along_axis(ploffs[i], los[i], axis=-1), 7)
        lo_v = jnp.zeros((8, LANES), jnp.uint32)
        hi_v = jnp.zeros((8, LANES), jnp.uint32)
        for m in range(8):
            sel = wm == m
            srcl = jnp.broadcast_to(words_ref[2*m][s:s+1, :], (8, LANES))
            srch = jnp.broadcast_to(words_ref[2*m+1][s:s+1, :], (8, LANES))
            lo_v = jnp.where(sel, jnp.take_along_axis(srcl, los[i], axis=-1), lo_v)
            hi_v = jnp.where(sel, jnp.take_along_axis(srch, los[i], axis=-1), hi_v)
        segs.append(_mxu_zip(zm, lo_v, hi_v))
    return segs


def kern4(words_ref, depth_ref, out_ref):
    depth = depth_ref[...].astype(jnp.int32)
    ploff_all = _exclusive_lane_cumsum(depth)
    zm = _zip_mats()
    acc = jnp.zeros((16, LANES), jnp.uint32)
    for s0 in range(0, G, IW):
        for sg in compact_v4(zm, words_ref, ploff_all, s0, IW):
            acc = acc | sg
    out_ref[...] = acc


def run4():
    f = pl.pallas_call(
        kern4,
        grid=(STEPS,),
        in_specs=[pl.BlockSpec((16, G, LANES), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((G, LANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((16, LANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, LANES), jnp.uint32),
    )
    rng = np.random.default_rng(0)
    words = jnp.asarray(rng.integers(0, 2**32, size=(16, G, LANES), dtype=np.uint64).astype(np.uint32))
    depth = jnp.asarray(rng.integers(0, 9, size=(G, LANES), dtype=np.int64).astype(np.int32))
    fn = jax.jit(f)
    out = fn(words, depth)
    t = measure_device_seconds(fn, words, depth, reps=4)
    return t, t / (G * STEPS) * 1e9, np.asarray(out)

if __name__ == "__main__":
    t, per, out = run4()
    _, _, ref0 = run(0)
    ok = "parity-ok" if np.array_equal(out, ref0) else "PARITY-FAIL"
    print(f"{'V4 mxu-zip':20s} total {t*1e3:7.3f} ms  {per:6.1f} ns/group  {ok}")
