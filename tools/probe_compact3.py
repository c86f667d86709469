#!/usr/bin/env python
"""Probe search micro-variants: wm-fold and splat-ladder first steps."""
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


def compact(variant, words_ref, ploff_all, s0, n):
    pq = _rows((8, LANES)) * LANES + _lanes((8, LANES))
    l2 = _lanes((16, LANES))
    idx = jnp.where((_rows((16, LANES)) & 1) == 1, 64 + (l2 >> 1), l2 >> 1)
    segs = []
    ploffs = [jnp.broadcast_to(ploff_all[s:s+1, :], (8, LANES))
              for s in range(s0, s0 + n)]
    los = [jnp.zeros((8, LANES), jnp.int32) for _ in range(n)]
    vals = [jnp.zeros((8, LANES), jnp.int32) for _ in range(n)]
    first_steps = 2 if variant >= 2 else 0
    step = LANES // 2
    nstep = 0
    while step >= 1:
        for i in range(n):
            if nstep < first_steps:
                # splat ladder: candidate index set is tiny and static
                cands = [c for c in range(step, LANES, step)
                         if (c // step) % 2 == 1]
                # lo is a sum of chosen previous steps; cand = lo + step
                v = None
                cnd = los[i] + step
                for c in cands:
                    sp = jnp.broadcast_to(jnp.broadcast_to(
                        ploff_all[s0 + i : s0 + i + 1, c : c + 1],
                        (1, LANES)), (8, LANES))
                    v = sp if v is None else jnp.where(cnd == c, sp, v)
                ok = v <= pq
                los[i] = jnp.where(ok, cnd, los[i])
                vals[i] = jnp.where(ok, v, vals[i])
            else:
                cand = jnp.minimum(los[i] + step, LANES - 1)
                v = jnp.take_along_axis(ploffs[i], cand, axis=-1)
                ok = v <= pq
                los[i] = jnp.where(ok, cand, los[i])
                if variant >= 1:
                    vals[i] = jnp.where(ok, v, vals[i])
        step //= 2
        nstep += 1
    for i in range(n):
        s = s0 + i
        if variant >= 1:
            wm = jnp.minimum(pq - vals[i], 7)
        else:
            wm = jnp.minimum(pq - jnp.take_along_axis(ploffs[i], los[i], axis=-1), 7)
        lo_v = jnp.zeros((8, LANES), jnp.uint32)
        hi_v = jnp.zeros((8, LANES), jnp.uint32)
        for m in range(8):
            sel = wm == m
            srcl = jnp.broadcast_to(words_ref[2*m][s:s+1, :], (8, LANES))
            srch = jnp.broadcast_to(words_ref[2*m+1][s:s+1, :], (8, LANES))
            lo_v = jnp.where(sel, jnp.take_along_axis(srcl, los[i], axis=-1), lo_v)
            hi_v = jnp.where(sel, jnp.take_along_axis(srch, los[i], axis=-1), hi_v)
        lo2 = jnp.repeat(lo_v, 2, axis=0)
        hi2 = jnp.repeat(hi_v, 2, axis=0)
        vlo = jnp.take_along_axis(lo2, idx, axis=-1)
        vhi = jnp.take_along_axis(hi2, idx, axis=-1)
        segs.append(jnp.where((l2 & 1) == 1, vhi, vlo))
    return segs


def kern(variant, words_ref, depth_ref, out_ref):
    depth = depth_ref[...].astype(jnp.int32)
    ploff_all = _exclusive_lane_cumsum(depth)
    acc = jnp.zeros((16, LANES), jnp.uint32)
    for s0 in range(0, G, IW):
        for sg in compact(variant, words_ref, ploff_all, s0, IW):
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


names = ["V0 baseline", "V1 wm-fold", "V2 wm-fold+splat2"]
ref = None
for v in range(3):
    t, per, out = run(v)
    if ref is None:
        ref = out
    ok = "parity-ok" if np.array_equal(out, ref) else "PARITY-FAIL"
    print(f"{names[v]:20s} total {t*1e3:7.3f} ms  {per:6.1f} ns/group  {ok}")
