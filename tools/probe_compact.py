#!/usr/bin/env python
"""Micro-profile of the encode pair-compaction's sub-stages (real TPU).

Standalone pallas kernel over resident VMEM word planes: per grid step it
runs G group compactions truncated after a sub-stage, ORs results into a
keep-alive output.  Separate-process probe per the kernel-hazard protocol.

Stages: search (7-step binary ascent), +wm, +candidates (8x2 gather/select),
+interleave (pair->word).  Cost = delta between consecutive stages.
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

G = 64          # groups per grid step (matches the 256-row block)
STEPS = 512     # grid steps -> G*STEPS group-compactions per run
IW = 4          # search interleave width


def kern(stage, words_ref, depth_ref, out_ref):
    depth = depth_ref[...].astype(jnp.int32)
    ploff_all = _exclusive_lane_cumsum(depth)
    pq = _rows((8, LANES)) * LANES + _lanes((8, LANES))
    l2 = _lanes((16, LANES))
    idx = jnp.where((_rows((16, LANES)) & 1) == 1, 64 + (l2 >> 1), l2 >> 1)
    acc = jnp.zeros((16, LANES), jnp.uint32)
    for s0 in range(0, G, IW):
        ploffs = [jnp.broadcast_to(ploff_all[s:s+1, :], (8, LANES))
                  for s in range(s0, s0 + IW)]
        los = [jnp.zeros((8, LANES), jnp.int32) for _ in range(IW)]
        step = LANES // 2
        while step >= 1:
            for i in range(IW):
                cand = jnp.minimum(los[i] + step, LANES - 1)
                v = jnp.take_along_axis(ploffs[i], cand, axis=-1)
                los[i] = jnp.where(v <= pq, cand, los[i])
            step //= 2
        if stage == 0:
            for i in range(IW):
                acc = acc | jnp.concatenate(
                    [los[i].astype(jnp.uint32)] * 2, axis=0)
            continue
        for i in range(IW):
            s = s0 + i
            wm = jnp.minimum(
                pq - jnp.take_along_axis(ploffs[i], los[i], axis=-1), 7)
            if stage == 1:
                acc = acc | jnp.concatenate(
                    [wm.astype(jnp.uint32), los[i].astype(jnp.uint32)], axis=0)
                continue
            lo_v = jnp.zeros((8, LANES), jnp.uint32)
            hi_v = jnp.zeros((8, LANES), jnp.uint32)
            for m in range(8):
                sel = wm == m
                srcl = jnp.broadcast_to(words_ref[2*m][s:s+1, :], (8, LANES))
                srch = jnp.broadcast_to(words_ref[2*m+1][s:s+1, :], (8, LANES))
                lo_v = jnp.where(sel, jnp.take_along_axis(srcl, los[i], axis=-1), lo_v)
                hi_v = jnp.where(sel, jnp.take_along_axis(srch, los[i], axis=-1), hi_v)
            if stage == 2:
                acc = acc | jnp.concatenate([lo_v, hi_v], axis=0)
                continue
            lo2 = jnp.repeat(lo_v, 2, axis=0)
            hi2 = jnp.repeat(hi_v, 2, axis=0)
            vlo = jnp.take_along_axis(lo2, idx, axis=-1)
            vhi = jnp.take_along_axis(hi2, idx, axis=-1)
            acc = acc | jnp.where((l2 & 1) == 1, vhi, vlo)
    out_ref[...] = acc


def run(stage):
    f = pl.pallas_call(
        functools.partial(kern, stage),
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
    t = measure_device_seconds(fn, words, depth, reps=4)
    ngrp = G * STEPS
    return t, t / ngrp * 1e9


names = ["search", "+wm", "+candidates", "+interleave"]
prev = 0.0
for st in range(4):
    t, per = run(st)
    print(f"{st} {names[st]:12s} total {t*1e3:7.3f} ms  {per:6.1f} ns/group  delta {(t-prev)*1e3:7.3f} ms")
    prev = t
