#!/usr/bin/env python
"""Minimal isolation probe for the DECODE_BLOCK_U8 arm's novel constructs.

The per-block uniform-8 window fast path replaces the 17-row select chain
with ``reshape(16, 8, 16).transpose(2, 0, 1)`` executed inside a ``pl.when``
branch on an SMEM-scalar condition.  Neither the 3D-transpose lowering nor
that relayout-inside-a-branch has ever executed on hardware (interpreter
mode can't see Mosaic codegen), and the first full-probe attempt ended in a
chip wedge of unknown origin (timeout-kill mid-DMA is the other suspect).
This probes the constructs alone, one pallas_call per stage, tiny shapes,
so a wedge (if any) is attributable:

  stage 1 — static (16,8,16) transpose, no branch
            RESULT (v5e): clean Mosaic COMPILE ERROR — "infer-vector-layout:
            unsupported shape cast" on (16,128)->(16,8,16); the arm as
            written can never reach hardware (and therefore never wedged it)
  stage 2 — same transpose inside pl.when on an SMEM-prefetched scalar,
            with the input rows READ OUTSIDE the branch (the arm's exact
            hoisting discipline)
  stage 3 — lane-preserving reformulation: 8 per-block (16,16) 2D
            transposes + concat + ONE static lane gather (the only
            variant whose op count still beats the 17-row select chain)

Run each stage in its own process: ``python tools/probe_transpose_when.py 1``
then (after checking health) ``... 2`` / ``... 3``.
"""
import sys

sys.path.insert(0, ".")

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

stage = int(sys.argv[1]) if len(sys.argv) > 1 else 1


def perm_ref(x):
    # win[j, 8o+b] = x[o, 16b+j]
    return x.reshape(16, 8, 16).transpose(2, 0, 1).reshape(16, 128)


def kern1(x_ref, o_ref):
    o_ref[...] = perm_ref(x_ref[...])


def kern2(flags_ref, x_ref, o_ref):
    rows = [x_ref[pl.ds(r, 1), :] for r in range(16)]  # reads hoisted

    @pl.when(flags_ref[0] == 1)
    def _():
        o_ref[...] = jnp.concatenate(rows, axis=0).reshape(
            16, 8, 16).transpose(2, 0, 1).reshape(16, 128)

    @pl.when(flags_ref[0] != 1)
    def _():
        o_ref[...] = jnp.concatenate(rows, axis=0)


def kern3(x_ref, o_ref):
    x = x_ref[...]
    # win[j, 8o+b] = x[o, 16b+j]:  concat_b(x[:,16b:+16]^T) puts the value
    # at [j, 16b+o]; one static lane gather 16(l&7)+(l>>3) finishes it
    xt = jnp.concatenate(
        [x[:, 16 * b : 16 * b + 16].T for b in range(8)], axis=1)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 1)
    idx = 16 * (lanes & 7) + (lanes >> 3)
    o_ref[...] = jnp.take_along_axis(xt, idx, axis=-1)


x = np.arange(16 * 128, dtype=np.uint32).reshape(16, 128)
want = np.asarray(perm_ref(x))

if stage == 3:
    out = pl.pallas_call(
        kern3,
        out_shape=jax.ShapeDtypeStruct((16, 128), jnp.uint32),
    )(jnp.asarray(x))
    ok = (np.asarray(out) == want).all()
    print(f"stage3 blockT+gather: {'OK' if ok else 'MISMATCH'}", flush=True)
elif stage == 1:
    out = pl.pallas_call(
        kern1,
        out_shape=jax.ShapeDtypeStruct((16, 128), jnp.uint32),
    )(jnp.asarray(x))
    ok = (np.asarray(out) == want).all()
    print(f"stage1 static transpose: {'OK' if ok else 'MISMATCH'}", flush=True)
else:
    for flag, exp in ((1, want), (0, x)):
        out = pl.pallas_call(
            kern2,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1,),
                in_specs=[pl.BlockSpec((16, 128), lambda i, *_: (0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((16, 128), lambda i, *_: (0, 0),
                                       memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((16, 128), jnp.uint32),
        )(jnp.asarray([flag], jnp.int32), jnp.asarray(x))
        ok = (np.asarray(out) == exp).all()
        print(f"stage2 flag={flag} branch transpose: "
              f"{'OK' if ok else 'MISMATCH'}", flush=True)
