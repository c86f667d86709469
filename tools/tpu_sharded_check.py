#!/usr/bin/env python
"""Compiled shard_map validation on real TPU (1x1 mesh).

The virtual-CPU-mesh test suite runs the sharded band codec with
interpreter-mode kernels (tests/test_parallel.py); this tool is the real-
hardware complement: the same shard bodies with *compiled* Pallas kernels,
checking (a) byte parity of the sharded encode against the single-chip
codec and the numpy oracle, (b) pixel-exact sharded decode, and (c) that
the fused sharded roundtrip step's device time matches the single-chip
band kernels (shard_map must not tax the hot path).  VERDICT round-1 item
2's acceptance criterion.
"""
import functools
import sys

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from dbde_tpu.bench_core import make_content
from dbde_tpu.codec import DbdeCodec
from dbde_tpu import ref_numpy as ref
from dbde_tpu.parallel import sharding as sh
from dbde_tpu.utils.profiling import measure_device_seconds


def main() -> None:
    W = H = 2048
    B = 8
    imgs = make_content(W, H, B, "camera")
    mesh = sh.make_mesh(n_data=1, n_tiles=1)
    assert not sh._mesh_interpret(mesh), "expected compiled kernels on TPU"

    # (a)+(b): public sharded API, byte/pixel parity
    depth, mn, payload, totals, bases, Hp = sh.encode_sharded(imgs, mesh, backend="band")
    flat = sh.assemble_payload_host(payload, np.asarray(totals))
    codec = DbdeCodec(height=H, width=W, backend="band")
    enc = codec.encode(imgs)
    n64 = np.asarray(enc.n64)
    for b in range(B):
        want = enc.payload_host()[b][: 2 * int(n64[b])]
        np.testing.assert_array_equal(flat[b], want)
    blob = ref.pack_image(imgs[0])
    T = codec.tiles
    assert np.asarray(depth)[0].tobytes() == blob[4 : 4 + T]
    out = sh.decode_sharded(depth, mn, payload, mesh, H, W, Hp, backend="band")
    np.testing.assert_array_equal(out, imgs)
    print("sharded encode/decode byte+pixel parity ok (compiled kernels)")

    # (c): fused roundtrip step device time vs single-chip kernels
    h, w, h_loc, L_real, L = sh._band_geometry(W, H, 1)
    img32 = jax.device_put(sh._prep_band_img32(imgs, 1))

    def body(x_local):
        d, m, p, t, _ = sh._encode_block_band(x_local, h_loc, W, False)
        o = sh._decode_block_band(d, m, p, h_loc, W, False)
        return o, jax.lax.psum(jnp.sum(t), ("data", "tiles")) // 2

    fn = jax.jit(
        jax.shard_map(
            body, mesh=mesh, in_specs=P("data", "tiles", None),
            out_specs=(P("data", "tiles", None), P()), check_vma=False,
        )
    )
    t_sh = measure_device_seconds(fn, img32, reps=4)

    rt = jax.jit(codec._roundtrip_band)
    t_single = measure_device_seconds(rt, codec._to_img32(imgs), reps=4)
    npix = B * H * W
    print(
        f"roundtrip: sharded 1x1 {npix/t_sh/1e9:.2f} Gpix/s vs single-chip "
        f"{npix/t_single/1e9:.2f} Gpix/s (ratio {t_single/t_sh:.3f})"
    )
    assert t_sh <= 1.15 * t_single, "shard_map overhead exceeds 15%"
    print("SHARDED TPU CHECK OK")


if __name__ == "__main__":
    main()
