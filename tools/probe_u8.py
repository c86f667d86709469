#!/usr/bin/env python
"""Probe the uniform depth-8 permutation kernels on a real TPU.

Parity (vs the general band kernels) + device timing at the two bench
geometries (2048² and the reference-default 2536×2048).  Run in its own
process first — a bad Mosaic program wedges the chip for ~10 minutes.
Usage: python tools/probe_u8.py [HxW ...]
"""
import sys

sys.path.insert(0, ".")

import numpy as np
import jax

from dbde_tpu.bench_core import make_content
from dbde_tpu.codec import (DbdeCodec, _decode_fn_band, _encode_fn_band,
                            _encode_fn_band_u8, band_fold, to_band_img32,
                            uniform8_supported)
from dbde_tpu.format import tile_grid
from dbde_tpu.utils.profiling import measure_device_seconds

geoms = [tuple(int(x) for x in a.split("x")) for a in sys.argv[1:]] or [
    (2048, 2048), (2048, 2536)]
B = 8
for H, W in geoms:
    assert uniform8_supported(H, W), (H, W)
    src = make_content(W, H, B, "random")
    npix = B * H * W
    img32 = jax.device_put(to_band_img32(src, H, W))

    enc_gen = jax.jit(lambda x: _encode_fn_band(x, H=H, W=W))
    enc_u8 = jax.jit(lambda x: _encode_fn_band_u8(x, H=H, W=W))
    d_g, m_g, p_g, n_g, (maxd, mind) = enc_gen(img32)
    assert int(mind) == 8, f"content not uniform-8 (mind={int(mind)})"
    d_u, m_u, p_u, n_u, _ = enc_u8(img32)
    np.testing.assert_array_equal(np.asarray(d_u), np.asarray(d_g))
    live = 2 * int(np.asarray(n_g).max())
    pg = np.asarray(p_g).reshape(B, -1)[:, :live]
    pu = np.asarray(p_u).reshape(B, -1)[:, :live]
    np.testing.assert_array_equal(pu, pg)
    print(f"[{H}x{W}] encode parity OK (live {live} words/frame)")
    t_g = measure_device_seconds(enc_gen, img32, reps=6)
    t_u = measure_device_seconds(enc_u8, img32, reps=6)
    print(f"[{H}x{W}] encode general {t_g*1e3:.3f} ms ({npix/t_g/1e9:.1f} Gpix/s)"
          f" -> u8 {t_u*1e3:.3f} ms ({npix/t_u/1e9:.1f} Gpix/s)")

    dec_gen = jax.jit(lambda d, m, p: _decode_fn_band(d, m, p, H=H, W=W,
                                                      uniform8=False))
    dec_u8 = jax.jit(lambda d, m, p: _decode_fn_band(d, m, p, H=H, W=W,
                                                     uniform8=True))
    o_g = np.asarray(dec_gen(d_g, m_g, p_g))
    o_u = np.asarray(dec_u8(d_g, m_g, p_g))
    np.testing.assert_array_equal(o_u, o_g)
    np.testing.assert_array_equal(
        np.ascontiguousarray(o_u).view(np.uint8)[:, :, :W], src)
    print(f"[{H}x{W}] decode parity OK")
    t_g = measure_device_seconds(dec_gen, d_g, m_g, p_g, reps=6)
    t_u = measure_device_seconds(dec_u8, d_g, m_g, p_g, reps=6)
    print(f"[{H}x{W}] decode general {t_g*1e3:.3f} ms ({npix/t_g/1e9:.1f} Gpix/s)"
          f" -> u8 {t_u*1e3:.3f} ms ({npix/t_u/1e9:.1f} Gpix/s)")
