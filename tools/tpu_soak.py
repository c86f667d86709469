#!/usr/bin/env python
"""Randomized on-device differential soak for the production band kernels.

Complements tools/tpu_quickcheck.py (fixed geometry matrix): draws random
geometries across every dispatch regime the codec has — row-folded narrow
widths, odd widths, wide multi-chunk grids, ragged heights spanning one to
many grid blocks — fills them with *adversarial per-tile-depth* content
(exact target depths per tile, weighted toward the corner cases that have
bitten: depth-8 tiles ending non-full groups, depth-0 runs, mixed shallow/
full groups; see kernel_common._mask_past_total and ROUND3_NOTES), runs the
compiled kernels on the real chip with adaptive reduced-plane dispatch
enabled (each case encodes a shallow batch first, then a depth-8 batch, so
the sticky predictor takes a misprediction re-encode at least once per
depth-8 case; geometries that support the uniform-8 permutation kernels
also rotate through two uniform-8 batches — asserting the u8 kernels
actually dispatched — and a u8→reduced misprediction flip), and
byte-compares depths + payload + decode against the numpy oracle (record
layout dbde_util.cpp:137-180).

Usage: tools/tpu_soak.py [n_cases] [seed]   (default 20 cases, seed 0)
Each new geometry costs one TPU compile (~20-40 s); 20 cases ~= 15 min.
"""
import sys

import numpy as np

sys.path.insert(0, ".")

from dbde_tpu.bench_core import make_adversarial, make_uniform8
from dbde_tpu.codec import DbdeCodec, uniform8_supported
from dbde_tpu import ref_numpy as ref


def adversarial_frames(rng: np.random.Generator, B: int, H: int, W: int,
                       maxd: int) -> np.ndarray:
    return make_adversarial(W, H, B, maxd=maxd, seed=int(rng.integers(1 << 31)))


def check_case(codec: DbdeCodec, img: np.ndarray, tag: str) -> None:
    enc = codec.encode(img)
    out = codec.decode(enc.depths, enc.mins, enc.payload)
    np.testing.assert_array_equal(np.asarray(out), img, err_msg=tag)
    n64 = np.asarray(enc.n64)
    flat = enc.payload_host()
    T = codec.tiles
    d = np.asarray(enc.depths).reshape(img.shape[0], -1)
    m = np.asarray(enc.mins).reshape(img.shape[0], -1)
    for b in range(img.shape[0]):
        blob = ref.pack_image(img[b])
        np.testing.assert_array_equal(
            d[b, :T], np.frombuffer(blob, np.uint8)[4 : 4 + T], err_msg=tag)
        np.testing.assert_array_equal(
            m[b, :T], np.frombuffer(blob, np.uint8)[8 + T : 8 + 2 * T],
            err_msg=tag)
        got = flat[b, : 2 * int(n64[b])].tobytes()
        assert got == blob[12 + 2 * T :], f"payload mismatch: {tag} frame {b}"


def main() -> None:
    n_cases = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    rng = np.random.default_rng(seed)
    # Width regimes: row-folded narrow, fold-boundary, odd, wide multi-chunk.
    regimes = [
        lambda: int(rng.integers(9, 342)),      # narrow: band_fold k>1
        lambda: int(rng.integers(342, 1025)),   # single-band, pad to 1024
        lambda: int(rng.integers(1025, 3073)),  # wide: multi-chunk grids
        lambda: 2 * int(rng.integers(5, 1536)) + 1,  # odd width anywhere
    ]
    for i in range(n_cases):
        W = regimes[i % len(regimes)]()
        H = int(rng.integers(9, 600))
        B = int(rng.integers(1, 4))
        codec = DbdeCodec(height=H, width=W, backend="band", adaptive=True)
        maxd_shallow = int(rng.integers(1, 6))
        tag = f"case {i}: {W}x{H} B={B} shallow_maxd={maxd_shallow}"
        # Shallow batch -> predictor locks a reduced-plane variant; depth-8
        # batch next -> misprediction re-encode; shallow again -> re-lock.
        check_case(codec, adversarial_frames(rng, B, H, W, maxd_shallow), tag)
        check_case(codec, adversarial_frames(rng, B, H, W, 8), tag + " d8")
        check_case(codec, adversarial_frames(rng, B, H, W, maxd_shallow),
                   tag + " shallow2")
        # Uniform-8 rotation: two uniform batches (first observes (8,8), the
        # second dispatches the u8 permutation kernels when the geometry
        # supports them — randomized planner coverage beyond the two bench
        # shapes), then shallow again (u8 -> reduced misprediction flip).
        if H % 8 != 1 and W % 8 != 1:
            u8 = "u8" if uniform8_supported(H, W) else "general-d8"
            check_case(codec, make_uniform8(W, H, B,
                       seed=int(rng.integers(1 << 31))), tag + f" uni8a/{u8}")
            check_case(codec, make_uniform8(W, H, B,
                       seed=int(rng.integers(1 << 31))), tag + f" uni8b/{u8}")
            if u8 == "u8":
                assert codec._mplanes == "u8", tag  # the u8 kernels RAN
            check_case(codec, adversarial_frames(rng, B, H, W, maxd_shallow),
                       tag + " shallow3")
            tag += f" +uni8({u8})"
        print(f"ok {tag}", flush=True)
    print(f"TPU SOAK OK ({n_cases} cases, seed {seed})")


if __name__ == "__main__":
    main()
