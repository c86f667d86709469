"""Differential fuzzing against the reference C library.

Builds the reference (read-only at /root/reference) at -O0 — its -O2/-O3
build is miscompiled by modern gcc (strict-aliasing UB; SURVEY §5 quirk 6 and
beyond) — and exchanges whole encoded images both directions.  Skipped when
the reference sources or a compiler are unavailable.
"""

import ctypes
import os
import subprocess

import numpy as np
import pytest

from dbde_tpu import ref_numpy as ref

REF_DIR = "/root/reference"
BUILD = "/tmp/dbde_ref_interop"


def _build_reference():
    if not os.path.exists(os.path.join(REF_DIR, "dbde_util.cpp")):
        return None
    so = os.path.join(BUILD, "libdbde_ref.so")
    if os.path.exists(so):
        return so
    os.makedirs(BUILD, exist_ok=True)
    wrapper = os.path.join(BUILD, "wrapper.cpp")
    with open(wrapper, "w") as f:
        f.write(
            '#include <stdint.h>\n#include <stdio.h>\n#include "dbde_util.h"\n'
            'extern "C" size_t c_pack_image(uint8_t* i, int W, int H, uint8_t* t)'
            "{ return dbde_pack_image(i, W, H, t); }\n"
            'extern "C" size_t c_unpack_image(uint8_t* p, int W, int H, uint8_t* i)'
            "{ return dbde_unpack_image(p, W, H, i); }\n"
        )
    try:
        subprocess.run(
            ["g++", "-O0", "-std=c++14", "-march=corei7", "-shared", "-fPIC",
             "-I", REF_DIR, os.path.join(REF_DIR, "dbde_util.cpp"), wrapper,
             "-o", so + ".tmp"],
            check=True, capture_output=True, timeout=120,
        )
        os.replace(so + ".tmp", so)
        return so
    except (subprocess.SubprocessError, OSError):
        return None


_SO = _build_reference()
pytestmark = pytest.mark.skipif(_SO is None, reason="reference library unavailable")


@pytest.fixture(scope="module")
def lib():
    L = ctypes.CDLL(_SO)
    L.c_pack_image.restype = ctypes.c_size_t
    L.c_pack_image.argtypes = [ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
                                  ctypes.c_int, ctypes.POINTER(ctypes.c_uint8)]
    L.c_unpack_image.restype = ctypes.c_size_t
    L.c_unpack_image.argtypes = [ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
                                    ctypes.c_int, ctypes.POINTER(ctypes.c_uint8)]
    return L


def _p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def ref_pack(lib, img):
    H, W = img.shape
    out = np.zeros(H * W * 10 + 4096, np.uint8)
    img = np.ascontiguousarray(img)
    n = lib.c_pack_image(_p(img), W, H, _p(out))
    return out[:n].tobytes()


def ref_unpack(lib, data, W, H):
    buf = np.frombuffer(data, np.uint8).copy()
    img = np.zeros(H * W, np.uint8)
    n = lib.c_unpack_image(_p(buf), W, H, _p(img))
    assert n == len(data)
    return img.reshape(H, W)


def _content(rng, H, W, kind):
    if kind == "flat":
        return np.full((H, W), int(rng.integers(0, 256)), np.uint8)
    if kind == "random":
        return rng.integers(0, 256, (H, W)).astype(np.uint8)
    if kind == "masked":
        return (rng.integers(0, 256, (H, W)) & rng.integers(0, 256, (H, W))).astype(np.uint8)
    base = rng.integers(0, 200)
    span = int(rng.integers(1, 40))
    return (base + rng.integers(0, span, (H, W))).astype(np.uint8)


@pytest.mark.parametrize("seed", range(12))
def test_fuzz_image_bytes_identical(lib, seed):
    """Our encoder and the reference produce identical bytes; each decodes
    the other's output pixel-exactly."""
    rng = np.random.default_rng(seed)
    H = int(rng.integers(1, 100))
    W = int(rng.integers(1, 150))
    kind = ["flat", "random", "masked", "narrow"][seed % 4]
    img = _content(rng, H, W, kind)

    ours = ref.pack_image(img)
    theirs = ref_pack(lib, img)
    assert ours == theirs

    # cross-decode
    out_ours, n = ref.unpack_image(theirs, W, H)
    assert n == len(theirs)
    np.testing.assert_array_equal(out_ours, img)
    np.testing.assert_array_equal(ref_unpack(lib, ours, W, H), img)


def test_fuzz_jax_codec_bytes_identical(lib):
    """The device (XLA on CPU here) codec matches the reference byte-for-byte."""
    from dbde_tpu.codec import DbdeCodec, pack_frames_bytes
    from dbde_tpu.format import FRAME_HEADER_BYTES

    rng = np.random.default_rng(99)
    img = (rng.integers(0, 256, (52, 76)) & rng.integers(0, 256, (52, 76))).astype(np.uint8)
    codec = DbdeCodec(height=52, width=76)
    rec = pack_frames_bytes(codec.encode(img[None]))[0]
    assert rec[FRAME_HEADER_BYTES:] == ref_pack(lib, img)
