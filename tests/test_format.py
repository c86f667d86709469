"""Header serde + container-level conformance tests."""

import math
import struct

import numpy as np
import pytest

from dbde_tpu import format as fmt
from golden import GOLDEN_8x16_FILE


def test_video_header_roundtrip():
    vh = fmt.VideoHeader(height=480, width=640, frame_hz=99.5)
    raw = vh.pack()
    assert len(raw) == fmt.VIDEO_HEADER_BYTES
    out, n = fmt.unpack_video_header(raw)
    assert n == 28
    assert out.ok
    assert (out.height, out.width, out.frame_hz) == (480, 640, 99.5)


def test_video_header_hz_as_integer():
    vh = fmt.VideoHeader(height=8, width=16, frame_hz=99.7)
    raw = vh.pack(hz_as_integer=True)
    # (long long)(99.7 + 0.5) == 100
    assert struct.unpack_from("<Q", raw, 20)[0] == 100
    out, _ = fmt.unpack_video_header(raw, hz_as_integer=True)
    assert out.frame_hz == 100.0


def test_video_header_bad_count_sentinel():
    raw = struct.pack("<IQQd", 5, 8, 16, 1.0)
    out, n = fmt.unpack_video_header(raw)
    assert n == 28  # cursor still advances, like the reference
    assert not out.ok
    assert out.u64s == fmt.U64S_SENTINEL


def test_frame_header_roundtrip_and_f64_quirk():
    fh = fmt.FrameHeader(index=12345, elapsed_ns=10**15)
    raw = fh.pack()
    assert len(raw) == fmt.FRAME_HEADER_BYTES
    # elapsed_ns is stored as the f64 numeric value, not raw u64 bits
    assert struct.unpack_from("<d", raw, 12)[0] == float(10**15)
    out, _ = fmt.unpack_frame_header(raw)
    assert out.ok and out.index == 12345 and out.elapsed_ns == 10**15


def test_frame_header_f64_quirk_large_values():
    # Above 2^53 the double cast rounds — we must match C's behavior
    ns = (1 << 60) + 12345
    raw = fmt.FrameHeader(index=0, elapsed_ns=ns).pack()
    stored = struct.unpack_from("<d", raw, 12)[0]
    assert stored == float(ns)  # round-to-nearest, like (double)u64 in C
    out, _ = fmt.unpack_frame_header(raw)
    assert out.elapsed_ns == int(float(ns))  # truncation, like (u64)double


def test_frame_header_bad_count_sentinel():
    raw = struct.pack("<IQd", 7, 1, 0.0)
    out, _ = fmt.unpack_frame_header(raw)
    assert not out.ok
    assert out.u64s == fmt.U64S_SENTINEL


def test_golden_file_headers():
    vh, pos = fmt.unpack_video_header(GOLDEN_8x16_FILE)
    assert pos == 28
    assert vh.ok and vh.height == 8 and vh.width == 16 and vh.frame_hz == 1.0
    fh, pos = fmt.unpack_frame_header(GOLDEN_8x16_FILE, pos)
    assert pos == 48
    assert fh.ok and fh.index == 1 and fh.elapsed_ns == 0
    # repack both headers: must reproduce the golden bytes
    assert vh.pack() == GOLDEN_8x16_FILE[:28]
    assert fh.pack() == GOLDEN_8x16_FILE[28:48]


def test_size_helpers():
    assert fmt.tile_grid(16, 8) == (1, 2)
    assert fmt.tile_grid(10, 10) == (2, 2)
    assert fmt.packed_image_size(16, 8, 8) == 12 + 4 + 64  # golden frame data = 80 B
    assert fmt.max_packed_image_size(16, 8) == 12 + 4 + 8 * 16
