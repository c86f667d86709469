"""Native C++ IO layer: differential parity with the pure-Python paths."""

import numpy as np
import pytest

from dbde_tpu import ref_numpy as ref
from dbde_tpu.format import FRAME_HEADER_BYTES, tile_grid
from dbde_tpu.native import binding as nb

pytestmark = pytest.mark.skipif(not nb.native_available(), reason="no g++ / native build failed")


@pytest.fixture(scope="module")
def video():
    rng = np.random.default_rng(2)
    frames = (rng.integers(0, 128, size=(7, 19, 27))).astype(np.uint8)
    frames[3] = 9
    buf = ref.encode_video(list(frames), frame_hz=10.0)
    return frames, buf


def test_record_size(video):
    frames, buf = video
    h, w = tile_grid(27, 19)
    rec0 = ref.pack_frame(0, frames[0])
    assert nb.record_size(buf, 28, h * w) == len(rec0)
    # corrupt count -> 0
    bad = bytearray(buf)
    bad[28 + 20] ^= 1
    assert nb.record_size(bytes(bad), 28, h * w) == 0
    # truncated -> 0
    assert nb.record_size(buf[: 28 + 30], 28, h * w) == 0


def test_scan_records(video):
    frames, buf = video
    h, w = tile_grid(27, 19)
    offs, sizes = nb.scan_records(buf, 28, h * w, 100)
    assert len(offs) == 7
    assert offs[0] == 28
    assert sum(sizes) == len(buf) - 28


def test_gather_fields_matches_python(video):
    from dbde_tpu.codec import unpack_frames_bytes

    frames, buf = video
    h, w = tile_grid(27, 19)
    T = h * w
    offs, sizes = nb.scan_records(buf, 28, T, 100)
    data_offs = [o + FRAME_HEADER_BYTES for o in offs]
    d1, m1, p1, n1 = nb.gather_fields(buf, data_offs, T, 16 * T)
    d2, m2, p2, n2 = unpack_frames_bytes(buf, 27, 19, data_offs)
    np.testing.assert_array_equal(d1, d2)
    np.testing.assert_array_equal(m1, m2)
    np.testing.assert_array_equal(p1, p2)
    np.testing.assert_array_equal(n1, n2)


def test_gather_fields_corrupt_raises(video):
    frames, buf = video
    h, w = tile_grid(27, 19)
    bad = bytearray(buf)
    bad[28 + 20] ^= 1
    with pytest.raises(ValueError):
        nb.gather_fields(bytes(bad), [28 + FRAME_HEADER_BYTES], h * w, 16 * h * w)


def test_assemble_records_matches_python(video):
    from dbde_tpu.codec import unpack_frames_bytes

    frames, buf = video
    h, w = tile_grid(27, 19)
    T = h * w
    offs, _ = nb.scan_records(buf, 28, T, 100)
    data_offs = [o + FRAME_HEADER_BYTES for o in offs]
    d, m, p, n = nb.gather_fields(buf, data_offs, T, 16 * T)
    out = nb.assemble_records(d, m, p, n, indices=np.arange(7), elapsed_ns=[0] * 7)
    assert out == buf[28:]  # byte-exact re-assembly of all records


def test_assemble_with_timestamps():
    img = np.full((8, 8), 3, np.uint8)
    rec = ref.pack_frame(42, img, elapsed_ns=123456789)
    d = np.array([[0]], np.uint8)
    m = np.array([[3]], np.uint8)
    p = np.zeros((1, 16), np.uint32)
    out = nb.assemble_records(d, m, p, np.array([0], np.int32),
                              indices=[42], elapsed_ns=[123456789])
    assert out == rec
