"""Oracle codec conformance: golden vectors, README example, property tests."""

import numpy as np
import pytest

from dbde_tpu import format as fmt
from dbde_tpu import ref_numpy as ref
from golden import (
    GOLDEN_8x16_FILE,
    GOLDEN_8x16_IMAGE,
    README_10x10_DEPTHS,
    README_10x10_IMAGE,
    README_10x10_MINS,
    README_10x10_U64S,
)


def test_golden_encode_bit_exact():
    """Re-encoding the golden image must reproduce all 128 bytes."""
    out = ref.encode_video([GOLDEN_8x16_IMAGE], frame_hz=1.0, indices=[1])
    assert out == GOLDEN_8x16_FILE


def test_golden_decode_bit_exact():
    vh, headers, images = ref.decode_video(GOLDEN_8x16_FILE)
    assert vh.ok and vh.height == 8 and vh.width == 16
    assert len(images) == 1
    assert headers[0].index == 1
    np.testing.assert_array_equal(images[0], GOLDEN_8x16_IMAGE)


def test_golden_frame_sizes():
    data = ref.pack_frame(1, GOLDEN_8x16_IMAGE)
    assert len(data) == 100  # reference asserts dbde_pack_frame returns 100


def test_readme_example_tiles():
    tiles = ref.tile_image(README_10x10_IMAGE)
    assert tiles.shape == (4, 64)
    depths, mins = ref.tile_depths_mins(tiles)
    np.testing.assert_array_equal(depths, README_10x10_DEPTHS)
    np.testing.assert_array_equal(mins, README_10x10_MINS)


def test_readme_example_payload_words():
    data = ref.pack_image(README_10x10_IMAGE)
    T = 4
    payload = np.frombuffer(data[12 + 2 * T :], dtype="<u8")
    np.testing.assert_array_equal(payload, np.array(README_10x10_U64S, dtype=np.uint64))


def test_readme_example_roundtrip():
    data = ref.pack_image(README_10x10_IMAGE)
    img, n = ref.unpack_image(data, 10, 10)
    assert n == len(data)
    np.testing.assert_array_equal(img, README_10x10_IMAGE)


def test_edge_padding_rule():
    """Right-pad each row with its last valid value, then copy last row down."""
    img = np.arange(9, dtype=np.uint8).reshape(3, 3)
    tiles = ref.tile_image(img)
    tile = tiles[0].reshape(8, 8)
    np.testing.assert_array_equal(tile[0], [0, 1, 2, 2, 2, 2, 2, 2])
    np.testing.assert_array_equal(tile[2], [6, 7, 8, 8, 8, 8, 8, 8])
    for r in range(3, 8):
        np.testing.assert_array_equal(tile[r], tile[2])


@pytest.mark.parametrize("depth", range(9))
def test_single_depth_roundtrip(depth):
    rng = np.random.default_rng(depth)
    base = rng.integers(0, 256 - (1 << depth) + 1 if depth < 8 else 1)
    span = (1 << depth) - 1 if depth > 0 else 0
    img = (base + rng.integers(0, span + 1, size=(16, 24))).astype(np.uint8)
    if depth > 0:  # force the exact range so the depth is what we asked for
        img.flat[0] = base
        img.flat[1] = base + span
        if depth == 8:
            img.flat[0] = 0
            img.flat[1] = 255
    data = ref.pack_image(img)
    out, n = ref.unpack_image(data, 24, 16)
    assert n == len(data)
    np.testing.assert_array_equal(out, img)


@pytest.mark.parametrize(
    "shape", [(8, 8), (8, 16), (10, 10), (1, 1), (7, 3), (9, 9), (17, 33), (64, 64), (31, 130)]
)
def test_random_roundtrip_shapes(shape):
    rng = np.random.default_rng(hash(shape) % 2**32)
    img = rng.integers(0, 256, size=shape).astype(np.uint8)
    data = ref.pack_image(img)
    H, W = shape
    out, n = ref.unpack_image(data, W, H)
    assert n == len(data)
    np.testing.assert_array_equal(out, img)
    h, w = fmt.tile_grid(W, H)
    assert len(data) <= 12 + 2 * h * w + 8 * 8 * h * w


def test_flat_image_is_tiny():
    img = np.full((64, 64), 77, dtype=np.uint8)
    data = ref.pack_image(img)
    assert len(data) == 12 + 2 * 64  # all tiles depth 0: no payload


def test_unpack_image_error_parity():
    data = bytearray(ref.pack_image(README_10x10_IMAGE))
    # corrupt the depth-count field → hard error, 0 consumed
    data[0] ^= 0xFF
    img, n = ref.unpack_image(bytes(data), 10, 10)
    assert img is None and n == 0
    # corrupt n64 → hard error
    data = bytearray(ref.pack_image(README_10x10_IMAGE))
    data[8 + 2 * 4] ^= 0x01
    img, n = ref.unpack_image(bytes(data), 10, 10)
    assert img is None and n == 0


def test_unpack_frame_error_does_not_advance():
    raw = ref.pack_frame(3, README_10x10_IMAGE)
    bad = bytearray(raw)
    bad[20] ^= 0xFF  # corrupt frame data count
    fh, img, n = ref.unpack_frame(bytes(bad), 10, 10)
    assert not fh.ok and img is None and n == 0


def test_truncated_payload_fails_cleanly():
    data = ref.pack_image(README_10x10_IMAGE)
    img, n = ref.unpack_image(data[:-5], 10, 10)
    assert img is None and n == 0
    # truncated mid-frame inside a video: decode stops at last whole frame
    frames = [README_10x10_IMAGE] * 3
    buf = ref.encode_video(frames)
    vh, headers, images = ref.decode_video(buf[:-30])
    assert vh.ok and len(images) == 2


def test_multi_frame_video_roundtrip():
    rng = np.random.default_rng(7)
    frames = [rng.integers(0, 256, size=(10, 10)).astype(np.uint8) for _ in range(5)]
    buf = ref.encode_video(frames, frame_hz=500.0)
    vh, headers, images = ref.decode_video(buf)
    assert vh.frame_hz == 500.0 and len(images) == 5
    for i, (f, out) in enumerate(zip(frames, images)):
        assert headers[i].index == i
        np.testing.assert_array_equal(out, f)
