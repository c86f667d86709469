"""Differential tests: JAX device codec vs the numpy oracle, byte-for-byte."""

import numpy as np
import pytest

from dbde_tpu import ref_numpy as ref
from dbde_tpu.codec import DbdeCodec, pack_frames_bytes, unpack_frames_bytes
from golden import GOLDEN_8x16_IMAGE, README_10x10_IMAGE


def oracle_frame_bytes(image, index=0):
    return ref.pack_frame(index, image)


def codec_frame_bytes(image, index=0):
    codec = DbdeCodec(height=image.shape[0], width=image.shape[1])
    enc = codec.encode(image[None])
    return pack_frames_bytes(enc, indices=[index])[0]


def test_golden_image_bytes_parity():
    assert codec_frame_bytes(GOLDEN_8x16_IMAGE, 1) == oracle_frame_bytes(GOLDEN_8x16_IMAGE, 1)


def test_readme_image_bytes_parity():
    assert codec_frame_bytes(README_10x10_IMAGE) == oracle_frame_bytes(README_10x10_IMAGE)


@pytest.mark.parametrize(
    "shape", [(8, 8), (16, 8), (10, 10), (1, 1), (7, 3), (9, 9), (17, 33), (40, 56), (31, 130)]
)
def test_random_bytes_parity(shape):
    rng = np.random.default_rng(hash(shape) % 2**32)
    # mixed-depth content: blocks of varying dynamic range
    img = (rng.integers(0, 256, size=shape) & rng.integers(0, 256, size=shape)).astype(np.uint8)
    assert codec_frame_bytes(img) == oracle_frame_bytes(img)


@pytest.mark.parametrize("depth", range(9))
def test_uniform_depth_bytes_parity(depth):
    rng = np.random.default_rng(depth)
    span = (1 << depth) - 1 if depth else 0
    img = (100 + rng.integers(0, span + 1, size=(24, 24))).astype(np.uint8)
    if depth == 8:
        img = rng.integers(0, 256, size=(24, 24)).astype(np.uint8)
        img[0, 0], img[0, 1] = 0, 255
    assert codec_frame_bytes(img) == oracle_frame_bytes(img)


def test_device_roundtrip_batch():
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 256, size=(5, 37, 53)).astype(np.uint8)
    frames[2] = 123  # flat frame
    codec = DbdeCodec(height=37, width=53)
    out, n64 = codec.roundtrip(frames)
    np.testing.assert_array_equal(np.asarray(out), frames)
    assert int(n64[2]) == 0  # flat frame has zero payload


def test_decode_oracle_encoded_bytes():
    """Device decode must accept byte streams produced by the oracle."""
    rng = np.random.default_rng(11)
    frames = [rng.integers(0, 256, size=(19, 26)).astype(np.uint8) for _ in range(3)]
    records = [ref.pack_image(f) for f in frames]
    buf = b"".join(records)
    offsets = list(np.cumsum([0] + [len(r) for r in records[:-1]]))
    depths, mins, payload, n64 = unpack_frames_bytes(buf, 26, 19, offsets)
    codec = DbdeCodec(height=19, width=26)
    out = np.asarray(codec.decode(depths, mins, payload))
    for i, f in enumerate(frames):
        np.testing.assert_array_equal(out[i], f)


def test_encode_decode_cross_impl():
    """Oracle decodes what the device encodes, frame-byte level."""
    rng = np.random.default_rng(17)
    img = rng.integers(0, 64, size=(33, 41)).astype(np.uint8)
    raw = codec_frame_bytes(img, index=5)
    fh, out, n = ref.unpack_frame(raw, 41, 33)
    assert fh.ok and fh.index == 5 and n == len(raw)
    np.testing.assert_array_equal(out, img)


def test_unpack_frames_bytes_validation():
    img = np.zeros((10, 10), np.uint8)
    rec = bytearray(ref.pack_image(img))
    rec[0] ^= 1
    with pytest.raises(ValueError):
        unpack_frames_bytes(bytes(rec), 10, 10, [0])
