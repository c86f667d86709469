"""PGM reader/writer parity (the reference's dbde_dump_pgm analogue)."""

import numpy as np

from dbde_tpu.utils.visualize import ascii_preview, read_pgm, write_pgm


def test_pgm_p2_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (17, 23)).astype(np.uint8)
    p = tmp_path / "f.pgm"
    write_pgm(p, img)
    np.testing.assert_array_equal(read_pgm(p), img)


def test_pgm_p5_8bit(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (5, 7)).astype(np.uint8)
    img[0, 0] = 0x20  # raster starts with a whitespace byte: must not be eaten
    p = tmp_path / "f.pgm"
    p.write_bytes(b"P5\n7 5\n255\n" + img.tobytes())
    np.testing.assert_array_equal(read_pgm(p), img)


def test_pgm_p5_maxval_scaling(tmp_path):
    # maxval < 255: values scale onto [0, 255] like the P2 branch
    img = np.array([[0, 7, 15]], np.uint8)
    p = tmp_path / "f.pgm"
    p.write_bytes(b"P5 3 1 15 " + img.tobytes())
    np.testing.assert_array_equal(read_pgm(p), (img.astype(np.int64) * 255 // 15))


def test_pgm_p5_16bit(tmp_path):
    # maxval >= 256: two big-endian bytes per pixel
    vals = np.array([[0, 1234, 65535]], ">u2")
    p = tmp_path / "f.pgm"
    p.write_bytes(b"P5\n3 1\n65535\n" + vals.tobytes())
    expect = (vals.astype(np.int64) * 255 // 65535).astype(np.uint8)
    np.testing.assert_array_equal(read_pgm(p), expect)


def test_ascii_preview_flat():
    # flat region must not divide by zero and renders the lowest glyph
    out = ascii_preview(np.full((64, 64), 9, np.uint8))
    assert out and set(out.replace("\n", "")) == {" "}
