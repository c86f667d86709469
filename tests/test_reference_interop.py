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


TOOLS_DIR = os.path.join(os.path.dirname(__file__), "ref_tools")


def _build_tool(name: str, defines: tuple[str, ...] = (), suffix: str = "") -> str | None:
    """Compile a tests/ref_tools helper (walkdump/encdump) against the
    reference sources at -O0; cached in BUILD.  None if unbuildable.
    ``defines`` passes reference build variants (e.g. -DDBDE_HZ_AS_INTEGER,
    dbde_util.cpp:203-207) through to the compilation."""
    if not os.path.exists(os.path.join(REF_DIR, "dbde_util.cpp")):
        return None
    exe = os.path.join(BUILD, name + suffix)
    src = os.path.join(TOOLS_DIR, name + ".cpp")
    if os.path.exists(exe) and os.path.getmtime(exe) >= os.path.getmtime(src):
        return exe
    os.makedirs(BUILD, exist_ok=True)
    try:
        subprocess.run(
            ["g++", "-O0", "-std=c++14", "-march=corei7", "-I", REF_DIR,
             *defines, src, os.path.join(REF_DIR, "dbde_util.cpp"), "-o", exe + ".tmp"],
            check=True, capture_output=True, timeout=120,
        )
        os.replace(exe + ".tmp", exe)
        return exe
    except (subprocess.SubprocessError, OSError):
        return None


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


@pytest.mark.parametrize("geom", [(2536, 2048), (1080, 1920)])
def test_large_geometry_bytes_identical(lib, geom):
    """Band/bench geometries (incl. the reference driver's 2536x2048,
    dbde_util_test.cpp:303-349) byte-identical with the C library."""
    from dbde_tpu.codec import DbdeCodec, pack_frames_bytes
    from dbde_tpu.format import FRAME_HEADER_BYTES

    H, W = geom
    rng = np.random.default_rng(7)
    img = (rng.integers(0, 256, (H, W)) & rng.integers(0, 256, (H, W))).astype(np.uint8)
    codec = DbdeCodec(height=H, width=W)
    rec = pack_frames_bytes(codec.encode(img[None]))[0]
    theirs = ref_pack(lib, img)
    assert rec[FRAME_HEADER_BYTES:] == theirs
    np.testing.assert_array_equal(
        codec.decode(*_fields_from_bytes(theirs, W, H))[0], img
    )


def _fields_from_bytes(data: bytes, W: int, H: int):
    from dbde_tpu.codec import unpack_frames_bytes

    depths, mins, payload, _ = unpack_frames_bytes(data, W, H, [0])
    return depths, mins, payload


# ---------------------------------------------------------------------------
# L3 <-> L3: whole files through the reference's streaming file walker
# (dbde_start_file_walk / dbde_walk_a_file, dbde_util.cpp:362-426)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def walkdump():
    exe = _build_tool("walkdump")
    if exe is None:
        pytest.skip("cannot build reference walkdump tool")
    return exe


@pytest.fixture(scope="module")
def encdump():
    exe = _build_tool("encdump")
    if exe is None:
        pytest.skip("cannot build reference encdump tool")
    return exe


def _walk_file(exe, path, H, W):
    """Run the reference walker over ``path`` → ((N,H,W) pixels, [indices])."""
    import re

    out_raw = os.path.join(BUILD, "walk_out.raw")
    r = subprocess.run([exe, str(path), out_raw], capture_output=True,
                       timeout=300, text=True)
    assert r.returncode == 0, r.stderr
    blob = r.stdout + r.stderr
    assert "OVERRUN" not in blob and "UNDERRUN" not in blob
    n = int(re.search(r"frames=(\d+)", r.stdout).group(1))
    pixels = np.fromfile(out_raw, np.uint8).reshape(n, H, W)
    indices = [int(m.group(1)) for m in re.finditer(r"idx=(\d+)", r.stderr)]
    return pixels, indices


@pytest.mark.parametrize(
    "geom,kind,device",
    [((64, 128), "camera", True), ((43, 52), "masked", True),
     ((30, 40), "flat", False), ((61, 1024), "masked", True)],
)
def test_reference_walker_reads_our_files(walkdump, tmp_path, geom, kind, device):
    """Files written by DbdeWriter stream-decode bit-exactly through the
    reference's own file walker (aligned, ragged, flat, band geometries)."""
    from dbde_tpu.stream import DbdeWriter

    H, W = geom
    rng = np.random.default_rng(hash(geom) % 2**31)
    N = 11
    frames = np.stack([_content(rng, H, W, kind) for _ in range(N)])
    path = tmp_path / "ours.dbde"
    with DbdeWriter(path, height=H, width=W, frame_hz=99.25, device=device) as wr:
        wr.write(frames[:4])
        wr.write(frames[4:5])
        wr.write(frames[5:])
    pixels, indices = _walk_file(walkdump, path, H, W)
    assert pixels.shape[0] == N
    np.testing.assert_array_equal(pixels, frames)
    assert indices == list(range(N))


# ---------------------------------------------------------------------------
# DBDE_HZ_AS_INTEGER build variant: frame_hz stored as a rounded u64
# (dbde_util.cpp:203-207, 352-356).  The reference's own test driver never
# exercises this variant — its guard is misspelled DBDE_HZ_IN_INTEGER
# (dbde_util_test.cpp:149, SURVEY §5) — so these tests exchange files with a
# reference binary actually COMPILED with -DDBDE_HZ_AS_INTEGER.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def walkdump_hzint():
    exe = _build_tool("walkdump", defines=("-DDBDE_HZ_AS_INTEGER",), suffix="_hzint")
    if exe is None:
        pytest.skip("cannot build hz-as-integer reference walkdump")
    return exe


@pytest.fixture(scope="module")
def encdump_hzint():
    exe = _build_tool("encdump", defines=("-DDBDE_HZ_AS_INTEGER",), suffix="_hzint")
    if exe is None:
        pytest.skip("cannot build hz-as-integer reference encdump")
    return exe


def test_hzint_reference_walker_reads_our_files(walkdump_hzint, tmp_path):
    """DbdeWriter(hz_as_integer=True) files decode bit-exactly through a
    reference walker built with -DDBDE_HZ_AS_INTEGER, including the
    add-then-truncate hz rounding ((long long)(hz + 0.5))."""
    import re

    from dbde_tpu.stream import DbdeWriter

    H, W = 41, 67
    rng = np.random.default_rng(31)
    N = 6
    frames = np.stack([_content(rng, H, W, "masked") for _ in range(N)])
    path = tmp_path / "ours_hzint.dbde"
    with DbdeWriter(path, height=H, width=W, frame_hz=99.75, device=False,
                    hz_as_integer=True) as wr:
        wr.write(frames)
    out_raw = os.path.join(BUILD, "walk_hzint_out.raw")
    r = subprocess.run([walkdump_hzint, str(path), out_raw], capture_output=True,
                       timeout=300, text=True)
    assert r.returncode == 0, r.stderr
    # 99.75 + 0.5 truncates to 100; the variant reader surfaces it as 100.0
    assert re.search(r"hz=100\.0", r.stderr), r.stderr
    n = int(re.search(r"frames=(\d+)", r.stdout).group(1))
    assert n == N
    np.testing.assert_array_equal(
        np.fromfile(out_raw, np.uint8).reshape(N, H, W), frames
    )


def test_our_reader_reads_hzint_reference_files(encdump_hzint, tmp_path):
    """Files written by a -DDBDE_HZ_AS_INTEGER reference encoder parse
    through DbdeReader(hz_as_integer=True): hz comes back as the rounded
    integer (750.5 → 751.0) and pixels are exact."""
    from dbde_tpu.stream import read_video

    H, W = 29, 45
    N = 5
    rng = np.random.default_rng(33)
    frames = np.stack([_content(rng, H, W, "narrow") for _ in range(N)])
    raw = tmp_path / "in_hzint.raw"
    frames.tofile(raw)
    path = tmp_path / "theirs_hzint.dbde"
    r = subprocess.run([encdump_hzint, str(W), str(H), str(N), str(raw), str(path)],
                       capture_output=True, timeout=300, text=True)
    assert r.returncode == 0, r.stderr
    vh, headers, out = read_video(path, device=False, batch_size=2, hz_as_integer=True)
    assert (vh.height, vh.width) == (H, W)
    assert vh.frame_hz == 751.0  # (long long)(750.5 + 0.5)
    np.testing.assert_array_equal(out, frames)
    # the default (f64) parse of the same bytes must NOT round-trip the hz —
    # proves the variant actually changes the on-disk bytes
    vh2, _, _ = read_video(path, device=False, hz_as_integer=False)
    assert vh2.frame_hz != 751.0


def test_our_reader_reads_reference_walker_files(encdump, tmp_path):
    """Files encoded frame-by-frame by the reference library decode
    identically through DbdeReader (device and host paths)."""
    from dbde_tpu.stream import read_video

    H, W = 37, 53
    N = 7
    rng = np.random.default_rng(21)
    frames = np.stack([_content(rng, H, W, ["masked", "narrow", "flat"][i % 3]) for i in range(N)])
    raw = tmp_path / "in.raw"
    frames.tofile(raw)
    path = tmp_path / "theirs.dbde"
    r = subprocess.run([encdump, str(W), str(H), str(N), str(raw), str(path)],
                       capture_output=True, timeout=300, text=True)
    assert r.returncode == 0, r.stderr

    for device in (True, False):
        vh, headers, out = read_video(path, device=device, batch_size=3)
        assert (vh.height, vh.width) == (H, W)
        assert vh.frame_hz == 750.5
        assert [fh.index for fh in headers] == [i * 7 for i in range(N)]
        np.testing.assert_array_equal(out, frames)


def test_reference_file_decodes_on_mesh(encdump, tmp_path):
    """A file encoded by the reference's own binary decodes pixel-exactly
    through the sharded mesh path (read_video_sharded: host walker →
    split_payload_host → decode_sharded on a virtual 2×2 mesh) — the
    L3 ↔ multi-chip integration the reference does single-threaded inside
    its walk loop (dbde_util.cpp:408-421)."""
    from dbde_tpu.parallel import make_mesh, read_video_sharded

    H, W = 32, 44  # 4 tile rows → 2 per shard
    N = 5
    rng = np.random.default_rng(41)
    frames = np.stack([_content(rng, H, W, "masked") for _ in range(N)])
    raw = tmp_path / "in_mesh.raw"
    frames.tofile(raw)
    path = tmp_path / "theirs_mesh.dbde"
    r = subprocess.run([encdump, str(W), str(H), str(N), str(raw), str(path)],
                       capture_output=True, timeout=300, text=True)
    assert r.returncode == 0, r.stderr
    mesh = make_mesh(n_data=2, n_tiles=2)
    vh, headers, out = read_video_sharded(path, mesh, batch_size=2)
    assert (vh.height, vh.width) == (H, W)
    assert [fh.index for fh in headers] == [i * 7 for i in range(N)]
    np.testing.assert_array_equal(out, frames)
