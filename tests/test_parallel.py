"""Multi-chip sharding tests on a virtual 8-device CPU mesh (conftest.py)."""

import numpy as np
import pytest
import jax

from dbde_tpu import ref_numpy as ref
from dbde_tpu.parallel import (
    decode_sharded,
    encode_sharded,
    iter_video_sharded,
    make_mesh,
    read_video_sharded,
    sharded_roundtrip_step,
    split_payload_host,
    write_video_sharded,
)
from dbde_tpu.parallel.sharding import (
    assemble_payload_host,
    assemble_payload_padded,
)


def _frames(B=4, H=48, W=40, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.integers(0, 32, size=(B, H, W)) + 50).astype(np.uint8)


def test_mesh_construction():
    mesh = make_mesh(n_data=4, n_tiles=2)
    assert mesh.shape == {"data": 4, "tiles": 2}
    mesh = make_mesh(n_tiles=2)
    import jax

    assert mesh.shape["data"] == len(jax.devices()) // 2
    assert mesh.shape["tiles"] == 2


@pytest.mark.parametrize("n_data,n_tiles", [(2, 1), (1, 2), (4, 2), (2, 3)])
def test_sharded_encode_matches_oracle(n_data, n_tiles):
    mesh = make_mesh(n_data=n_data, n_tiles=n_tiles)
    frames = _frames(B=n_data * 2, H=8 * 6, W=21)  # h=6 divides 1,2,3
    depth, mn, payload, totals, bases, Hp = encode_sharded(frames, mesh)
    payloads = assemble_payload_host(payload, totals)

    for b in range(frames.shape[0]):
        expected = ref.pack_image(frames[b])
        T = 6 * 3  # h=6, w=ceil(21/8)=3
        exp_depths = np.frombuffer(expected, np.uint8, T, 4)
        exp_mins = np.frombuffer(expected, np.uint8, T, 8 + T)
        exp_payload = np.frombuffer(expected, np.uint32, offset=12 + 2 * T)
        np.testing.assert_array_equal(np.asarray(depth)[b], exp_depths)
        np.testing.assert_array_equal(np.asarray(mn)[b], exp_mins)
        np.testing.assert_array_equal(payloads[b], exp_payload)


def test_sharded_encode_rejects_uneven_bands():
    mesh = make_mesh(n_data=2, n_tiles=4)
    with pytest.raises(ValueError):
        encode_sharded(_frames(B=2, H=8 * 6, W=16), mesh)  # 6 tiles % 4 != 0


@pytest.mark.parametrize("n_data,n_tiles", [(2, 2), (1, 4)])
def test_sharded_decode_roundtrip(n_data, n_tiles):
    mesh = make_mesh(n_data=n_data, n_tiles=n_tiles)
    frames = _frames(B=n_data * 3, H=8 * 4, W=30, seed=3)
    depth, mn, payload, totals, bases, Hp = encode_sharded(frames, mesh)
    out = decode_sharded(depth, mn, payload, mesh, H=frames.shape[1], W=30, Hp=Hp)
    np.testing.assert_array_equal(np.asarray(out), frames)


def test_sharded_roundtrip_step_ragged():
    """The fused dp+sp step handles ragged H via internal band padding."""
    mesh = make_mesh(n_data=2, n_tiles=2)
    frames = _frames(B=4, H=37, W=29, seed=9)  # ragged both dims
    out, n64 = sharded_roundtrip_step(frames, mesh)
    np.testing.assert_array_equal(np.asarray(out), frames)
    assert int(n64) > 0


def test_sharded_encode_to_whole_file():
    """Full multi-chip → file path: sharded encode, host ragged assembly,
    whole-file equality with the single-host oracle encoding."""
    import struct

    from dbde_tpu.format import VideoHeader, FrameHeader

    mesh = make_mesh(n_data=2, n_tiles=2)
    frames = _frames(B=4, H=8 * 4, W=24, seed=11)
    H, W = 32, 24
    depth, mn, payload, totals, bases, Hp = encode_sharded(frames, mesh)
    payloads = assemble_payload_host(payload, totals)
    depth, mn = np.asarray(depth), np.asarray(mn)
    T = depth.shape[1]

    out = [VideoHeader(height=H, width=W, frame_hz=7.0).pack()]
    for b in range(frames.shape[0]):
        n64 = int(len(payloads[b]) // 2)
        out.append(FrameHeader(index=b).pack())
        out.append(struct.pack("<i", T) + depth[b].tobytes())
        out.append(struct.pack("<i", T) + mn[b].tobytes())
        out.append(struct.pack("<i", n64) + payloads[b].tobytes())
    sharded_file = b"".join(out)

    expected = ref.encode_video(list(frames), frame_hz=7.0)
    assert sharded_file == expected


def test_sharded_matches_global_n64():
    mesh = make_mesh(n_data=1, n_tiles=2)
    frames = _frames(B=2, H=32, W=32, seed=4)
    depth, mn, payload, totals, bases, Hp = encode_sharded(frames, mesh)
    # totals sum = 2 * n64 per frame
    exp = [ref.pack_image(f) for f in frames]
    import struct

    for b, e in enumerate(exp):
        T = 4 * 4
        (n64,) = struct.unpack_from("<i", e, 8 + 2 * T)
        assert int(np.asarray(totals)[:, b].sum()) == 2 * n64
        # bases are the exclusive scan of totals
        np.testing.assert_array_equal(
            np.asarray(bases)[:, b],
            np.concatenate([[0], np.cumsum(np.asarray(totals)[:-1, b])]),
        )


def test_sharded_band_backend_byte_parity():
    """The compiled-kernel (Pallas band, interpreter mode here) sharded path:
    per-shard segments assemble to the byte-identical global stream and the
    fused roundtrip step recovers pixels exactly."""
    mesh = make_mesh(n_data=1, n_tiles=2)
    rng = np.random.default_rng(13)
    H, W = 16, 1024  # h=2 tile rows -> 1 per shard
    frames = (rng.integers(0, 256, (1, H, W)) & rng.integers(0, 256, (1, H, W))).astype(np.uint8)
    depth, mn, payload, totals, bases, Hp = encode_sharded(frames, mesh, backend="band")
    payloads = assemble_payload_host(payload, totals)
    expected = ref.pack_image(frames[0])
    T = 2 * 128
    np.testing.assert_array_equal(np.asarray(depth)[0], np.frombuffer(expected, np.uint8, T, 4))
    np.testing.assert_array_equal(np.asarray(mn)[0], np.frombuffer(expected, np.uint8, T, 8 + T))
    np.testing.assert_array_equal(payloads[0], np.frombuffer(expected, np.uint32, offset=12 + 2 * T))

    out = decode_sharded(depth, mn, payload, mesh, H=H, W=W, Hp=Hp, backend="band")
    np.testing.assert_array_equal(out, frames)


def test_sharded_band_narrow_width_folded():
    """Explicit backend="band" at a narrow width: the shard bodies reuse the
    single-chip fold adapters (codec.band_fold — W=64 folds k=16 tile rows
    per kernel row), so the Pallas band kernels serve sharded narrow frames
    too.  Byte parity with the oracle pins the fold's stream invariance
    across the shard split."""
    mesh = make_mesh(n_data=1, n_tiles=2)
    rng = np.random.default_rng(23)
    H, W = 32, 64  # h=4 tile rows -> 2 per shard, each folded into one row
    frames = (rng.integers(0, 256, (1, H, W)) & rng.integers(0, 256, (1, H, W))).astype(np.uint8)
    depth, mn, payload, totals, bases, Hp = encode_sharded(frames, mesh, backend="band")
    payloads = assemble_payload_host(payload, totals)
    expected = ref.pack_image(frames[0])
    T = 4 * 8
    np.testing.assert_array_equal(np.asarray(depth)[0], np.frombuffer(expected, np.uint8, T, 4))
    np.testing.assert_array_equal(payloads[0], np.frombuffer(expected, np.uint32, offset=12 + 2 * T))
    out = decode_sharded(depth, mn, payload, mesh, H=H, W=W, Hp=Hp, backend="band")
    np.testing.assert_array_equal(out, frames)


def test_split_payload_inverse_of_assemble():
    """split_payload_host reconstructs decode-ready per-shard segments from
    a file-flat payload: live prefixes byte-equal the device's own segments
    and the mesh decode of the split is pixel-exact."""
    mesh = make_mesh(n_data=2, n_tiles=2)
    frames = _frames(B=4, H=32, W=30, seed=7)
    depth, mn, payload, totals, bases, Hp = encode_sharded(frames, mesh, backend="xla")
    pays = assemble_payload_host(payload, totals)
    mx = max(p.size for p in pays)
    flat = np.zeros((4, mx), np.uint32)
    for b, p in enumerate(pays):
        flat[b, : p.size] = p
    segs = split_payload_host(flat, np.asarray(depth), 32, 30, 2, backend="xla")
    assert segs.shape == np.asarray(payload).shape
    t = np.asarray(totals)
    dev = np.asarray(payload).reshape(4, 2, -1)
    sp = segs.reshape(4, 2, -1)
    for b in range(4):
        for s in range(2):
            np.testing.assert_array_equal(sp[b, s, : t[s, b]], dev[b, s, : t[s, b]])
    out = decode_sharded(np.asarray(depth), np.asarray(mn), segs, mesh,
                         H=32, W=30, Hp=Hp, backend="xla")
    np.testing.assert_array_equal(out, frames)


@pytest.mark.parametrize("backend", ["xla", "band"])
def test_decode_tolerates_garbage_segment_tails(backend):
    """Segment slot words past each shard's live count must never reach the
    output: the decode window gathers mask dead lanes by depth.  This is
    the invariant that lets split_payload_host skip the worst-case zero
    fill (np.empty slots)."""
    mesh = make_mesh(n_data=2, n_tiles=2)
    if backend == "band":
        rng = np.random.default_rng(11)
        H, W = 16, 1024
        frames = (rng.integers(0, 256, (2, H, W))
                  & rng.integers(0, 256, (2, H, W))).astype(np.uint8)
    else:
        H, W = 32, 30
        frames = _frames(B=4, H=H, W=W, seed=13)
    B = frames.shape[0]
    depth, mn, payload, totals, bases, Hp = encode_sharded(
        frames, mesh, backend=backend)
    t = np.asarray(totals)
    segs = np.asarray(payload).reshape(B, 2, -1).copy()
    for b in range(B):
        for s in range(2):
            segs[b, s, t[s, b]:] = 0xDEADBEEF % (1 << 32)
    out = decode_sharded(np.asarray(depth), np.asarray(mn),
                         segs.reshape(B, -1), mesh, H=H, W=W, Hp=Hp,
                         backend=backend)
    np.testing.assert_array_equal(out, frames)


def test_assemble_payload_padded_matches_ragged():
    """The writer-side padded assembly equals the ragged per-frame concat on
    every live prefix (rows are np.empty-padded past 2*n64)."""
    mesh = make_mesh(n_data=2, n_tiles=2)
    frames = _frames(B=4, H=32, W=30, seed=5)
    depth, mn, payload, totals, bases, Hp = encode_sharded(frames, mesh, backend="xla")
    pay, n64 = assemble_payload_padded(payload, totals)
    t = np.asarray(totals)
    segments = np.asarray(payload).reshape(4, 2, -1)
    for b in range(4):
        expected = np.concatenate([segments[b, s, : t[s, b]] for s in range(2)])
        assert 2 * int(n64[b]) == expected.size
        np.testing.assert_array_equal(pay[b, : expected.size], expected)


def test_iter_video_sharded_bounded_walker(tmp_path):
    """The sharded walker yields batch-sized chunks (bounded memory, never
    the whole video), agrees with read_video_sharded frame-for-frame, and
    handles a tail batch that doesn't fill the data axis."""
    mesh = make_mesh(n_data=2, n_tiles=2)
    frames = _frames(B=7, H=32, W=24, seed=23)  # 7 frames, batch 4 → 4+3
    p = tmp_path / "w.dbde"
    write_video_sharded(p, frames, mesh, frame_hz=2.0, batch_size=4)
    seen, sizes = [], []
    for headers, chunk in iter_video_sharded(p, mesh, batch_size=4):
        assert chunk.shape[0] == len(headers)
        sizes.append(chunk.shape[0])
        seen.append(chunk)
    assert sizes == [4, 3]
    np.testing.assert_array_equal(np.concatenate(seen), frames)
    vh, headers, out = read_video_sharded(p, mesh, batch_size=4)
    np.testing.assert_array_equal(out, frames)
    assert [h.index for h in headers] == list(range(7))


def test_sharded_file_write_and_read(tmp_path):
    """The sharded file layer: write_video_sharded produces bytes identical
    to the single-host oracle encoding (incl. a tail batch that doesn't fill
    the data axis), and read_video_sharded decodes the file pixel-exactly
    through the mesh."""
    mesh = make_mesh(n_data=2, n_tiles=2)
    frames = _frames(B=5, H=32, W=24, seed=21)  # N=5: tail pads the data axis
    p = tmp_path / "s.dbde"
    write_video_sharded(p, frames, mesh, frame_hz=7.0, batch_size=4)
    assert p.read_bytes() == ref.encode_video(list(frames), frame_hz=7.0)
    vh, headers, out = read_video_sharded(p, mesh, batch_size=4)
    assert vh.frame_hz == 7.0
    assert [h.index for h in headers] == list(range(5))
    np.testing.assert_array_equal(out, frames)


def test_sharded_file_band_backend(tmp_path):
    """Sharded file write/read through the compiled band kernels
    (interpreter mode on the virtual mesh): byte parity with the oracle and
    pixel-exact mesh decode of the file's flat payload."""
    mesh = make_mesh(n_data=1, n_tiles=2)
    rng = np.random.default_rng(29)
    H, W = 16, 1024
    frames = (rng.integers(0, 256, (2, H, W)) & rng.integers(0, 256, (2, H, W))).astype(np.uint8)
    p = tmp_path / "sb.dbde"
    write_video_sharded(p, frames, mesh, frame_hz=3.0, backend="band")
    assert p.read_bytes() == ref.encode_video(list(frames), frame_hz=3.0)
    vh, headers, out = read_video_sharded(p, mesh, backend="band")
    np.testing.assert_array_equal(out, frames)


def test_sharded_band_fused_multiblock():
    """The fused band sharded_roundtrip_step on a 2x2 virtual mesh with
    MULTI-BLOCK shards: n_data=2 (one frame per data shard), n_tiles=2 with
    34 tile rows per shard (H=544 → L=272 real rows → 512 padded → nb=2 per
    shard at the adaptive 256-row W=1024 blocks).  Covers what the
    byte-parity test above cannot:
    several tile rows per shard, the cross-block seam pipeline inside each
    shard, and the fused encode→decode program with the cross-mesh psum."""
    mesh = make_mesh(n_data=2, n_tiles=2)
    rng = np.random.default_rng(17)
    H, W = 544, 1024
    frames = (rng.integers(0, 256, (2, H, W)) & rng.integers(0, 256, (2, H, W))).astype(np.uint8)
    out, n64 = sharded_roundtrip_step(frames, mesh, backend="band")
    np.testing.assert_array_equal(out, frames)
    import struct

    exp_n64 = 0
    for b in range(2):
        e = ref.pack_image(frames[b])
        T = (H // 8) * (W // 8)
        exp_n64 += struct.unpack_from("<i", e, 8 + 2 * T)[0]
    assert int(n64) == exp_n64
