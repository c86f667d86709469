"""Streaming file layer tests: reader/writer parity with the oracle."""

import io

import numpy as np
import pytest

from dbde_tpu import ref_numpy as ref
from dbde_tpu.stream import DbdeReader, DbdeWriter, read_video, scan_record_size, write_video


@pytest.fixture(scope="module")
def frames():
    rng = np.random.default_rng(5)
    f = (rng.integers(0, 64, size=(23, 21, 34)) + 100).astype(np.uint8)
    f[7] = 42  # flat
    return f


def test_writer_matches_oracle_bytes(tmp_path, frames):
    p = tmp_path / "a.dbde"
    write_video(p, frames, frame_hz=250.0, device=True, batch_size=7)
    expected = ref.encode_video(list(frames), frame_hz=250.0)
    assert p.read_bytes() == expected


def test_writer_host_backend_matches(tmp_path, frames):
    p = tmp_path / "b.dbde"
    write_video(p, frames, frame_hz=250.0, device=False)
    assert p.read_bytes() == ref.encode_video(list(frames), frame_hz=250.0)


@pytest.mark.parametrize("device", [True, False])
@pytest.mark.parametrize("batch", [1, 4, 64])
def test_reader_roundtrip(tmp_path, frames, device, batch):
    p = tmp_path / f"c_{device}_{batch}.dbde"
    write_video(p, frames, frame_hz=99.0, device=False)
    vh, headers, out = read_video(p, device=device, batch_size=batch)
    assert vh.frame_hz == 99.0
    assert [h.index for h in headers] == list(range(len(frames)))
    np.testing.assert_array_equal(out, frames)


def test_reader_small_chunks(tmp_path, frames):
    """Force many buffer refills: chunk smaller than a record."""
    p = tmp_path / "d.dbde"
    write_video(p, frames, device=False)
    r = DbdeReader(p, batch_size=3, device=False)
    r._chunk = 64  # pathological refill size
    headers, out = r.read_all()
    r.close()
    np.testing.assert_array_equal(out, frames)


def test_reader_stops_at_corruption(tmp_path, frames):
    p = tmp_path / "e.dbde"
    write_video(p, frames[:5], device=False)
    raw = bytearray(p.read_bytes())
    # corrupt the 4th frame's record (frame sizes are equal here except flat)
    sizes = [len(ref.pack_frame(i, frames[i])) for i in range(5)]
    off = 28 + sum(sizes[:3])
    raw[off] ^= 0xFF  # break u64s field of frame header
    p.write_bytes(bytes(raw))
    vh, headers, out = read_video(p, device=False)
    assert len(headers) == 3
    np.testing.assert_array_equal(out, frames[:3])


def test_reader_truncated_tail(tmp_path, frames):
    p = tmp_path / "f.dbde"
    write_video(p, frames[:4], device=False)
    raw = p.read_bytes()
    p.write_bytes(raw[:-17])
    vh, headers, out = read_video(p, device=False)
    assert len(headers) == 3


def test_scan_record_size_validates():
    img = np.zeros((8, 8), np.uint8)
    rec = ref.pack_frame(0, img)
    assert scan_record_size(rec, 0, 1) == len(rec)
    assert scan_record_size(rec[:-1], 0, 1) is None
    bad = bytearray(rec)
    bad[20] ^= 1  # depth count
    assert scan_record_size(bytes(bad), 0, 1) is None


def test_write_to_filelike(frames):
    buf = io.BytesIO()
    with DbdeWriter(buf, height=21, width=34, frame_hz=10.0, device=False) as w:
        w.write(frames[:3])
    data = buf.getvalue()
    assert data == ref.encode_video(list(frames[:3]), frame_hz=10.0)


def test_write_device_to_filelike_matches(frames):
    """device=True with a BytesIO sink: no fd for the vectored-write fast
    path, so the assembled-records branch must produce identical bytes."""
    buf = io.BytesIO()
    with DbdeWriter(buf, height=21, width=34, frame_hz=10.0, device=True) as w:
        w.write(frames[:5])
    assert buf.getvalue() == ref.encode_video(list(frames[:5]), frame_hz=10.0)


def test_reader_reuse_buffers_parity(tmp_path, frames):
    """Pooled parse buffers (reuse_buffers=N) yield the same fields batch by
    batch; a batch's arrays are valid until N more batches are read."""
    p = tmp_path / "h.dbde"
    write_video(p, frames, device=False)
    with DbdeReader(p, batch_size=4, device=False) as r:
        want = [(hs, [np.array(a) for a in arrs]) for hs, arrs in r.iter_raw()]
    with DbdeReader(p, batch_size=4, device=False, reuse_buffers=2) as r:
        got = [(hs, [np.array(a) for a in arrs]) for hs, arrs in r.iter_raw()]
    assert len(got) == len(want) > 1
    for (h1, a1), (h2, a2) in zip(want, got):
        assert [x.index for x in h1] == [x.index for x in h2]
        for x, y in zip(a1, a2):
            np.testing.assert_array_equal(x, y)


def test_pooled_batches_gated_slot_reuse(tmp_path, frames):
    """The device iterator's release-gated parse pool (_pooled_batches):
    a slot is reused ONLY after its release() — the invariant that makes
    pooled parsing legal under async device dispatch (an unreleased batch's
    buffers must survive untouched however many batches follow)."""
    p = tmp_path / "i.dbde"
    write_video(p, frames, device=False)
    with DbdeReader(p, batch_size=4, device=False) as r:
        want = [(hs, [np.array(a) for a in arrs]) for hs, arrs in r.iter_raw()]

    # no releases: every batch gets fresh buffers; early batches' arrays
    # stay valid (and correct) after the whole file has been parsed
    with DbdeReader(p, batch_size=4, device=False) as r:
        if r._native is None:
            pytest.skip("native parser unavailable")
        held = [(hs, arrs) for hs, arrs, release in r._pooled_batches()]
    ids = [id(arrs[2]) for _, arrs in held]
    assert len(set(ids)) == len(ids)  # distinct payload buffers throughout
    for (h1, a1), (h2, a2) in zip(want, held):
        assert [x.index for x in h1] == [x.index for x in h2]
        for x, y in zip(a1, a2):
            np.testing.assert_array_equal(x, y)

    # pipeline-depth releases (as _iter_device sequences them): slots DO
    # get reused — bounded allocation — and the batch contents still match
    import collections

    with DbdeReader(p, batch_size=4, device=False) as r:
        it = r._pooled_batches()
        inflight = collections.deque()
        got, ids = [], []
        for hs, arrs, release in it:
            got.append((hs, [np.array(a) for a in arrs]))
            ids.append(id(arrs[2]))
            inflight.append(release)
            if len(inflight) > r.pipeline:
                inflight.popleft()()
    full = [i for i, (_, a) in enumerate(got) if a[0].shape[0] == 4]
    assert len(set(ids[i] for i in full)) <= r.pipeline + 1  # slots reused
    for (h1, a1), (h2, a2) in zip(want, got):
        assert [x.index for x in h1] == [x.index for x in h2]
        for x, y in zip(a1, a2):
            np.testing.assert_array_equal(x, y)


def test_elapsed_ns_and_indices_roundtrip(tmp_path, frames):
    p = tmp_path / "g.dbde"
    with DbdeWriter(p, height=21, width=34, device=True) as w:
        w.write(frames[:3], indices=[10, 20, 30], elapsed_ns=[0, 5_000_000, 10_000_000])
    vh, headers, out = read_video(p, device=False)
    assert [h.index for h in headers] == [10, 20, 30]
    assert [h.elapsed_ns for h in headers] == [0, 5_000_000, 10_000_000]
