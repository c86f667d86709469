"""DbdeCodec band-backend coverage on CPU (kernels in interpreter mode)."""

import numpy as np
import pytest
import jax
from jax.experimental import pallas as pl

from dbde_tpu import ref_numpy as ref


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(pl, "pallas_call", interp)


_CODECS: dict = {}


def get_codec(height, width, backend="band"):
    """Shared codec instances: jit caches live on the instance, so reusing
    one across tests of the same geometry saves minutes of interpreter-mode
    compile per test on a small CI runner."""
    key = (height, width, backend)
    if key not in _CODECS:
        from dbde_tpu.codec import DbdeCodec

        _CODECS[key] = DbdeCodec(height=height, width=width, backend=backend)
    return _CODECS[key]


@pytest.fixture()
def codec():
    return get_codec(40, 1024)


def test_band_codec_bytes_parity(codec):
    from dbde_tpu.codec import pack_frames_bytes

    rng = np.random.default_rng(0)
    frames = (rng.integers(0, 64, (2, 40, 1024)) + 20).astype(np.uint8)
    enc = codec.encode(frames)
    recs = pack_frames_bytes(enc, indices=[5, 6])
    for b in range(2):
        assert recs[b][20:] == ref.pack_image(frames[b])


def test_band_codec_decode_and_roundtrip(codec):
    rng = np.random.default_rng(1)
    frames = (rng.integers(0, 256, (2, 40, 1024)) & rng.integers(0, 256, (2, 40, 1024))).astype(np.uint8)
    enc = codec.encode(frames)
    out = codec.decode(enc.depths, enc.mins, enc.payload)
    np.testing.assert_array_equal(out, frames)
    out2, n64 = codec.roundtrip(frames)
    np.testing.assert_array_equal(out2, frames)
    assert (np.asarray(n64) > 0).all()


@pytest.mark.parametrize("geom", [(21, 76), (40, 1000)])
def test_band_codec_arbitrary_width(geom):
    """Non-multiple-of-1024 widths ride the band kernels via constant-column
    pad tiles (depth 0, zero payload words); bytes stay identical."""
    from dbde_tpu.codec import DbdeCodec, pack_frames_bytes

    H, W = geom
    rng = np.random.default_rng(3)
    frames = (rng.integers(0, 256, (2, H, W)) & rng.integers(0, 256, (2, H, W))).astype(np.uint8)
    codec = DbdeCodec(height=H, width=W, backend="band")
    enc = codec.encode(frames)
    recs = pack_frames_bytes(enc)
    for b in range(2):
        assert recs[b][20:] == ref.pack_image(frames[b])
    out = codec.decode(enc.depths, enc.mins, enc.payload)
    np.testing.assert_array_equal(out, frames)


def test_band_codec_odd_width_multiblock():
    """Odd width (W % 4 != 0) through the band materialize path — guards the
    strided-view fix in DbdeCodec.materialize (codec.py ascontiguousarray) —
    at a multi-block geometry.  Under the CI BANDS_MULT=2 pin W=1027 wide-
    folds k=2 onto Wp=1536 kernels (H=300 → 152 kernel rows → nb=2); the
    production adaptive geometry picks k=4 at Wp=1280 (nb from 64-row
    blocks) — same fold mechanics, covered on hardware by tpu_soak."""
    from dbde_tpu.codec import DbdeCodec, pack_frames_bytes

    H, W = 300, 1027
    rng = np.random.default_rng(8)
    frames = (rng.integers(0, 256, (1, H, W)) & rng.integers(0, 256, (1, H, W))).astype(np.uint8)
    codec = DbdeCodec(height=H, width=W, backend="band")
    assert codec.backend == "band"
    enc = codec.encode(frames)
    assert pack_frames_bytes(enc)[0][20:] == ref.pack_image(frames[0])
    out = codec.decode(enc.depths, enc.mins, enc.payload)
    np.testing.assert_array_equal(out, frames)


def test_band_codec_partial_group_depth8_tail():
    """Round-3 compaction-mask regression (kernel_common._mask_past_total).

    A lane-group with leading depth-0 tiles and a depth-8 LAST tile: the
    compaction slots past the group's word total clamp to that last tile
    with wm capped at 7 — real plane-14/15 data, not zeros — and the
    roll-splice OR'd it over the next group's stream head (16*F corrupt
    words for F flat tiles).  Camera/random/flat bench content never forms
    this pattern, so only this test guards it."""
    from dbde_tpu.codec import pack_frames_bytes

    rng = np.random.default_rng(3)
    H, W = 32, 1024  # 4 lane-groups, one per tile row
    frames = rng.integers(0, 256, (1, H, W)).astype(np.uint8)
    codecs = [get_codec(H, W, b) for b in ("band", "tiles")]
    for F in (1, 80, 127):  # flat leading tiles in group 1
        img = frames.copy()
        img[0, 8:16, : 8 * F] = 77
        for codec in codecs:  # same codec across F: shapes equal, jit cached
            enc = codec.encode(img)
            assert pack_frames_bytes(enc)[0][20:] == ref.pack_image(img[0]), (
                f"{codec.backend} F={F}")
            out = codec.decode(enc.depths, enc.mins, enc.payload)
            np.testing.assert_array_equal(out, img)


def test_band_codec_adaptive_reduced_planes():
    """Adaptive reduced-plane encode dispatch (codec.py ADAPT_MPLANES).

    Batch 1 (depth <= 5) runs the general kernel and records the max depth;
    batch 2 switches to the mplanes=5 variant (bytes must stay identical);
    batch 3 (full-depth content) mispredicts — the verify re-encode must
    restore the general kernel and still produce correct bytes."""
    from dbde_tpu.codec import DbdeCodec, pack_frames_bytes

    H, W = 32, 1024
    rng = np.random.default_rng(21)
    shallow = (rng.integers(0, 24, (1, H, W)) + 50).astype(np.uint8)  # depth<=5
    deep = rng.integers(0, 256, (1, H, W)).astype(np.uint8)  # depth 8
    codec = DbdeCodec(height=H, width=W, backend="band", adaptive=True)

    enc = codec.encode(shallow)
    assert codec._mplanes == 8  # no prediction before the first batch
    assert pack_frames_bytes(enc)[0][20:] == ref.pack_image(shallow[0])

    enc = codec.encode(shallow)
    assert codec._mplanes == 5  # sticky switch to the reduced variant
    assert pack_frames_bytes(enc)[0][20:] == ref.pack_image(shallow[0])

    enc = codec.encode(deep)  # misprediction: verify must re-encode
    assert codec._mplanes == 8
    assert pack_frames_bytes(enc)[0][20:] == ref.pack_image(deep[0])

    # deferred verification (the pipelined-writer contract): a mispredicted
    # defer_verify batch reports its depth bound instead of re-encoding;
    # the caller detects the violation from host depths and falls back
    codec.encode(shallow)  # prediction -> 5 again
    enc = codec.encode(deep, defer_verify=True)
    assert enc.depth_bound == 5
    assert int(np.asarray(enc.depths).max()) > enc.depth_bound
    enc = codec.encode_general(deep)
    assert enc.depth_bound is None and codec._mplanes == 8
    assert pack_frames_bytes(enc)[0][20:] == ref.pack_image(deep[0])


@pytest.mark.parametrize("geom", [(520, 128), (40, 53)])
def test_band_codec_row_folding(geom):
    """Narrow widths fold k consecutive tile rows per kernel row
    (codec.band_fold) — byte-stream invariant, multi-super-row (k=8),
    ragged last fold, ragged width (k=16)."""
    from dbde_tpu.codec import band_fold, pack_frames_bytes

    H, W = geom
    Wp, k = band_fold(W)
    assert k > 1 and k * Wp == 1024
    rng = np.random.default_rng(11)
    frames = rng.integers(0, 256, (2, H, W)).astype(np.uint8)
    frames[0, : H // 3] = 77  # flat head: depth-0 tiles inside real folds
    codec = get_codec(H, W)
    enc = codec.encode(frames)
    recs = pack_frames_bytes(enc)
    for b in range(2):
        assert recs[b][20:] == ref.pack_image(frames[b])
    out = codec.decode(enc.depths, enc.mins, enc.payload)
    np.testing.assert_array_equal(out, frames)


def test_band_fold_wide_selection():
    """band_fold's wide-width chooser: k-row folds cut the column pad when
    the padded row is a multiple of 128/k tiles, candidates that exceed
    BLOCK_GROUPS_CAP at the *effective* block geometry are skipped, and
    ties go to the smaller k."""
    from dbde_tpu.codec import band_fold
    from dbde_tpu.ops import pallas_band as pb

    saved = pb.BANDS_MULT
    try:
        pb.BANDS_MULT = None  # production adaptive blocks
        assert band_fold(2536, 256) == (2560, 2)  # 21% col pad -> 0.9%
        assert band_fold(2048, 256) == (2048, 1)  # exact fit: no fold
        assert band_fold(1920, 135) == (2048, 1)  # k=8 (zero pad) > groups cap
        assert band_fold(1027, 38) == (1280, 4)   # 98% col pad -> 24%
        assert band_fold(1200, 256) == (1280, 4)
        pb.BANDS_MULT = 2  # the CI pin doubles groups: k=4/Wk=5120 excluded
        assert band_fold(2536, 256) == (3072, 1)
        assert band_fold(1200, 256) == (1536, 2)
        assert band_fold(1200, 3) == (2048, 1)    # fold-row pad (3->4) ties
        #   k=2 back to k=1 at this tiny height; ties go to the smaller k
    finally:
        pb.BANDS_MULT = saved
    # narrow behavior unchanged (independent of block geometry)
    assert band_fold(320) == (512, 2)
    assert band_fold(53) == (64, 16)
    assert band_fold(1024) == (1024, 1)


def test_band_codec_wide_fold():
    """Wide-width row folding (k=2 at Wp=1536 under the CI pin): column-pad
    tiles inside each fold half, a ragged last fold (5 tile rows -> 6), and
    a flat stripe (depth-0 tiles inside real folds).  Byte stream must be
    fold-invariant."""
    from dbde_tpu.codec import band_fold, pack_frames_bytes

    H, W = 40, 1200
    assert band_fold(W, -(-H // 8)) == (1536, 2)
    rng = np.random.default_rng(17)
    frames = (rng.integers(0, 256, (2, H, W)) & rng.integers(0, 256, (2, H, W))).astype(np.uint8)
    frames[0, :8] = 9  # flat tile row: depth-0 tiles inside a real fold
    codec = get_codec(H, W)
    enc = codec.encode(frames)
    recs = pack_frames_bytes(enc)
    for b in range(2):
        assert recs[b][20:] == ref.pack_image(frames[b])
    out = codec.decode(enc.depths, enc.mins, enc.payload)
    np.testing.assert_array_equal(out, frames)


def test_band_codec_row_folding_device_input():
    """Device-array inputs take the XLA pad+fold path in _to_img32 (same
    geometry as the folding test above — the host-path codec's jit cache
    does not apply because the traced input placement differs)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(12)
    frames = (rng.integers(0, 200, (2, 40, 53)) + 9).astype(np.uint8)
    codec = get_codec(40, 53)
    enc = codec.encode(jnp.asarray(frames))
    out = codec.decode(enc.depths, enc.mins, enc.payload)
    np.testing.assert_array_equal(out, frames)


def test_band_codec_device_array_input(codec):
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    frames = (rng.integers(0, 32, (1, 40, 1024)) + 7).astype(np.uint8)
    enc = codec.encode(jnp.asarray(frames))  # device path: XLA pad + bitcast
    out = codec.decode(enc.depths, enc.mins, enc.payload)
    np.testing.assert_array_equal(out, frames)


@pytest.mark.parametrize("seed,maxd", [(0, 8), (1, 5), (2, 1)])
def test_band_codec_adversarial_depths(codec, seed, maxd):
    """Seeded adversarial-content fuzz through the band kernels: every tile
    realizes an exact target depth, weighted toward the corner cases that
    have bitten (depth-0 runs, depth-8 tiles ending non-full groups, full-
    range minima) — the CI companion of tools/tpu_soak.py's on-device
    randomized sweep.  Reuses the (40, 1024) codec so the interpreter-mode
    kernels compile once for the module."""
    from dbde_tpu.bench_core import make_adversarial
    from dbde_tpu.codec import pack_frames_bytes

    frames = make_adversarial(1024, 40, 2, maxd=maxd, seed=seed)
    enc = codec.encode(frames)
    recs = pack_frames_bytes(enc)
    for b in range(2):
        assert recs[b][20:] == ref.pack_image(frames[b]), (seed, maxd, b)
    out = codec.decode(enc.depths, enc.mins, enc.payload)
    np.testing.assert_array_equal(out, frames)
