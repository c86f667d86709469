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


@pytest.fixture()
def codec():
    from dbde_tpu.codec import DbdeCodec

    return DbdeCodec(height=40, width=1024, backend="band")


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
    at a multi-block geometry (W=1027 → Wp=2048, adaptive 256-row blocks;
    H=300 pads to 512 → nb=2)."""
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


def test_band_codec_device_array_input(codec):
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    frames = (rng.integers(0, 32, (1, 40, 1024)) + 7).astype(np.uint8)
    enc = codec.encode(jnp.asarray(frames))  # device path: XLA pad + bitcast
    out = codec.decode(enc.depths, enc.mins, enc.payload)
    np.testing.assert_array_equal(out, frames)
