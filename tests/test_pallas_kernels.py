"""Pallas kernel parity vs the numpy oracle, run in interpreter mode on CPU.

The compiled kernels are exercised on real TPU hardware by the benchmark and
the verify flow; here we pin their *semantics* (bit-exact payload streams)
against the oracle for every depth and for ragged/multi-block shapes.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from dbde_tpu import ref_numpy as ref
from dbde_tpu.format import tile_grid


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(pl, "pallas_call", interp)


def _tile_module():
    import dbde_tpu.ops.pallas_kernels as pk

    return pk


def band_roundtrip_check(frames):
    """Differential check of the image-layout (band) kernels vs the oracle."""
    import dbde_tpu.ops.pallas_band as pb
    from dbde_tpu.format import tile_grid

    B, H, W = frames.shape
    h, w = tile_grid(W, H)
    T = h * w
    hp8 = pb.pad_rows(H, W)
    padded = np.zeros((B, hp8, W), np.uint8)
    padded[:, :H] = frames
    if 8 * h > H:  # format edge rule for the ragged last tile row
        padded[:, H : 8 * h] = frames[:, H - 1 : H]
    d, m, p = pb.encode_band_kernel(jnp.asarray(padded.view(np.uint32)))
    d = np.asarray(d).reshape(B, -1)
    m = np.asarray(m).reshape(B, -1)
    p = np.asarray(p)
    for b in range(B):
        exp = ref.pack_image(frames[b])
        np.testing.assert_array_equal(d[b, :T], np.frombuffer(exp, np.uint8, T, 4))
        np.testing.assert_array_equal(m[b, :T], np.frombuffer(exp, np.uint8, T, 8 + T))
        assert (d[b, T:] == 0).all()  # pad tiles emit nothing
        exp_p = np.frombuffer(exp, np.uint32, offset=12 + 2 * T)
        np.testing.assert_array_equal(p[b].reshape(-1)[: len(exp_p)], exp_p)
    img2 = pb.decode_band_kernel(
        jnp.asarray(d.reshape(B, -1, 128)), jnp.asarray(m.reshape(B, -1, 128)),
        jnp.asarray(p), W,
    )
    out = np.asarray(img2).view(np.uint8)[:, :H, :W]
    np.testing.assert_array_equal(out, frames)


def test_band_kernel_parity_ragged_rows():
    rng = np.random.default_rng(4)
    frames = (rng.integers(0, 256, (2, 43, 1024)) & rng.integers(0, 256, (2, 43, 1024))).astype(np.uint8)
    band_roundtrip_check(frames)


def test_band_kernel_parity_single_block_padded():
    """H=96 pads into ONE grid block at the CI geometry (conftest pins
    BANDS_MULT=2 → 128-row W=1024 blocks) — covers the in-block row-pad
    path only; the cross-block seams are covered by the nb >= 2 tests
    below."""
    rng = np.random.default_rng(5)
    frames = (rng.integers(0, 32, (1, 96, 1024)) + 40).astype(np.uint8)
    band_roundtrip_check(frames)


def test_band_kernel_parity_two_blocks_mixed():
    """nb=3 at the CI W=1024 geometry (H=300 → 384 rows, 128-row blocks;
    nb=2 at the shipped adaptive 256-row blocks): exercises the cross-block
    encode carry and the decode seam-crossing window prefetch
    (pallas_band.py nxt0 / g+1 < nb) — the code paths where the round-2 WAR
    race lived.  The serial cross-tile coupling these seams reimplement:
    dbde_util.cpp:150-158."""
    rng = np.random.default_rng(15)
    frames = (rng.integers(0, 256, (1, 300, 1024)) & rng.integers(0, 256, (1, 300, 1024))).astype(np.uint8)
    band_roundtrip_check(frames)


def test_band_kernel_parity_three_blocks_ragged():
    """Multi-block with a ragged last tile row (H=530 → nb=5 at the CI
    128-row blocks, nb=3 at the shipped 256-row blocks): the seam prefetch
    fires repeatedly and the final block carries pad tiles."""
    rng = np.random.default_rng(16)
    frames = (rng.integers(0, 64, (1, 530, 1024)) + 30).astype(np.uint8)
    band_roundtrip_check(frames)


def test_band_kernel_parity_wide_grid_full_depth():
    """Width 3072 → 48 lane-groups per block (> GROUPS_PER_STAGE): the
    stage must flush in chunks or later groups wrap modulo STAGE_ROWS and
    corrupt earlier payload rows (round-1 advisor finding, high severity)."""
    rng = np.random.default_rng(6)
    frames = rng.integers(0, 256, (1, 64, 3072)).astype(np.uint8)  # depth 8
    band_roundtrip_check(frames)


def test_band_kernel_parity_wide_grid_mixed_depth_two_blocks():
    """Wide grid with mixed depths AND nb=2 (H=160 → 256 rows): chunked
    stage flushes plus the block-seam prefetch crossing a chunked window
    pipeline — the exact compiled-jit configuration whose WAR race
    corrupted ~64% of pixels in round 2."""
    rng = np.random.default_rng(7)
    frames = (rng.integers(0, 256, (1, 160, 3072)) & rng.integers(0, 256, (1, 160, 3072))).astype(np.uint8)
    band_roundtrip_check(frames)


def test_band_kernel_variant_parity():
    """The compiled decode picks shorter gather-chain variants by content
    (pallas_band.DECODE_CHAIN_VARIANTS via lax.switch); interpreter runs
    compile only the worst case, so pin the reduced variants' byte parity
    here by forcing them on content that fits them (camera-like depths ≤ 4 →
    chain 11 suffices).  encode's pair_rows analogue measured slower and is
    not wired into production (DECODE_CHAIN_VARIANTS comment), but the
    parameter stays for experiments — pin its parity too."""
    import jax.numpy as jnp

    import dbde_tpu.ops.pallas_band as pb

    rng = np.random.default_rng(23)
    H, W = 48, 1024
    # depth <= 4 everywhere: every lane-group total <= 2*4*128 = 1024 words
    frames = (rng.integers(0, 16, (1, H, W)) + 100).astype(np.uint8)
    hp8 = pb.pad_rows(H, W)
    padded = np.zeros((1, hp8, W), np.uint8)
    padded[:, :H] = frames
    img32 = jnp.asarray(padded.view(np.uint32))
    d, m = pb.encode_depths_kernel(img32)
    meta = pb.stream_meta(d, W)
    p_full = pb.encode_payload_kernel(meta, img32, d, m, pair_rows=8)
    p_var = pb.encode_payload_kernel(meta, img32, d, m, pair_rows=5)
    h, w = tile_grid(W, H)
    T = h * w
    exp = ref.pack_image(frames[0])
    exp_p = np.frombuffer(exp, np.uint32, offset=12 + 2 * T)
    np.testing.assert_array_equal(np.asarray(p_var).reshape(-1)[: len(exp_p)], exp_p)
    np.testing.assert_array_equal(
        np.asarray(p_full).reshape(-1)[: len(exp_p)], exp_p
    )
    out_var = pb.decode_band_kernel(d, m, p_var, W, chain=11)
    np.testing.assert_array_equal(
        np.asarray(out_var).view(np.uint8)[:, :H, :W], frames
    )


def test_encode_compaction_strategy_parity():
    """The compaction-strategy flags (ENCODE_ROWCENTRIC_COMPACTION and its
    ENCODE_CHUNK_PREFETCH refinement — the branchless level-loop formulation
    of the depth-class split, see pallas_band.py flag docs) must be
    byte-identical to the production interleaved strategy.  Covers the
    multi-chunk path (W=3072 → groups > GROUPS_PER_STAGE, where prefetch
    emits chunk c+1's compaction before chunk c's splice and the carry
    crosses chunk seams) at mplanes=5, and the single-geometry full-depth
    mplanes=8 case.  Hardware numbers: tools/probe_rowcentric.py."""
    import dbde_tpu.ops.pallas_band as pb

    rng = np.random.default_rng(29)
    cases = [
        # (frames, mplanes): shallow multi-chunk wide grid; full-depth 1024
        ((rng.integers(0, 16, (1, 64, 3072)) + 100).astype(np.uint8), 5),
        (rng.integers(0, 256, (1, 96, 1024)).astype(np.uint8), 8),
    ]
    for frames, mp in cases:
        B, H, W = frames.shape
        h, w = tile_grid(W, H)
        T = h * w
        hp8 = pb.pad_rows(H, W)
        padded = np.zeros((B, hp8, W), np.uint8)
        padded[:, :H] = frames
        img32 = jnp.asarray(padded.view(np.uint32))
        d, m = pb.encode_depths_kernel(img32)
        meta = pb.stream_meta(d, W)
        exp = ref.pack_image(frames[0])
        exp_p = np.frombuffer(exp, np.uint32, offset=12 + 2 * T)
        orig = (pb.ENCODE_ROWCENTRIC_COMPACTION, pb.ENCODE_CHUNK_PREFETCH)
        try:
            for rc, pf in ((False, False), (True, False), (True, True)):
                pb.ENCODE_ROWCENTRIC_COMPACTION = rc
                pb.ENCODE_CHUNK_PREFETCH = pf
                p = np.asarray(
                    pb.encode_payload_kernel(meta, img32, d, m, mplanes=mp)
                ).reshape(-1)[: len(exp_p)]
                np.testing.assert_array_equal(p, exp_p, err_msg=str((W, rc, pf, mp)))
        finally:
            pb.ENCODE_ROWCENTRIC_COMPACTION, pb.ENCODE_CHUNK_PREFETCH = orig


def roundtrip_check(pk, frames):
    B, H, W = frames.shape
    h, w = tile_grid(W, H)
    T = h * w
    tp = pk.pad_tiles(T)
    kernel_in = pk.image_to_tiles_w(jnp.asarray(frames))

    d, m, p = pk.encode_tiles_kernel(kernel_in)
    d = np.asarray(d).reshape(B, -1)
    m = np.asarray(m).reshape(B, -1)
    p = np.asarray(p)
    for b in range(B):
        exp = ref.pack_image(frames[b])
        np.testing.assert_array_equal(d[b, :T], np.frombuffer(exp, np.uint8, T, 4))
        np.testing.assert_array_equal(m[b, :T], np.frombuffer(exp, np.uint8, T, 8 + T))
        exp_p = np.frombuffer(exp, np.uint32, offset=12 + 2 * T)
        np.testing.assert_array_equal(p[b].reshape(-1)[: len(exp_p)], exp_p)

    out_kernel = pk.decode_tiles_kernel(
        jnp.asarray(d.reshape(B, -1, 128)),
        jnp.asarray(m.reshape(B, -1, 128)),
        jnp.asarray(p),
    )
    out = np.asarray(pk.tiles_w_to_image(out_kernel, H, W))
    np.testing.assert_array_equal(out, frames)


def test_kernel_parity_mixed_depths():
    pk = _tile_module()
    rng = np.random.default_rng(0)
    frames = (rng.integers(0, 256, (2, 40, 48)) & rng.integers(0, 256, (2, 40, 48))).astype(np.uint8)
    roundtrip_check(pk, frames)


def test_kernel_parity_uniform_depths():
    """Every depth 0..8, including flat tiles and full-range tiles."""
    pk = _tile_module()
    rng = np.random.default_rng(1)
    img = np.zeros((24, 192), np.uint8)  # 3x24 tiles: one 8-col band per depth
    for d in range(9):
        span = (1 << d) - 1
        col = d * 21
        band = 50 + rng.integers(0, span + 1, size=(24, 21))
        img[:, col : col + 21] = band
    roundtrip_check(pk, img[None])


def test_kernel_parity_multiblock():
    """More than TILES_BLOCK tiles → exercises the cross-block cursor/carry."""
    pk = _tile_module()
    rng = np.random.default_rng(2)
    # 96x800 -> 12x100 = 1200 tiles > 1024
    frames = (rng.integers(0, 64, (1, 96, 800)) + 10).astype(np.uint8)
    roundtrip_check(pk, frames)


def test_block_pad_policy_inference_consistency():
    """pad_rows (the H-aware block-height policy) and n_bands(width, hp8)
    (the kernels' shape inference) must always agree: whatever padded
    height the policy emits, inference recovers exactly the block the
    policy chose — for every ladder width class and heights around every
    block boundary.  Also pins the motivating cases: 1080 rows pick
    128-row blocks (6.7% pad beats 18.5% at the 256-row optimum), exact
    multiples keep the tallest block, and a forced BANDS_MULT bypasses
    the policy (the CI pin)."""
    import dbde_tpu.ops.pallas_band as pb

    saved = pb.BANDS_MULT
    try:
        pb.BANDS_MULT = None
        for W in (1024, 2048, 3072, 5120, 8192, 15360):
            ladder = pb._bands_ladder(W, pb.BLOCK_GROUPS_CAP_DEC)
            for h in (1, 40, 63, 64, 65, 100, 127, 128, 129, 255, 256, 257,
                      511, 512, 1024, 1080, 2048, 2049):
                hp8 = pb.pad_rows(h, W)
                bands = pb.n_bands(W, hp8, pb.BLOCK_GROUPS_CAP_DEC)
                assert hp8 >= h and hp8 % (8 * bands) == 0
                cost = lambda b: (-(-h // (8 * b)) * 8 * b) * pb._block_penalty(8 * b)
                best = min(ladder, key=lambda b: (cost(b), -b))
                assert bands == best and hp8 == -(-h // (8 * best)) * 8 * best, (
                    W, h, hp8, bands, best)
                # the encode kernels' (shorter-ladder) inference always
                # divides the decode-ladder padding
                enc = pb.n_bands(W, hp8)
                assert hp8 % (8 * enc) == 0 and bands % enc == 0
        assert pb.pad_rows(1080, 2048) == 1152  # 128-row blocks
        assert pb.n_bands(2048, 1152) == 16
        assert pb.pad_rows(2048, 2048) == 2048  # flagship: tallest block
        assert pb.n_bands(2048, 2048) == 32
        assert pb.pad_rows(64, 3072) == 64      # small frames: short block
        pb.BANDS_MULT = 2
        assert pb.pad_rows(1080, 2048) == 1088 and pb.n_bands(2048) == 8
        assert pb.pad_rows(40, 1024) == 128 and pb.n_bands(1024) == 16
    finally:
        pb.BANDS_MULT = saved
