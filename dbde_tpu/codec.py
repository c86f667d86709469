"""Public device codec API: batched DBDE encode/decode under ``jax.jit``.

Mirrors the reference's L1/L2 surface (dbde_util.h:21-37) in array-in/
array-out style:

  * :class:`DbdeCodec` — per-(H, W) compiled encode/decode over frame batches;
  * :func:`pack_frames_bytes` / :func:`unpack_frames_bytes` — host glue
    between device arrays and the on-disk frame-data byte layout.

Design: shapes are static per (H, W, batch) so XLA compiles once per camera
geometry (the DBDE use case is fixed-rate cameras — one geometry per file).
The payload lives in a worst-case (16 words/tile) buffer on device; the true
length ``2*n64`` travels alongside and the host slices when serializing.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .format import FrameHeader, tile_grid, packed_image_size
from .ops.bitpack import MAX_WORDS_PER_TILE, pack_tiles_to_words, unpack_words_to_tiles
from .ops.payload import compact_payload, gather_windows, word_offsets
from .ops.tiling import pad_and_tile, untile


def default_backend() -> str:
    """"pallas" on TPU (XLA serializes the codec's data-dependent gathers
    there — ~1000x off); "xla" elsewhere (CPU/GPU gathers are fine).
    Override with DBDE_TPU_BACKEND=xla|pallas."""
    import os

    env = os.environ.get("DBDE_TPU_BACKEND")
    if env in ("xla", "pallas"):
        return env
    try:
        return "pallas" if jax.default_backend().startswith(("tpu", "axon")) else "xla"
    except Exception:
        return "xla"


@dataclass
class EncodedBatch:
    """Device-side encoded frames: one row per frame in the batch."""

    depths: jax.Array  # (B, T) u8
    mins: jax.Array  # (B, T) u8
    # band backend: (B, R, 128) u32 in the payload kernel's native shape —
    # kept unflattened so decode feeds the kernel with zero relayout: the
    # flat contract's pad+copy of the stream buffer measured 12% of decode
    # device time at 8x2048² (58.7 → 66.8 Gpix/s removed).  Encode's
    # matching slice-copy was already pipeline-hidden (A/B 0.951 vs
    # 0.950 ms) — dropping it is neutral there.  xla/tiles backends: flat
    # (B, 16*T) u32.  Either way only the first 2*n64 words per frame are
    # meaningful; use payload_host() for a flat host view.
    payload: jax.Array
    n64: jax.Array  # (B,) i32 — number of payload u64 words per frame
    # set only by encode(defer_verify=True): the reduced-plane variant's
    # depth bound.  The payload is only valid if max(depths) <= depth_bound;
    # the caller MUST check (depths land on the host at serialization time
    # anyway) and re-encode via encode_general() on violation.  None =
    # unconditionally valid.
    depth_bound: int | None = None
    # set only by encode(defer_verify=True) when the uniform depth-8 fast
    # path ran: the payload is only valid if EVERY real tile depth equals
    # this value (min(depths) == max(depths) == depth_exact); same caller
    # contract as depth_bound.
    depth_exact: int | None = None

    def payload_host(self, max_words: int | None = None) -> np.ndarray:
        """Payload as a flat (B, S) u32 host array (S ≥ ``max_words`` when
        given, rounded up to whole 128-lane rows for the kernel-shaped
        band payload).  Device-slices the live prefix first so only
        ~``max_words`` words per frame cross to the host; the reshape
        itself is a free view."""
        p = self.payload
        if getattr(p, "ndim", 2) == 3:
            if max_words is not None and max_words < p.shape[1] * p.shape[2]:
                p = p[:, : -(-max_words // p.shape[2])]
            a = np.asarray(p)
            return a.reshape(a.shape[0], -1)
        if max_words is not None and max_words < p.shape[1]:
            p = p[:, :max_words]
        return np.asarray(p)


def _encode_fn(images: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    tiles = pad_and_tile(images)
    depth, mn, words = pack_tiles_to_words(tiles)
    offsets, total = word_offsets(depth)
    payload = compact_payload(words, offsets, total)
    return depth.astype(jnp.uint8), mn, payload, (total // 2).astype(jnp.int32)


def _decode_fn(depths: jnp.ndarray, mins: jnp.ndarray, payload: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    offsets, _ = word_offsets(depths.astype(jnp.int32))
    windows = gather_windows(payload, offsets)
    tiles = unpack_words_to_tiles(depths.astype(jnp.int32), mins, windows)
    return untile(tiles, H, W)


# -- band backend (TPU, W % 1024 == 0): kernels read/write image memory -----


def band_width(width: int) -> int:
    """Band-kernel width: next multiple of 1024 (the folded width for
    narrow frames — see :func:`band_fold`)."""
    return -(-width // 1024) * 1024 if width > 1024 else 1024


def band_fold(width: int, h_tiles: int | None = None) -> tuple[int, int]:
    """(column-padded width Wp, fold count k), with k*Wp = the band kernel
    width (a multiple of 1024).

    Frames whose tile grid does not fill 128-lane groups pad their columns,
    then lay k *consecutive tile rows* side by side per kernel row ("row
    folding").  Row-major tile order — and therefore the format's byte
    stream (dbde_util.cpp:150-158 ordering) — is invariant under the fold:
    kernel-row r' holds original tile rows [k*r', k*r'+k) left to right,
    which is exactly the row-major tile sequence.  Column-pad tiles are
    constant zeros (depth 0, no payload) and are sliced out of the
    depth/min grids by the adapters.

    Narrow frames (≤1024 px) fold onto exactly-1024-wide kernels (smallest
    power-of-two Wp holding the grid, k = 1024/Wp).  Measured v5e (camera,
    H=2048, B=8): folded band vs the tile-layout kernels at W=320:
    20.0/33.5 vs 4.5/5.5 Gpix/s (enc/dec); at W=128: 25.9/44.0 vs 4.6/5.6.

    Wide frames fold k padded tile rows per kernel row when that cuts the
    column pad: a k-row fold only needs the padded row to be a multiple of
    128/k tiles, so e.g. W=2536 (317 tiles) runs k=2 at Wp=2560 (0.9% pad)
    instead of k=1 at Wp=3072 (21%).  Selection minimizes the padded-area
    ratio (column pad × fold-row pad when ``h_tiles`` is given; ties go to
    the smaller k), skipping candidates whose kernel grid would exceed
    BLOCK_GROUPS_CAP lane-groups per block (the unroll/VMEM bound — checked
    against the *effective* block geometry, so a pinned BANDS_MULT shifts
    the choice toward smaller k).  k=1 is always valid as the fallback.
    """
    import math

    w8 = 8 * (-(-width // 8))
    wp = w8 // 8
    if w8 <= 1024:
        Wp = 8
        while Wp < w8:
            Wp *= 2
        return Wp, 1024 // Wp
    from .ops import pallas_band as pb

    best = None
    for k in (1, 2, 4, 8):
        m = 128 // math.gcd(k, 128)
        p = -(-wp // m) * m
        if k > 1 and pb.n_bands(8 * k * p) * (k * p // 128) > pb.BLOCK_GROUPS_CAP:
            continue
        ratio = p / wp
        if h_tiles:
            ratio *= (-(-h_tiles // k) * k) / h_tiles
        if best is None or ratio < best[0] - 1e-9:
            best = (ratio, 8 * p, k)
    return best[1], best[2]


def _fold_rows(h_tiles: int, k: int) -> int:
    """Tile rows padded to a whole number of folds."""
    return -(-h_tiles // k) * k


def to_band_img32(images, H: int, W: int):
    """(B, H, W) u8 → padded+folded (B, Hf, Wk//4) u32 for the band
    kernels (Wk = k*Wp, the 1024-multiple kernel width).

    Columns pad per the format's edge rule up to the ragged tile
    boundary (8*ceil(W/8)), then constant zeros to Wp (depth-0 pad
    tiles); rows zero-pad to whole folds and whole kernel grid blocks;
    narrow frames fold k consecutive tile rows per kernel row
    (:func:`band_fold` — byte-stream invariant).  numpy inputs
    reinterpret for free on the host; device arrays pay one XLA pad +
    bitcast.  Also serves per-shard in the sharded codec with
    H = 8·(tile rows per shard).
    """
    from .ops import pallas_band as pb

    h8, w8 = (8 * d for d in tile_grid(W, H))  # format edge-pad boundary
    Wp, k = band_fold(W, h8 // 8)
    Wk = k * Wp
    hf8 = 8 * (_fold_rows(h8 // 8, k) // k)  # folded rows before blocks
    hpf8 = pb.pad_rows(hf8, Wk)  # folded rows padded to grid blocks
    hp8 = (hf8 * k)  # unfolded rows incl. fold padding
    if isinstance(images, np.ndarray):
        images = np.ascontiguousarray(images)
        B = images.shape[0]
        if w8 != W:  # edge rule: replicate rightward within ragged tiles
            images = np.concatenate(
                [images, np.repeat(images[:, :, -1:], w8 - W, axis=2)], axis=2
            )
        if h8 != H:  # edge rule: replicate the last row within ragged tiles
            images = np.concatenate(
                [images, np.repeat(images[:, -1:, :], h8 - H, axis=1)], axis=1
            )
        if Wp != w8:  # constant pad tiles beyond the real grid: no payload
            images = np.concatenate(
                [images, np.zeros((B, h8, Wp - w8), np.uint8)], axis=2
            )
        if hp8 != h8:  # zero tile rows completing the last fold
            images = np.concatenate(
                [images, np.zeros((B, hp8 - h8, Wp), np.uint8)], axis=1
            )
        if k > 1:  # fold: k consecutive tile rows side by side
            images = np.ascontiguousarray(
                images.reshape(B, hf8 // 8, k, 8, Wp)
                .transpose(0, 1, 3, 2, 4)
                .reshape(B, hf8, Wk)
            )
        if hpf8 != hf8:  # zero rows completing the kernel grid blocks
            images = np.concatenate(
                [images, np.zeros((B, hpf8 - hf8, Wk), np.uint8)], axis=1
            )
        return jnp.asarray(images.view(np.uint32))
    images = jnp.asarray(images, jnp.uint8)
    B = images.shape[0]
    if w8 != W or h8 != H:
        images = jnp.pad(images, ((0, 0), (0, h8 - H), (0, w8 - W)), mode="edge")
    if Wp != w8 or hp8 != h8:
        images = jnp.pad(images, ((0, 0), (0, hp8 - h8), (0, Wp - w8)))
    if k > 1:
        images = (
            images.reshape(B, hf8 // 8, k, 8, Wp)
            .transpose(0, 1, 3, 2, 4)
            .reshape(B, hf8, Wk)
        )
    if hpf8 != hf8:
        images = jnp.pad(images, ((0, 0), (0, hpf8 - hf8), (0, 0)))
    x4 = images.reshape(B, hpf8, Wk // 4, 4)
    return jax.lax.bitcast_convert_type(x4, jnp.uint32)


def _encode_fn_band(img32: jnp.ndarray, H: int, W: int, mplanes: int = 8,
                    interpret: bool = False):
    """img32 (B, Hf, 1024//4) u32 (edge/column-padded + row-folded, see
    :meth:`DbdeCodec._to_img32`) → standard encode outputs plus the batch
    max depth (the scalar behind the adaptive reduced-plane dispatch —
    ``mplanes`` < 8 compiles a payload-kernel variant that is only correct
    when every tile depth ≤ mplanes; maxd comes from phase A and is valid
    regardless of the variant, so the caller can detect a misprediction).

    ``H`` need not be the full frame height: the sharded codec
    (parallel/sharding.py) runs this same adapter per shard with
    H = 8·(tile rows per shard) — the fold and the byte stream are
    invariant under that split because shards are contiguous tile-row
    bands.  ``interpret`` runs the kernels in Pallas interpreter mode
    (virtual CPU meshes)."""
    from .ops import pallas_band as pb

    B = img32.shape[0]
    h, w = tile_grid(W, H)
    Wp, k = band_fold(W, h)
    wpp = Wp // 8
    d3, m3, payload = pb.encode_band_kernel(img32, mplanes=mplanes,
                                            interpret=interpret)
    tp = d3.shape[1] * pb.LANES
    hpf = tp // (k * wpp)  # folded (kernel) tile rows
    # unfold the grids: kernel row r' holds original tile rows k*r'..k*r'+k-1
    depths = d3.reshape(B, hpf * k, wpp)[:, :h, :w].reshape(B, h * w)
    mins = m3.reshape(B, hpf * k, wpp)[:, :h, :w].reshape(B, h * w)
    n64 = jnp.sum(depths.astype(jnp.int32), axis=-1)
    # the payload stays in the kernel's (B, R, 128) shape: flattening to
    # (B, 16*T) forced a pad+relayout back on the decode side worth 12% of
    # decode device time at 8x2048² (the encode-side slice-copy it also
    # drops was pipeline-hidden — neutral).  Host serialization gets a flat
    # view via EncodedBatch.payload_host() (free numpy reshape).
    # The (max over all tiles, min over REAL tiles) depth pair drives the
    # adaptive dispatch: max gates the reduced-plane variants, min == 8
    # gates the uniform depth-8 fast path.
    return depths, mins, payload, n64, (jnp.max(d3), jnp.min(depths))


def uniform8_supported(H: int, W: int) -> bool:
    """Static geometry gate for the uniform depth-8 fast path
    (pallas_band.encode_payload_u8_kernel / decode_band_u8_kernel): the
    closed-form stream permutation needs the whole layout static, which
    requires (a) whole row folds (ragged folds add depth-0 pad tile ROWS
    whose position breaks the per-block template), (b) no grid-block row
    padding, and (c) 128-aligned per-block streams for BOTH kernels' block
    heights (block starts must be payload-row aligned).  Both bench
    geometries (2048² and the reference-default 2536×2048 at the k=2 fold)
    qualify; unsupported geometries simply keep the general kernels."""
    from .ops import pallas_band as pb

    h, w = tile_grid(W, H)
    Wp, k = band_fold(W, h)
    if h % k:
        return False
    Wk = k * Wp
    hf8 = 8 * (h // k)
    if pb.pad_rows(hf8, Wk) != hf8:
        return False
    for cap in (pb.BLOCK_GROUPS_CAP, pb.BLOCK_GROUPS_CAP_DEC):
        if (16 * pb.n_bands(Wk, hf8, cap) * k * w) % 128:
            return False
    return True


def _encode_fn_band_u8(img32: jnp.ndarray, H: int, W: int,
                       interpret: bool = False):
    """Uniform depth-8 encode: phase A unchanged, payload via the
    closed-form stream permutation (pallas_band module note).  The payload
    is ONLY correct when every real tile depth is 8 — callers dispatch on
    the previous batch's (maxd, mind) and verify mind == 8 afterwards
    (DbdeCodec.encode), exactly like the reduced-plane variants.  Matches
    the reference's own depth-8 special case (dbde_util.cpp:57-63)."""
    from .ops import pallas_band as pb

    B = img32.shape[0]
    h, w = tile_grid(W, H)
    Wp, k = band_fold(W, h)
    wpp = Wp // 8
    d3, m3 = pb.encode_depths_kernel(img32, interpret=interpret)
    payload = pb.encode_payload_u8_kernel(img32, m3, wpp, w,
                                          interpret=interpret)
    tp = d3.shape[1] * pb.LANES
    hpf = tp // (k * wpp)
    depths = d3.reshape(B, hpf * k, wpp)[:, :h, :w].reshape(B, h * w)
    mins = m3.reshape(B, hpf * k, wpp)[:, :h, :w].reshape(B, h * w)
    n64 = jnp.sum(depths.astype(jnp.int32), axis=-1)
    return depths, mins, payload, n64, (jnp.max(d3), jnp.min(depths))


def _decode_fn_band(depths: jnp.ndarray, mins: jnp.ndarray, payload: jnp.ndarray,
                    H: int, W: int, interpret: bool = False,
                    uniform8: bool | None = None):
    """→ img32 (B, H, ceil(W/4)) u32 (caller reinterprets bytes, trims ≤3 cols).

    Pad rows and whole pad u32 columns are sliced off on device so the
    host transfer carries (almost) only real pixels.  Like the encode
    adapter, also serves per-shard in the sharded codec (H = shard rows)."""
    from .ops import pallas_band as pb

    B, T = depths.shape
    h, w = tile_grid(W, H)
    Wp, k = band_fold(W, h)
    Wk = k * Wp
    wpp = Wp // 8
    hpf = pb.pad_rows(8 * (_fold_rows(h, k) // k), Wk) // 8  # folded tile rows
    tp = hpf * k * wpp
    rows = pb.payload_rows(tp)
    # embed the real (h, w) tile grid into the padded folded grid
    d = jnp.zeros((B, hpf * k, wpp), jnp.uint8).at[:, :h, :w].set(depths.reshape(B, h, w))
    m = jnp.zeros((B, hpf * k, wpp), jnp.uint8).at[:, :h, :w].set(mins.reshape(B, h, w))
    if payload.ndim == 3:
        # kernel-shaped (B, R, 128) straight from the band encode: zero
        # relayout (the flat path below costs a pad + full-stream copy)
        assert payload.shape[1:] == (rows, pb.LANES), (payload.shape, rows)
        p3 = payload
    elif payload.shape[1] >= rows * pb.LANES:
        # oversized flat buffers carry no live words past the stream end
        p3 = payload[:, : rows * pb.LANES].reshape(B, rows, pb.LANES)
    else:
        p = jnp.pad(payload, ((0, 0), (0, rows * pb.LANES - payload.shape[1])))
        p3 = p.reshape(B, rows, pb.LANES)
    d3 = d.reshape(B, tp // pb.LANES, pb.LANES)
    m3 = m.reshape(B, tp // pb.LANES, pb.LANES)
    if uniform8 is None:
        # auto: on for compiled TPU kernels; off in interpreter mode so the
        # CI suite does not pay a second interpreter compile per codec
        # (dedicated tests exercise the fast kernels with uniform8=True)
        uniform8 = not interpret
    if uniform8 and uniform8_supported(H, W):
        # uniform depth-8 fast path: when every real tile is depth 8 the
        # stream layout is static — decode is a word permutation + byte-wise
        # min add (pallas_band.decode_band_u8_kernel).  The gate is the
        # real-depth min; cond operands are the compressed stream (switch
        # overhead unmeasurable, ROUND3_NOTES decode-variant finding).
        img32 = jax.lax.cond(
            jnp.min(depths) == 8,
            lambda d_, m_, p_: pb.decode_band_u8_kernel(
                m_, p_, Wk, wpp, w, interpret=interpret),
            lambda d_, m_, p_: pb.decode_band_kernel(
                d_, m_, p_, Wk, interpret=interpret),
            d3, m3, p3,
        )
    else:
        img32 = pb.decode_band_kernel(d3, m3, p3, Wk, interpret=interpret)
    if k > 1:  # unfold: (B, Hf, Wk//4) → (B, Hf*k, Wp//4)
        Hf = img32.shape[1]
        img32 = (
            img32.reshape(B, Hf // 8, 8, k, Wp // 4)
            .transpose(0, 1, 3, 2, 4)
            .reshape(B, Hf * k, Wp // 4)
        )
    return img32[:, :H, : -(-W // 4)]


# -- Pallas-kernel backend (TPU): same contract, fused vector kernels --------


def _encode_fn_pallas(images: jnp.ndarray):
    from .ops import pallas_kernels as pk

    B, H, W = images.shape
    h, w = tile_grid(W, H)
    T = h * w
    tp = pk.pad_tiles(T)
    tiles_w = pk.image_to_tiles_w(images)  # (B, 16, Tp) u32
    d3, m3, payload = pk.encode_tiles_kernel(tiles_w)
    depths = d3.reshape(B, tp)[:, :T]
    mins = m3.reshape(B, tp)[:, :T]
    n64 = jnp.sum(depths.astype(jnp.int32), axis=-1)
    flat = payload.reshape(B, -1)[:, : T * MAX_WORDS_PER_TILE]
    return depths, mins, flat, n64


def _decode_fn_pallas(depths: jnp.ndarray, mins: jnp.ndarray, payload: jnp.ndarray, H: int, W: int):
    from .ops import pallas_kernels as pk

    B, T = depths.shape
    tp = pk.pad_tiles(T)
    rows = pk.payload_rows(tp)
    d = depths if tp == T else jnp.pad(depths, ((0, 0), (0, tp - T)))
    m = mins if tp == T else jnp.pad(mins, ((0, 0), (0, tp - T)))
    p = jnp.pad(payload, ((0, 0), (0, rows * pk.LANES - payload.shape[1])))
    tiles_w = pk.decode_tiles_kernel(
        d.reshape(B, tp // pk.LANES, pk.LANES),
        m.reshape(B, tp // pk.LANES, pk.LANES),
        p.reshape(B, rows, pk.LANES),
    )
    return pk.tiles_w_to_image(tiles_w, H, W)


class DbdeCodec:
    """Compiled DBDE codec for a fixed frame geometry.

    >>> codec = DbdeCodec(height=480, width=640)
    >>> enc = codec.encode(frames_u8)          # (B, H, W) u8 on any backend
    >>> out = codec.decode(enc.depths, enc.mins, enc.payload)

    Thread safety: a codec instance is NOT safe for concurrent ``encode``
    calls.  The adaptive band backend keeps sticky dispatch state
    (``_mplanes`` / ``_encode`` / ``_last_stat``) that ``encode`` reads and
    mutates unsynchronized — racing threads could pair one batch's variant
    with another's verification and skip a misprediction re-encode
    (corrupt payload, not just a perf loss).  Use one codec per thread, one
    lock around ``encode``, or ``adaptive=False`` (whose only state is the
    jit caches, which are thread-safe).  ``decode`` and the non-band
    backends are stateless after construction and safe to share.
    """

    def __init__(self, height: int, width: int, backend: str = "auto",
                 adaptive: bool | None = None):
        self.height = int(height)
        self.width = int(width)
        h, w = tile_grid(self.width, self.height)
        self.tiles = h * w
        self.max_payload_words = self.tiles * MAX_WORDS_PER_TILE
        if backend == "auto":
            backend = default_backend()
        if backend == "pallas":
            # image-layout band kernels: the fast TPU path for EVERY width.
            # Narrow frames run column-padded + row-folded (band_fold) with a
            # worst-case <2x pad ratio — measured faster than the tile-layout
            # kernels at every width (20-26 vs ~5 Gpix/s encode at W<=320).
            # The tile-layout path stays reachable as backend="tiles" (the
            # differential/odd-geometry oracle kernels).
            backend = "band"
        if backend not in ("xla", "tiles", "band"):
            raise ValueError(f"unknown backend {backend!r}")
        self.backend = backend
        if backend == "band":
            # adaptive reduced-plane encode (see encode()): sticky dispatch
            # between the general payload kernel (mplanes=8) and a reduced
            # variant that skips candidate planes the batch's max depth
            # proves dead (camera content is depth <= 5 → 3 of 8 candidate
            # gather/select stages vanish).  _encode always points at the
            # currently-predicted variant so benches measure the real path.
            # None = auto: on for real TPU backends, off on CPU (the
            # interpreter-mode test suite must not pay a second per-codec
            # kernel compile; test_band_codec has a dedicated adaptive test)
            if adaptive is None:
                try:
                    adaptive = jax.default_backend().startswith(("tpu", "axon"))
                except Exception:
                    adaptive = False
            self._adaptive = bool(adaptive)
            self._encode_v: dict[object, object] = {}
            self._mplanes: object = 8
            self._last_stat = None  # previous batch's (maxd, mind) scalars
            self._u8_ok = uniform8_supported(self.height, self.width)
            self._encode = self._encode_variant(8)
            self._decode = jax.jit(partial(_decode_fn_band, H=self.height, W=self.width))
            self._roundtrip = jax.jit(self._roundtrip_band)
        else:
            enc = _encode_fn_pallas if backend == "tiles" else _encode_fn
            dec = _decode_fn_pallas if backend == "tiles" else _decode_fn
            self._encode_impl, self._decode_impl = enc, dec
            self._encode = jax.jit(enc)
            self._decode = jax.jit(partial(dec, H=self.height, W=self.width))
            self._roundtrip = jax.jit(self._roundtrip_fn)

    # reduced-plane variant tier: batches with max depth <= ADAPT_MPLANES
    # use the reduced payload kernel (one extra compile, cached per codec).
    # 5 is the measured knee, not a guess: probed mplanes ∈ {3,4,5,6,8} on
    # maxd=3/4/5 content (tools/probe_mplanes.py, v5e 8×2048², ROUND4_NOTES
    # table) — the payload kernel is 0.887/0.867/0.842/0.866/0.866 ms at
    # mp=8/6/5/4/3, i.e. BELOW 5 the kernel gets *slower* (the shrinking
    # candidate scan stops paying once the content-independent compaction
    # floor dominates, and the 2·mplanes-row staged scratch tiles worse at
    # 6/8 rows than at 10), so extra shallow tiers would cost a compile and
    # a sticky-dispatch state for negative return.
    ADAPT_MPLANES = 5

    def _encode_variant(self, mp):
        """mp: a plane bound (int) or "u8" (the uniform depth-8 closed-form
        payload kernel — valid only when every real tile depth is 8)."""
        fn = self._encode_v.get(mp)
        if fn is None:
            if mp == "u8":
                f = partial(_encode_fn_band_u8, H=self.height, W=self.width)
            else:
                f = partial(_encode_fn_band, H=self.height, W=self.width,
                            mplanes=mp)
            fn = self._encode_v[mp] = jax.jit(f)
        return fn

    def _check(self, images) -> jnp.ndarray:
        images = jnp.asarray(images, dtype=jnp.uint8)
        single = images.ndim == 2
        if single:
            images = images[None]
        if images.shape[-2:] != (self.height, self.width):
            raise ValueError(
                f"expected frames of shape (*, {self.height}, {self.width}), got {images.shape}"
            )
        return images, single

    def _to_img32(self, images):
        return to_band_img32(images, self.height, self.width)

    def encode(self, images, defer_verify: bool = False) -> EncodedBatch:
        """(B, H, W) or (H, W) u8 frames → :class:`EncodedBatch`.

        ``defer_verify``: skip the inline depth-bound verification sync of
        the adaptive reduced-plane variant and return a batch whose
        ``depth_bound`` field the caller must check against the host-side
        depths before trusting the payload (re-encode via
        :meth:`encode_general` on violation).  This keeps encode fully
        asynchronous for pipelined writers — the inline verify would block
        until the batch's own device program finished, serializing the
        writer's dispatch-ahead overlap."""
        if self.backend == "band":
            if isinstance(images, np.ndarray):
                images = np.asarray(images, dtype=np.uint8)
                if images.ndim == 2:
                    images = images[None]
                if images.shape[-2:] != (self.height, self.width):
                    raise ValueError(
                        f"expected frames of shape (*, {self.height}, "
                        f"{self.width}), got {images.shape}"
                    )
            else:
                images, _ = self._check(images)
            img32 = self._to_img32(images)
            # sticky adaptive dispatch: pick the variant from the PREVIOUS
            # batch's (max, real-min) depths (finished device scalars —
            # reading them does not wait on new work), encode, then verify
            # the variant's validity condition whenever a specialized
            # variant ran (this sync is the price of the specialization;
            # the general variant stays fully async).  A misprediction
            # re-encodes with the general kernel — content regimes are
            # file-wide in practice (fixed cameras), so flips are rare.
            if self._adaptive and self._last_stat is not None:
                maxd_p, mind_p = (int(x) for x in self._last_stat)
                if self._u8_ok and mind_p == 8:
                    want = "u8"  # uniform depth-8 closed-form payload
                elif maxd_p <= self.ADAPT_MPLANES:
                    want = self.ADAPT_MPLANES
                else:
                    want = 8
                if want != self._mplanes:
                    self._mplanes = want
                    self._encode = self._encode_variant(want)
            depths, mins, payload, n64, stat = self._encode(img32)
            bound = exact = None
            if self._mplanes == "u8":
                exact = 8
            elif self._mplanes < 8:
                bound = self._mplanes
            if (bound is not None or exact is not None) and not defer_verify:
                maxd, mind = stat
                bad = (int(mind) != 8) if exact is not None else (int(maxd) > bound)
                if bad:
                    self._mplanes = 8
                    self._encode = self._encode_variant(8)
                    depths, mins, payload, n64, stat = self._encode(img32)
                bound = exact = None
            if self._adaptive:
                self._last_stat = stat
            return EncodedBatch(depths=depths, mins=mins, payload=payload,
                                n64=n64, depth_bound=bound, depth_exact=exact)
        images, _ = self._check(images)
        depths, mins, payload, n64 = self._encode(images)
        return EncodedBatch(depths=depths, mins=mins, payload=payload, n64=n64)

    def encode_general(self, images) -> EncodedBatch:
        """Encode with the always-correct general kernel, bypassing the
        adaptive dispatch (the ``defer_verify`` caller's misprediction
        fallback).  Also flips the sticky prediction back to general."""
        if self.backend != "band":
            return self.encode(images)
        if isinstance(images, np.ndarray):
            images = np.asarray(images, dtype=np.uint8)
            if images.ndim == 2:
                images = images[None]
        else:
            images, _ = self._check(images)
        self._mplanes = 8
        self._encode = self._encode_variant(8)
        depths, mins, payload, n64, stat = self._encode(self._to_img32(images))
        if self._adaptive:
            self._last_stat = stat
        return EncodedBatch(depths=depths, mins=mins, payload=payload, n64=n64)

    def decode_dispatch(self, depths, mins, payload):
        """Launch the device decode without blocking; returns a pending handle
        for :meth:`materialize` (the async half of :meth:`decode` — lets a
        streaming pipeline overlap host parsing with device compute)."""
        return self._decode(
            jnp.asarray(depths, jnp.uint8),
            jnp.asarray(mins, jnp.uint8),
            jnp.asarray(payload, jnp.uint32),
        )

    def materialize(self, pending) -> np.ndarray:
        """Pending decode handle → (B, H, W) u8 numpy (blocks on the device)."""
        if self.backend == "band":
            # device output is (B, H, ceil(W/4)) u32: free byte view + col trim
            # (ascontiguousarray: jax can hand back a strided view for some
            # odd-width slices, and .view() needs a contiguous last axis)
            out = np.ascontiguousarray(np.asarray(pending))
            return out.view(np.uint8)[:, :, : self.width]
        return np.asarray(pending)

    def decode(self, depths, mins, payload) -> np.ndarray:
        """Encoded arrays → (B, H, W) u8 numpy frames (same on every backend)."""
        return self.materialize(self.decode_dispatch(depths, mins, payload))

    def _roundtrip_fn(self, images):
        depths, mins, payload, n64 = self._encode_impl(images)
        out = self._decode_impl(depths, mins, payload, self.height, self.width)
        return out, n64

    def _roundtrip_band(self, img32):
        depths, mins, payload, n64, _ = _encode_fn_band(img32, self.height, self.width)
        out32 = _decode_fn_band(depths, mins, payload, self.height, self.width)
        return out32, n64

    def roundtrip(self, images):
        """Fused encode→decode (single compiled program); returns (frames, n64)."""
        if self.backend == "band":
            single = getattr(images, "ndim", 3) == 2
            if single:
                images = np.asarray(images)[None]
            out32, n64 = self._roundtrip(self._to_img32(np.asarray(images, dtype=np.uint8)))
            out = np.asarray(out32).view(np.uint8)[:, : self.height, : self.width]
            return (out[0], n64[0]) if single else (out, n64)
        images, single = self._check(images)
        out, n64 = self._roundtrip(images)
        return (out[0], n64[0]) if single else (out, n64)


# ---------------------------------------------------------------------------
# Host byte glue: device arrays ↔ on-disk frame-data layout
# ---------------------------------------------------------------------------


RECORD_IOVECS_PER_FRAME = 7


def record_iovecs(depths, mins, payload, n64, indices=None, elapsed_ns=None) -> list:
    """Per-frame record buffers for vectored IO — 7 per frame: 20 B header,
    ``i32 h·w``, depths row, ``i32 h·w``, minima row, ``i32 n64``, payload
    prefix (layout parity with dbde_util.cpp:137-196, little-endian).

    The array rows are zero-copy views into the caller's host arrays; they
    must stay unmodified until the write consumes them.  Feeding these to
    ``os.writev`` makes the kernel's copy-to-page-cache the *only* pass over
    the record bytes — measured 22 → 14 ms per 16-frame 2048² batch vs
    assembling a contiguous buffer first (ROUND3_NOTES).
    """
    depths = np.ascontiguousarray(depths, np.uint8)
    mins = np.ascontiguousarray(mins, np.uint8)
    payload = np.ascontiguousarray(payload, np.uint32)
    n64 = np.asarray(n64)
    B, T = depths.shape
    count = struct.pack("<i", T)
    iov = []
    for b in range(B):
        idx = int(indices[b]) if indices is not None else b
        ns = int(elapsed_ns[b]) if elapsed_ns is not None else 0
        n = int(n64[b])
        iov += [
            FrameHeader(index=idx, elapsed_ns=ns).pack(),
            count,
            depths[b].data,
            count,
            mins[b].data,
            struct.pack("<i", n),
            payload[b, : 2 * n].data,
        ]
    return iov


def pack_frames_bytes(enc: EncodedBatch, indices=None, elapsed_ns=None) -> list[bytes]:
    """EncodedBatch → list of per-frame bytes (20 B header + frame data).

    Layout parity with dbde_util.cpp:137-196: ``i32 h·w``, depths, ``i32
    h·w``, minima, ``i32 n64``, payload u64s (little-endian).
    """
    n64 = np.asarray(enc.n64)
    # transfer only the live payload prefix (the buffer is worst-case sized)
    mx = 2 * int(n64.max()) if len(n64) else 0
    iov = record_iovecs(np.asarray(enc.depths), np.asarray(enc.mins),
                        enc.payload_host(mx), n64, indices, elapsed_ns)
    k = RECORD_IOVECS_PER_FRAME
    return [b"".join(iov[k * b : k * (b + 1)]) for b in range(len(n64))]


def unpack_frames_bytes(buf: bytes, W: int, H: int, offsets: list[int],
                        stride_words: int | None = None):
    """Parse frame-data records at byte ``offsets`` → stacked numpy arrays.

    Returns (depths (B,T) u8, mins (B,T) u8, payload (B,S) u32, n64 (B,)),
    ready for :meth:`DbdeCodec.decode` (S defaults to the worst case 16*T).
    Raises ValueError on count-field mismatches (the reference's hard-error
    parity, dbde_util.cpp:295-303).
    """
    h, w = tile_grid(W, H)
    T = h * w
    B = len(offsets)
    S = stride_words if stride_words is not None else T * MAX_WORDS_PER_TILE
    depths = np.empty((B, T), np.uint8)
    mins = np.empty((B, T), np.uint8)
    payload = np.zeros((B, S), np.uint32)
    n64s = np.empty((B,), np.int32)
    for b, off in enumerate(offsets):
        (nb,) = struct.unpack_from("<i", buf, off)
        if nb != T:
            raise ValueError(f"frame {b}: depth count {nb} != {T}")
        depths[b] = np.frombuffer(buf, np.uint8, T, off + 4)
        (nm,) = struct.unpack_from("<i", buf, off + 4 + T)
        if nm != T:
            raise ValueError(f"frame {b}: min count {nm} != {T}")
        mins[b] = np.frombuffer(buf, np.uint8, T, off + 8 + T)
        (n64,) = struct.unpack_from("<i", buf, off + 8 + 2 * T)
        if n64 != int(depths[b].astype(np.int64).sum()):
            raise ValueError(f"frame {b}: n64 {n64} != sum of depths")
        payload[b, : 2 * n64] = np.frombuffer(buf, np.uint32, 2 * n64, off + 12 + 2 * T)
        n64s[b] = n64
    return depths, mins, payload, n64s


def frame_data_size(depths_row: np.ndarray, W: int, H: int) -> int:
    """Encoded byte size of one frame's data block."""
    return packed_image_size(W, H, int(depths_row.astype(np.int64).sum()))
