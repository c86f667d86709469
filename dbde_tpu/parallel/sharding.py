"""Multi-chip sharding of the DBDE codec over a device mesh.

The reference is single-threaded C++ — there is no distributed design to
port.  This module is the TPU-native scaling story, designed for ICI:

  * axis ``"data"`` — frame-batch data parallelism (the production mode for
    camera streams: each chip encodes/decodes its own frames; zero
    cross-chip traffic in the hot path).
  * axis ``"tiles"`` — tile (sequence-parallel analogue) sharding of single
    huge frames: the image is split into horizontal bands of 8-pixel-row
    tiles.  The only cross-shard coupling in the whole format is the payload
    offset prefix-sum; it becomes an ``all_gather`` of one scalar per shard
    (the shard's total word count) over ICI, after which every shard
    compacts its payload segment independently.

Per-shard payload segments stay sharded (each shard owns a worst-case-sized
slot); the host assembles the ragged file bytes from (segment, length) pairs.
This is the standard ragged-allgather pattern — moving the ragged concat to
the host avoids a device-side all-to-all entirely.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..format import tile_grid
from ..ops.bitpack import pack_tiles_to_words, unpack_words_to_tiles
from ..ops.payload import compact_payload, gather_windows, word_offsets
from ..ops.tiling import pad_and_tile, untile


def make_mesh(n_data: int | None = None, n_tiles: int = 1, devices=None) -> Mesh:
    """Build a ("data", "tiles") mesh from the available devices."""
    devices = list(jax.devices()) if devices is None else list(devices)
    if n_data is None:
        n_data = len(devices) // n_tiles
    if n_data * n_tiles > len(devices):
        raise ValueError(f"mesh {n_data}x{n_tiles} needs more than {len(devices)} devices")
    dev = np.array(devices[: n_data * n_tiles]).reshape(n_data, n_tiles)
    return Mesh(dev, axis_names=("data", "tiles"))


# ---------------------------------------------------------------------------
# shard_map bodies (everything below runs per-device on local blocks)
# ---------------------------------------------------------------------------


def _encode_block(images_local: jnp.ndarray):
    """Per-device encode of a (B_local, H_local, W) band stack.

    H_local must be a multiple of 8 (bands align to tile rows), which
    :func:`encode_sharded` guarantees by pre-padding.  Returns local depths,
    mins, a locally-compacted payload segment, and the segment's word count.
    The global offset of each shard's segment is an exclusive sum over the
    ``tiles`` axis of segment totals — the format's single serialization,
    reduced to one tiny ICI collective.
    """
    tiles = pad_and_tile(images_local)
    depth, mn, words = pack_tiles_to_words(tiles)
    offsets, total = word_offsets(depth)
    payload = compact_payload(words, offsets, total)
    # exclusive prefix over the tiles axis: word base of this shard's segment
    totals = jax.lax.all_gather(total, "tiles")  # (n_tiles, B_local)
    my = jax.lax.axis_index("tiles")
    mask = (jnp.arange(totals.shape[0]) < my)[:, None]
    base = jnp.sum(totals * mask, axis=0)
    return depth.astype(jnp.uint8), mn, payload, total[None, :], base[None, :]


def _decode_block(depths_local, mins_local, segment_local, H_local: int, W: int):
    """Per-device decode of a band's payload segment back to pixels."""
    offsets, _ = word_offsets(depths_local.astype(jnp.int32))
    windows = gather_windows(segment_local, offsets)
    tiles = unpack_words_to_tiles(depths_local.astype(jnp.int32), mins_local, windows)
    return untile(tiles, H_local, W)


# ---------------------------------------------------------------------------
# band-kernel shard bodies: each chip runs the compiled Pallas band codec on
# its local tile band — this is the fast multi-chip path (the XLA bodies above
# stay as the differential baseline; on real TPUs their data-dependent
# gathers serialize)
# ---------------------------------------------------------------------------


def _mesh_interpret(mesh: Mesh) -> bool:
    """Pallas interpreter mode for non-TPU meshes (virtual CPU test meshes)."""
    plat = next(iter(mesh.devices.flat)).platform
    return not plat.startswith(("tpu", "axon"))


def _band_geometry(W: int, H: int, n_tiles: int):
    """Per-shard band-kernel geometry for an (H, W) frame split into
    ``n_tiles`` horizontal tile bands.  Narrow widths fold exactly like the
    single-chip codec (codec.band_fold) — the fold is per-shard-valid
    because shards are contiguous tile-row bands, so shard-major row-major
    tile order == global row-major order and the byte stream is invariant."""
    from ..codec import to_band_img32

    h, w = tile_grid(W, H)
    if h % n_tiles != 0:
        raise ValueError(
            f"tile rows ({h}) must divide evenly into {n_tiles} bands for "
            "bit-exact sharded encode; pick n_tiles dividing ceil(H/8)"
        )
    h_loc = h // n_tiles  # tile rows per shard
    L_real = 8 * h_loc  # pixel rows per shard (format edge-padded)
    # kernel-layout rows per shard (folded + block-padded): probe via the
    # shared adapter so the shapes always match _prep_band_img32
    L = to_band_img32(np.zeros((1, L_real, W), np.uint8), L_real, W).shape[1]
    return h, w, h_loc, L_real, L


def _prep_band_img32(images: np.ndarray, n_tiles: int):
    """(B, H, W) u8 → (B, n_tiles*L, Wk//4) u32: the single-chip codec's
    edge-pad + column-pad + row-fold + block-pad adapter
    (codec.to_band_img32), applied per shard band after the global edge
    padding (zero pad tiles have depth 0 and emit no payload words)."""
    from ..codec import to_band_img32

    B, H, W = images.shape
    h, w, h_loc, L_real, L = _band_geometry(W, H, n_tiles)
    h8, w8 = 8 * h, 8 * w
    img = images
    if h8 != H:  # global edge rule first (shards split on tile rows)
        img = np.concatenate([img, np.repeat(img[:, -1:, :], h8 - H, axis=1)], axis=1)
    return np.concatenate(
        [
            np.asarray(to_band_img32(img[:, k * L_real : (k + 1) * L_real], L_real, W))
            for k in range(n_tiles)
        ],
        axis=1,
    )


def _encode_block_band(img32_local, h_loc: int, W: int, interpret: bool):
    """Band-kernel encode of one shard's (B_local, L, Wk//4) u32 block —
    the single-chip band adapter at H = the shard's rows, plus the
    cross-shard offset prefix (one scalar all_gather over ICI)."""
    from ..codec import _encode_fn_band

    depths, mins, p3, n64, _ = _encode_fn_band(
        img32_local, H=8 * h_loc, W=W, interpret=interpret
    )
    # flatten the kernel-shaped payload for the cross-shard segment layout
    # (a contiguous reshape — XLA bitcast, no copy, unlike the slice the
    # single-chip path used to pay)
    flat = p3.reshape(p3.shape[0], -1)
    total = 2 * n64  # u32 words
    totals = jax.lax.all_gather(total, "tiles")  # (n_tiles, B_local)
    my = jax.lax.axis_index("tiles")
    mask = (jnp.arange(totals.shape[0]) < my)[:, None]
    base = jnp.sum(totals * mask, axis=0)
    return depths, mins, flat, total[None, :], base[None, :]


def _decode_block_band(depths_local, mins_local, segment_local,
                       h_loc: int, W: int, interpret: bool,
                       uniform8: bool = False):
    """Band-kernel decode of one shard's segment → (B, 8*h_loc, ceil(W/4))
    u32 (the single-chip band adapter at H = the shard's rows).

    ``uniform8`` stays False by default: the uniform-8 cond doubles every
    shard's compile for a regime the sharded scaling story does not target
    (single-chip covers it).  Mesh workloads that ARE uniform-depth-8 (full
    random/noise content) can opt in via :func:`decode_sharded`."""
    from ..codec import _decode_fn_band

    return _decode_fn_band(
        depths_local, mins_local, segment_local, H=8 * h_loc, W=W,
        interpret=interpret, uniform8=uniform8,
    )


# ---------------------------------------------------------------------------
# cached compiled sharded programs: the file helpers below call encode/decode
# once per batch, and a freshly-constructed shard_map closure per call would
# defeat jax.jit's compile cache — Mesh is hashable, so memoize the jitted
# callables by (mesh, geometry) and let jit cache executables per shape
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _encode_band_jit(mesh: Mesh, h_loc: int, W: int, interpret: bool):
    fn = jax.shard_map(
        partial(_encode_block_band, h_loc=h_loc, W=W, interpret=interpret),
        mesh=mesh,
        in_specs=P("data", "tiles", None),
        out_specs=(P("data", "tiles"), P("data", "tiles"), P("data", "tiles"),
                   P("tiles", "data"), P("tiles", "data")),
        check_vma=False,  # pallas_call out_shapes carry no vma metadata
    )
    return jax.jit(fn)


@lru_cache(maxsize=None)
def _decode_band_jit(mesh: Mesh, h_loc: int, W: int, interpret: bool,
                     uniform8: bool = False):
    fn = jax.shard_map(
        partial(_decode_block_band, h_loc=h_loc, W=W, interpret=interpret,
                uniform8=uniform8),
        mesh=mesh,
        in_specs=(P("data", "tiles"), P("data", "tiles"), P("data", "tiles")),
        out_specs=P("data", "tiles", None),
        check_vma=False,  # pallas_call out_shapes carry no vma metadata
    )
    return jax.jit(fn)


@lru_cache(maxsize=None)
def _encode_xla_jit(mesh: Mesh):
    fn = jax.shard_map(
        _encode_block,
        mesh=mesh,
        in_specs=P("data", "tiles", None),
        out_specs=(
            P("data", "tiles"),  # depths: T dim band-sharded
            P("data", "tiles"),  # mins
            P("data", "tiles"),  # payload segments, concatenated band-major
            P("tiles", "data"),  # totals per shard
            P("tiles", "data"),  # bases per shard
        ),
    )
    return jax.jit(fn)


@lru_cache(maxsize=None)
def _decode_xla_jit(mesh: Mesh, H_local: int, W: int):
    fn = jax.shard_map(
        partial(_decode_block, H_local=H_local, W=W),
        mesh=mesh,
        in_specs=(P("data", "tiles"), P("data", "tiles"), P("data", "tiles")),
        out_specs=P("data", "tiles", None),
    )
    return jax.jit(fn)


# ---------------------------------------------------------------------------
# public sharded API
# ---------------------------------------------------------------------------


def _pad_to_bands(images: np.ndarray, n_tiles: int):
    """Edge-pad H so each of the ``n_tiles`` bands is a multiple of 8 rows."""
    B, H, W = images.shape
    unit = 8 * n_tiles
    Hp = -(-H // unit) * unit
    if Hp != H:
        images = np.concatenate(
            [images, np.repeat(images[:, -1:, :], Hp - H, axis=1)], axis=1
        )
    return images, Hp


def _resolve_backend(backend: str, W: int) -> str:
    """"band" = compiled Pallas band kernels per shard (the fast path on real
    chips — fold-aware, so explicit "band" works at EVERY width); "xla" =
    the gather-based blocks (differential baseline; its data-dependent
    gathers serialize on real TPUs).  "auto" picks band at fold-free widths
    and xla below (the narrow-width fold pays a <2x pad ratio that only
    makes sense on real chips — sharding narrow frames is not a production
    configuration, and the virtual-mesh test/driver paths would pay
    interpreter-mode band compiles for nothing)."""
    if backend == "auto":
        from ..codec import band_width

        return "band" if band_width(W) <= 3 * W else "xla"
    if backend not in ("band", "xla"):
        raise ValueError(f"unknown sharded backend {backend!r}")
    return backend


def encode_sharded(images, mesh: Mesh, backend: str = "auto"):
    """(B, H, W) u8 frames → sharded encoded arrays.

    ``B`` is sharded over ``data``; tile rows are sharded into ``tiles``
    bands.  Requires ``ceil(H/8) % n_tiles == 0`` (equal 8-row-aligned bands)
    so the output is bit-identical to the single-chip encoding — band-major
    tile order == global row-major tile order.

    Returns (depths (B,T) u8, mins (B,T) u8, payload (B, n_tiles*S_local)
    u32 per-shard worst-case segments, totals (n_tiles, B) i32 segment word
    counts, bases (n_tiles, B) i32 global word offsets, Hp).
    """
    images = np.asarray(images, dtype=np.uint8)
    B, H, W = images.shape
    n_tiles = mesh.shape["tiles"]
    backend = _resolve_backend(backend, W)
    if backend == "band":
        h, w, h_loc, L_real, L = _band_geometry(W, H, n_tiles)
        img32 = _prep_band_img32(images, n_tiles)
        depth, mn, payload, totals, bases = _encode_band_jit(
            mesh, h_loc, W, _mesh_interpret(mesh))(img32)
        return depth, mn, payload, totals, bases, 8 * h
    h = -(-H // 8)
    if h % n_tiles != 0:
        raise ValueError(
            f"tile rows ({h}) must divide evenly into {n_tiles} bands for "
            "bit-exact sharded encode; pick n_tiles dividing ceil(H/8)"
        )
    images, Hp = _pad_to_bands(images, n_tiles)
    depth, mn, payload, totals, bases = _encode_xla_jit(mesh)(images)
    return depth, mn, payload, totals, bases, Hp


def decode_sharded_dispatch(depths, mins, segments, mesh: Mesh, H: int, W: int,
                            Hp: int, backend: str = "auto",
                            uniform8: bool = False):
    """Dispatch a sharded decode asynchronously → an opaque pending value.

    Returns immediately after the (async) jit dispatch; pass the result to
    :func:`decode_sharded_materialize` to block and get the (B, H, W) u8
    numpy frames.  The split lets a walker overlap the next batch's host
    parse/split with the device decode (see :func:`iter_video_sharded`).
    """
    n_tiles = mesh.shape["tiles"]
    backend = _resolve_backend(backend, W)
    if backend == "band":
        h, w, h_loc, L_real, L = _band_geometry(W, H, n_tiles)
        out32 = _decode_band_jit(mesh, h_loc, W, _mesh_interpret(mesh),
                                 uniform8)(depths, mins, segments)
        return ("band", out32)
    H_local = Hp // n_tiles
    out = _decode_xla_jit(mesh, H_local, W)(depths, mins, segments)
    return ("xla", out)


def decode_sharded_materialize(pending, H: int, W: int) -> np.ndarray:
    """Block on a :func:`decode_sharded_dispatch` value → (B, H, W) u8."""
    kind, out = pending
    if kind == "band":
        return np.asarray(out).view(np.uint8)[:, :H, :W]
    return np.asarray(out[:, :H, :W])


def decode_sharded(depths, mins, segments, mesh: Mesh, H: int, W: int, Hp: int,
                   backend: str = "auto", uniform8: bool = False) -> np.ndarray:
    """Inverse of :func:`encode_sharded`; → (B, H, W) u8 numpy."""
    return decode_sharded_materialize(
        decode_sharded_dispatch(depths, mins, segments, mesh, H, W, Hp,
                                backend, uniform8), H, W)


def sharded_roundtrip_step(images, mesh: Mesh, backend: str = "auto"):
    """One full sharded encode→decode step (the framework's "training step"
    analogue): dp over frames + sp over tile bands, compiled as one program.
    Returns ((B, H, W) u8 numpy, global n64)."""
    images = np.asarray(images, dtype=np.uint8)
    B, H, W = images.shape
    n_tiles = mesh.shape["tiles"]
    backend = _resolve_backend(backend, W)
    if backend == "band":
        h, w, h_loc, L_real, L = _band_geometry(W, H, n_tiles)
        img32 = _prep_band_img32(images, n_tiles)
        interp = _mesh_interpret(mesh)

        def body_band(x_local):
            depth, mn, payload, total, base = _encode_block_band(
                x_local, h_loc, W, interp
            )
            out32 = _decode_block_band(depth, mn, payload, h_loc, W, interp)
            n64 = jax.lax.psum(jnp.sum(total), ("data", "tiles")) // 2
            return out32, n64

        fn = jax.shard_map(
            body_band,
            mesh=mesh,
            in_specs=P("data", "tiles", None),
            out_specs=(P("data", "tiles", None), P()),
            check_vma=False,  # pallas_call out_shapes carry no vma metadata
        )
        out32, n64 = jax.jit(fn)(img32)
        return np.asarray(out32).view(np.uint8)[:, :H, :W], n64
    padded, Hp = _pad_to_bands(images, n_tiles)
    H_local = Hp // n_tiles

    def step(x):
        def body(x_local):
            depth, mn, payload, total, base = _encode_block(x_local)
            out = _decode_block(depth, mn, payload, H_local, W)
            # global n64 via cross-mesh reduction (exercises ICI psum)
            n64 = jax.lax.psum(jnp.sum(total), ("data", "tiles")) // 2
            return out, n64

        fn = jax.shard_map(
            body,
            mesh=mesh,
            in_specs=P("data", "tiles", None),
            out_specs=(P("data", "tiles", None), P()),
        )
        out, n64 = fn(x)
        return out[:, :H, :W], n64

    out, n64 = jax.jit(step)(padded)
    return np.asarray(out), n64


def assemble_payload_host(segments, totals) -> list[np.ndarray]:
    """Per-frame flat u32 payloads from sharded segments (host ragged concat).

    segments: (B, n_tiles*16*T_local) u32; totals: (n_tiles, B) i32.
    """
    pay, n64 = assemble_payload_padded(segments, totals)
    return [pay[b, : 2 * int(n64[b])].copy() for b in range(pay.shape[0])]


def assemble_payload_padded(segments, totals, out=None):
    """Sharded segments → one padded (B, mx) u32 payload matrix + n64 (B,).

    The writer-side host leg: each frame's flat stream is its shards'
    live-prefix slices back to back, written straight into an UNINITIALIZED
    row-padded matrix — consumers (:func:`dbde_tpu.codec.record_iovecs`)
    only ever read ``2*n64`` words per row, so neither the inter-frame
    padding nor a zero fill is needed.  One contiguous memcpy per (frame,
    shard); no intermediate per-frame list, no second copy, no worst-case
    memset (the round-4 writer paid all three).

    ``out``: optional reusable (≥B, ≥mx) u32 buffer — fresh-page faults on
    a per-batch allocation, not the copies, dominate this leg (measured
    tools/probe_sharded_io.py); rows may be wider than mx (consumers read
    per-row prefixes).  Returns (matrix (B, ≥mx) u32, n64 (B,) i64);
    allocates when ``out`` is absent or too small.
    """
    totals = np.asarray(totals)
    n_tiles = totals.shape[0]
    segments = np.asarray(segments)
    B = segments.shape[0]
    segments = segments.reshape(B, n_tiles, -1)
    counts = totals.T.astype(np.int64)  # (B, n_tiles)
    bases = np.cumsum(counts, axis=1) - counts
    words = counts.sum(1)
    mx = int(words.max()) if B else 0
    if out is not None and out.shape[0] >= B and out.shape[1] >= mx:
        pay = out[:B]
    else:
        pay = np.empty((B, mx), np.uint32)
    for b in range(B):
        row = pay[b]
        for s in range(n_tiles):
            c = counts[b, s]
            row[bases[b, s] : bases[b, s] + c] = segments[b, s, :c]
    return pay, words // 2


def segment_slot_words(W: int, H: int, n_tiles: int, backend: str = "auto") -> int:
    """Per-shard payload segment slot size in u32 words — the stride both
    :func:`encode_sharded` emits and :func:`decode_sharded` expects per
    shard (worst-case 16 words/tile plus, for the band kernels, the staged
    DMA slack of pallas_band.payload_rows)."""
    backend = _resolve_backend(backend, W)
    h, w, h_loc, L_real, L = _band_geometry(W, H, n_tiles)
    if backend == "band":
        from ..codec import _fold_rows, band_fold
        from ..ops import pallas_band as pb

        Wp, k = band_fold(W, h_loc)
        hpf = pb.pad_rows(8 * (_fold_rows(h_loc, k) // k), k * Wp) // 8
        return pb.payload_rows(hpf * k * (Wp // 8)) * pb.LANES
    return 16 * h_loc * w


def split_payload_host(payload, depths, H: int, W: int, n_tiles: int,
                       backend: str = "auto", out=None) -> np.ndarray:
    """File-flat per-frame payloads → per-shard worst-case segments.

    The inverse of :func:`assemble_payload_host`, computable entirely on
    the host from per-band depth sums: shard ``s`` of frame ``b`` owns tile
    rows ``[s*h_loc, (s+1)*h_loc)``, so its segment is the
    ``2*Σ depths``-word slice of the flat stream starting at the exclusive
    prefix of the earlier shards' word counts (the same prefix the device
    encode derives with its one-scalar all_gather).  This is what lets a
    mesh decode a file's bytes — the walker→decoder coupling the reference
    has single-threaded (dbde_util.cpp:362-426), at mesh scale.

    payload: (B, S) u32 flat streams (any S ≥ each frame's 2*n64);
    depths: (B, T) u8.  Returns (B, n_tiles*S_local) u32 segments ready for
    :func:`decode_sharded`.  Slot words past each shard's live count are
    UNINITIALIZED: the decode window gathers mask dead lanes by depth, so
    output never depends on them (pinned by
    tests/test_parallel.py::test_decode_tolerates_garbage_segment_tails) —
    skipping the worst-case zero fill saves more host time per batch than
    the copies themselves cost (the slots are sized for 16 words/tile; live
    camera content fills ~a third of that).

    ``out``: optional reusable (B, n_tiles*S_local) u32 buffer.  Fresh-page
    faults on the worst-case-sized per-batch allocation dominate this leg
    (measured 14 ms/batch at 16×2048² vs ~2 ms for the copies,
    tools/probe_sharded_io.py) — :func:`iter_video_sharded` pools these
    buffers with the same release-gating discipline as the single-chip
    reader's parse pool.
    """
    depths = np.asarray(depths)
    payload = np.asarray(payload)
    B, T = depths.shape
    h, w = tile_grid(W, H)
    if h % n_tiles != 0:
        raise ValueError(
            f"tile rows ({h}) must divide evenly into {n_tiles} bands; "
            "pick n_tiles dividing ceil(H/8)"
        )
    h_loc = h // n_tiles
    counts = 2 * depths.reshape(B, n_tiles, h_loc * w).astype(np.int64).sum(-1)
    bases = np.cumsum(counts, axis=1) - counts
    S_local = segment_slot_words(W, H, n_tiles, backend)
    if out is None or out.shape != (B, n_tiles * S_local):
        out = np.empty((B, n_tiles * S_local), np.uint32)
    segs = out.reshape(B, n_tiles, S_local)
    for b in range(B):
        src = payload[b]
        for s in range(n_tiles):
            c = counts[b, s]
            segs[b, s, :c] = src[bases[b, s] : bases[b, s] + c]
    return out


# ---------------------------------------------------------------------------
# sharded file layer: the L3 walker/writer coupled to the mesh codec
# ---------------------------------------------------------------------------


def write_video_sharded(path, frames, mesh: Mesh, frame_hz: float = 1.0,
                        backend: str = "auto", batch_size: int = 16,
                        hz_as_integer: bool = False) -> None:
    """Encode a (N, H, W) u8 stack to a ``.dbde`` file on a device mesh.

    Each batch shards over the mesh (frames over ``data``, tile-row bands
    over ``tiles``); the host assembles the ragged payload segments
    (:func:`assemble_payload_host`) and writes records byte-identical to the
    single-chip writer — band-major tile order equals global row-major
    order, the invariant :func:`encode_sharded` guarantees.  Tail batches
    that don't fill the data axis are padded with repeated frames on device
    and dropped at the file boundary.
    """
    from ..codec import record_iovecs
    from ..format import VideoHeader
    from ..stream import _writev_all

    frames = np.asarray(frames, dtype=np.uint8)
    N, H, W = frames.shape
    n_data = mesh.shape["data"]
    step = max(batch_size - batch_size % n_data, n_data)
    pay_buf = None  # reused across batches; os.writev is synchronous, so
    # the buffer is free the moment _writev_all returns
    with open(path, "wb") as f:
        f.write(VideoHeader(height=H, width=W, frame_hz=frame_hz).pack(hz_as_integer))
        f.flush()  # the records below bypass the buffer via writev on the fd
        for i in range(0, N, step):
            batch = frames[i : i + step]
            n = batch.shape[0]
            if n % n_data:  # pad the tail to fill the data axis; drop below
                pad = n_data - n % n_data
                batch = np.concatenate([batch, np.repeat(batch[-1:], pad, 0)])
            depth, mn, payload, totals, bases, Hp = encode_sharded(
                batch, mesh, backend=backend)
            pay, n64 = assemble_payload_padded(payload, totals, out=pay_buf)
            if pay_buf is None or pay.shape[1] > pay_buf.shape[1]:
                pay_buf = pay if pay.base is None else None
            iov = record_iovecs(np.asarray(depth)[:n], np.asarray(mn)[:n],
                                pay[:n], n64[:n], indices=range(i, i + n))
            _writev_all(f.fileno(), iov)


def iter_video_sharded(path, mesh: Mesh, backend: str = "auto",
                       batch_size: int = 16, hz_as_integer: bool = False,
                       pipeline: int = 2, uniform8: bool = False):
    """Bounded-memory sharded file walker: yield (headers, (n, H, W) u8)
    batches of a ``.dbde`` file decoded across a device mesh.

    The mesh-scale analogue of the reference walker's fixed-buffer loop
    (dbde_util.cpp:372-426) and of the single-chip
    :meth:`DbdeReader._iter_device` pipeline: the host walker scans and
    parses records (mmap, no decode), each batch's flat payloads split into
    per-shard segments (:func:`split_payload_host`, host leg), and the mesh
    decode dispatches ASYNCHRONOUSLY — up to ``pipeline`` batches are in
    flight, so the next batch's parse+split overlaps the current decode.
    Memory is O(pipeline · batch) — parsed records, segments, and decoded
    frames for in-flight batches only, never the whole video.

    Tail batches pad the data axis with zero records (depth 0 everywhere —
    a frame of zeros) and slice them off after decode.
    """
    import collections

    from ..stream import DbdeReader

    n_data = mesh.shape["data"]
    n_tiles = mesh.shape["tiles"]
    with DbdeReader(path, batch_size=max(batch_size, n_data), device=False,
                    hz_as_integer=hz_as_integer) as rd:
        H, W = rd.height, rd.width
        Hp = 8 * tile_grid(W, H)[0]
        raw = rd.iter_raw()
        pending = collections.deque()
        seg_pool: dict = {}  # batch shape → free segment buffers (reused:
        # fresh worst-case allocations page-fault at ~1.3 GB/s, dominating
        # the split leg; release-gated like DbdeReader._pooled_batches —
        # a buffer returns only after its decode materialized, which
        # implies the h2d transfer consumed it)

        def dispatch():
            item = next(raw, None)
            if item is None:
                return False
            headers, (depths, mins, payload, n64) = item
            n = len(headers)
            if n % n_data:
                pad = n_data - n % n_data
                z8 = np.zeros((pad, depths.shape[1]), np.uint8)
                depths = np.concatenate([depths, z8])
                mins = np.concatenate([mins, z8])
                payload = np.concatenate(
                    [payload, np.zeros((pad, payload.shape[1]), np.uint32)])
            free = seg_pool.setdefault(depths.shape[0], [])
            buf = free.pop() if free else None
            segments = split_payload_host(payload, depths, H, W, n_tiles,
                                          backend, out=buf)
            out = decode_sharded_dispatch(depths, mins, segments, mesh, H=H,
                                          W=W, Hp=Hp, backend=backend,
                                          uniform8=uniform8)
            pending.append((headers, out, n, segments))
            return True

        while len(pending) < pipeline and dispatch():
            pass
        while pending:
            dispatch()  # overlap: parse + split + dispatch while device busy
            headers, out, n, segments = pending.popleft()
            frames = decode_sharded_materialize(out, H, W)[:n]
            # decode output on host ⇒ h2d transfer done ⇒ buffer free
            seg_pool[segments.shape[0]].append(segments)
            yield headers, frames


def read_video_sharded(path, mesh: Mesh, backend: str = "auto",
                       batch_size: int = 16, hz_as_integer: bool = False):
    """Decode a whole ``.dbde`` file on a device mesh →
    (VideoHeader, [FrameHeader], (N, H, W) u8).

    Whole-video convenience wrapper over :func:`iter_video_sharded` — use
    the iterator directly for unbounded streams.
    """
    from ..stream import DbdeReader

    headers_all, chunks = [], []
    for headers, frames in iter_video_sharded(
            path, mesh, backend=backend, batch_size=batch_size,
            hz_as_integer=hz_as_integer):
        headers_all.extend(headers)
        chunks.append(frames)
    with DbdeReader(path, hz_as_integer=hz_as_integer) as rd:
        header, H, W = rd.header, rd.height, rd.width
    frames = (np.concatenate(chunks) if chunks
              else np.empty((0, H, W), np.uint8))
    return header, headers_all, frames
