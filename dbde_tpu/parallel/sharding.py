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

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..format import tile_grid
from ..ops.bitpack import (
    MAX_WORDS_PER_TILE,
    pack_tiles_to_words,
    unpack_words_to_tiles,
)
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
    ``n_tiles`` horizontal tile bands."""
    from ..codec import band_width
    from ..ops import pallas_band as pb

    h, w = tile_grid(W, H)
    if h % n_tiles != 0:
        raise ValueError(
            f"tile rows ({h}) must divide evenly into {n_tiles} bands for "
            "bit-exact sharded encode; pick n_tiles dividing ceil(H/8)"
        )
    Wp = band_width(W)
    h_loc = h // n_tiles  # tile rows per shard
    L_real = 8 * h_loc  # pixel rows per shard (format edge-padded)
    L = pb.pad_rows(L_real, Wp)  # zero-padded to whole kernel grid blocks
    return h, w, h_loc, L_real, L, Wp


def _prep_band_img32(images: np.ndarray, n_tiles: int):
    """(B, H, W) u8 → (B, n_tiles*L, Wp//4) u32: format edge padding to the
    ragged tile boundary, zero pad columns to the kernel width, and zero pad
    rows *per shard* so every shard is a whole number of kernel grid blocks
    (zero tiles have depth 0 and emit no payload words)."""
    B, H, W = images.shape
    h, w, h_loc, L_real, L, Wp = _band_geometry(W, H, n_tiles)
    h8, w8 = 8 * h, 8 * w
    img = images
    if w8 != W:
        img = np.concatenate([img, np.repeat(img[:, :, -1:], w8 - W, axis=2)], axis=2)
    if h8 != H:
        img = np.concatenate([img, np.repeat(img[:, -1:, :], h8 - H, axis=1)], axis=1)
    if Wp != w8:
        img = np.concatenate([img, np.zeros((B, h8, Wp - w8), np.uint8)], axis=2)
    if L != L_real:
        out = np.zeros((B, n_tiles * L, Wp), np.uint8)
        for k in range(n_tiles):
            out[:, k * L : k * L + L_real] = img[:, k * L_real : (k + 1) * L_real]
        img = out
    return np.ascontiguousarray(img).view(np.uint32)


def _encode_block_band(img32_local, h_loc: int, w: int, Wp: int, interpret: bool):
    """Band-kernel encode of one shard's (B_local, L, Wp//4) u32 block."""
    from ..ops import pallas_band as pb

    B = img32_local.shape[0]
    wpp = Wp // 8
    d3, m3, payload = pb.encode_band_kernel(img32_local, interpret=interpret)
    hp = d3.shape[1] * pb.LANES // wpp
    depths = d3.reshape(B, hp, wpp)[:, :h_loc, :w].reshape(B, h_loc * w)
    mins = m3.reshape(B, hp, wpp)[:, :h_loc, :w].reshape(B, h_loc * w)
    total = 2 * jnp.sum(depths.astype(jnp.int32), axis=-1)  # u32 words
    totals = jax.lax.all_gather(total, "tiles")  # (n_tiles, B_local)
    my = jax.lax.axis_index("tiles")
    mask = (jnp.arange(totals.shape[0]) < my)[:, None]
    base = jnp.sum(totals * mask, axis=0)
    return depths, mins, payload.reshape(B, -1), total[None, :], base[None, :]


def _decode_block_band(depths_local, mins_local, segment_local,
                       h_loc: int, w: int, W: int, Wp: int, interpret: bool):
    """Band-kernel decode of one shard's segment → (B, L_real, ceil(W/4)) u32."""
    from ..ops import pallas_band as pb

    B = depths_local.shape[0]
    wpp = Wp // 8
    hp8 = pb.pad_rows(8 * h_loc, Wp)
    hp = hp8 // 8
    tp = hp * wpp
    rows = pb.payload_rows(tp)
    d = jnp.zeros((B, hp, wpp), jnp.uint8).at[:, :h_loc, :w].set(
        depths_local.reshape(B, h_loc, w)
    )
    m = jnp.zeros((B, hp, wpp), jnp.uint8).at[:, :h_loc, :w].set(
        mins_local.reshape(B, h_loc, w)
    )
    p = segment_local.reshape(B, -1)
    if p.shape[1] < rows * pb.LANES:
        p = jnp.pad(p, ((0, 0), (0, rows * pb.LANES - p.shape[1])))
    img32 = pb.decode_band_kernel(
        d.reshape(B, tp // pb.LANES, pb.LANES),
        m.reshape(B, tp // pb.LANES, pb.LANES),
        p[:, : rows * pb.LANES].reshape(B, rows, pb.LANES),
        Wp,
        interpret=interpret,
    )
    return img32[:, : 8 * h_loc, : -(-W // 4)]


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
    chips); "xla" = the gather-based blocks (differential baseline; its
    data-dependent gathers serialize on real TPUs).  "auto" mirrors
    DbdeCodec's selection rule."""
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
        h, w, h_loc, L_real, L, Wp = _band_geometry(W, H, n_tiles)
        img32 = _prep_band_img32(images, n_tiles)
        fn = jax.shard_map(
            partial(_encode_block_band, h_loc=h_loc, w=w, Wp=Wp,
                    interpret=_mesh_interpret(mesh)),
            mesh=mesh,
            in_specs=P("data", "tiles", None),
            out_specs=(P("data", "tiles"), P("data", "tiles"), P("data", "tiles"),
                       P("tiles", "data"), P("tiles", "data")),
            check_vma=False,  # pallas_call out_shapes carry no vma metadata
        )
        depth, mn, payload, totals, bases = jax.jit(fn)(img32)
        return depth, mn, payload, totals, bases, 8 * h
    h = -(-H // 8)
    if h % n_tiles != 0:
        raise ValueError(
            f"tile rows ({h}) must divide evenly into {n_tiles} bands for "
            "bit-exact sharded encode; pick n_tiles dividing ceil(H/8)"
        )
    images, Hp = _pad_to_bands(images, n_tiles)

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
    depth, mn, payload, totals, bases = jax.jit(fn)(images)
    return depth, mn, payload, totals, bases, Hp


def decode_sharded(depths, mins, segments, mesh: Mesh, H: int, W: int, Hp: int,
                   backend: str = "auto") -> np.ndarray:
    """Inverse of :func:`encode_sharded`; → (B, H, W) u8 numpy."""
    n_tiles = mesh.shape["tiles"]
    backend = _resolve_backend(backend, W)
    if backend == "band":
        h, w, h_loc, L_real, L, Wp = _band_geometry(W, H, n_tiles)
        fn = jax.shard_map(
            partial(_decode_block_band, h_loc=h_loc, w=w, W=W, Wp=Wp,
                    interpret=_mesh_interpret(mesh)),
            mesh=mesh,
            in_specs=(P("data", "tiles"), P("data", "tiles"), P("data", "tiles")),
            out_specs=P("data", "tiles", None),
            check_vma=False,  # pallas_call out_shapes carry no vma metadata
        )
        out32 = jax.jit(fn)(depths, mins, segments)
        return np.asarray(out32).view(np.uint8)[:, :H, :W]
    H_local = Hp // n_tiles

    fn = jax.shard_map(
        partial(_decode_block, H_local=H_local, W=W),
        mesh=mesh,
        in_specs=(P("data", "tiles"), P("data", "tiles"), P("data", "tiles")),
        out_specs=P("data", "tiles", None),
    )
    out = jax.jit(fn)(depths, mins, segments)
    return np.asarray(out[:, :H, :W])


def sharded_roundtrip_step(images, mesh: Mesh, backend: str = "auto"):
    """One full sharded encode→decode step (the framework's "training step"
    analogue): dp over frames + sp over tile bands, compiled as one program.
    Returns ((B, H, W) u8 numpy, global n64)."""
    images = np.asarray(images, dtype=np.uint8)
    B, H, W = images.shape
    n_tiles = mesh.shape["tiles"]
    backend = _resolve_backend(backend, W)
    if backend == "band":
        h, w, h_loc, L_real, L, Wp = _band_geometry(W, H, n_tiles)
        img32 = _prep_band_img32(images, n_tiles)
        interp = _mesh_interpret(mesh)

        def body_band(x_local):
            depth, mn, payload, total, base = _encode_block_band(
                x_local, h_loc, w, Wp, interp
            )
            out32 = _decode_block_band(depth, mn, payload, h_loc, w, W, Wp, interp)
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
    totals = np.asarray(totals)
    n_tiles = totals.shape[0]
    segments = np.asarray(segments)
    B = segments.shape[0]
    segments = segments.reshape(B, n_tiles, -1)
    return [
        np.concatenate([segments[b, s, : totals[s, b]] for s in range(n_tiles)])
        for b in range(B)
    ]
