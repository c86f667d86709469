"""Ragged payload ↔ dense per-tile windows, via prefix-summed offsets.

The reference walks tiles serially, advancing a cursor by ``8*depth`` bytes
per tile (dbde_util.cpp:155,312) — the only true serialization in the format.
Here that cursor becomes an exclusive prefix sum over per-tile u32 word counts
(``2*depth``), after which every tile's payload location is known and all
tiles move in parallel:

  * encode: dense (T, 16) windows scatter to a flat payload ("compaction");
  * decode: flat payload gathers into dense (T, 16) windows.

Shapes are static: the flat payload buffer is worst-case sized (16 words per
tile); the true length ``2*n64`` is data and is returned alongside.  Core
functions operate on one frame; batch dims are vmapped.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .bitpack import MAX_WORDS_PER_TILE


def word_offsets(depths: jnp.ndarray):
    """depths (..., T) i32 → (exclusive u32-word offsets (..., T), total (...,)).

    ``offsets[t] = 2 * Σ_{s<t} depth[s]`` — tile t's payload starts at u32
    word ``offsets[t]`` of the flat stream; total = 2*n64.
    """
    counts = 2 * depths
    incl = jnp.cumsum(counts, axis=-1)
    return incl - counts, incl[..., -1]


def _compact_1d(words: jnp.ndarray, offsets: jnp.ndarray, total: jnp.ndarray) -> jnp.ndarray:
    """(T, 16) u32 dense windows → (16*T,) u32 flat payload (zero-padded).

    ``tile_of[p]`` (the tile owning output word p) is a parallel searchsorted
    over tile starts: scatter-add a marker at each tile's start offset, then
    inclusive-cumsum.  Duplicate starts (empty tiles) accumulate correctly.
    """
    T = offsets.shape[0]
    N = T * MAX_WORDS_PER_TILE
    markers = jnp.zeros((N,), dtype=jnp.int32)
    starts = jnp.minimum(offsets[1:], N - 1).astype(jnp.int32)
    markers = markers.at[starts].add(1)
    tile_of = jnp.cumsum(markers)  # tile_of[p] = #tiles t>=1 with offsets[t] <= p
    p = jnp.arange(N, dtype=jnp.int32)
    within = p - offsets[tile_of]
    out = words.reshape(N)[tile_of * MAX_WORDS_PER_TILE + within]
    return jnp.where(p < total, out, jnp.uint32(0))


def _gather_1d(payload: jnp.ndarray, offsets: jnp.ndarray) -> jnp.ndarray:
    """(N,) u32 flat payload → (T, 16) u32 dense windows.

    Reads past the stream tail (tiles with depth < 8) are clamped — those
    lanes are never selected by the depth-k extract in bitpack.py.
    """
    N = payload.shape[0]
    idx = offsets[:, None].astype(jnp.int32) + jnp.arange(MAX_WORDS_PER_TILE, dtype=jnp.int32)
    return payload[jnp.minimum(idx, N - 1)]


def compact_payload(words: jnp.ndarray, offsets: jnp.ndarray, total: jnp.ndarray) -> jnp.ndarray:
    """Dense (..., T, 16) → flat (..., 16*T) u32 payload (leading dims vmapped)."""
    fn = _compact_1d
    for _ in range(words.ndim - 2):
        fn = jax.vmap(fn)
    return fn(words, offsets, total)


def gather_windows(payload: jnp.ndarray, offsets: jnp.ndarray) -> jnp.ndarray:
    """Flat (..., N) u32 payload → dense (..., T, 16) u32 windows."""
    fn = _gather_1d
    for _ in range(payload.ndim - 1):
        fn = jax.vmap(fn)
    return fn(payload, offsets)
