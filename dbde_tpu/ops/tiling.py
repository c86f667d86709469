"""Frame ↔ 8×8-tile layout transforms (the L1 tile loop, data-parallel).

Reference behavior: images are cut into ceil(H/8) × ceil(W/8) tiles row-major;
ragged edges are constant-padded right-then-down with the last valid value
(dbde_util.cpp:105-135, README.md:52).  ``edge`` padding on both axes is
exactly that rule, applied to the whole frame at once instead of per-tile.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..format import tile_grid


def pad_and_tile(images: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W) u8 → (B, T, 64) u8; tiles row-major, pixels row-major in-tile."""
    B, H, W = images.shape
    h, w = tile_grid(W, H)
    padded = jnp.pad(images, ((0, 0), (0, 8 * h - H), (0, 8 * w - W)), mode="edge")
    return (
        padded.reshape(B, h, 8, w, 8)
        .transpose(0, 1, 3, 2, 4)
        .reshape(B, h * w, 64)
    )


def untile(tiles: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    """(B, T, 64) u8 → (B, H, W) u8 (drops padded margins)."""
    B = tiles.shape[0]
    h, w = tile_grid(W, H)
    padded = (
        tiles.reshape(B, h, w, 8, 8)
        .transpose(0, 1, 3, 2, 4)
        .reshape(B, 8 * h, 8 * w)
    )
    return padded[:, :H, :W]
