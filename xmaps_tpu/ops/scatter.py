"""Deterministic disparity-map scatter (device).

The reference scatters per-event disparities into a dense map with NumPy
fancy indexing, whose semantics are "last write in index order wins"
(cam_proj_calibration.py:299-317).  A plain XLA scatter with duplicate
indices has unspecified winner order, so we make the reduction associative:
each event's integer-valued disparity is packed with its batch index as

    packed = (event_index + 1) * PACK + disp

and scattered with max.  The highest event index wins -- exactly NumPy's
last-write-wins -- and unpacking recovers the disparity.  This keeps the
op deterministic, reproducible across shardings (see parallel/), and
bit-identical to the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["scatter_disp_last_wins", "scatter_disp_packed", "unpack_disp", "PACK"]

#: Must exceed any valid disparity (bounded by the rectified image width,
#: <= ~5800 for the ESL configuration).  (capacity+1) * PACK must fit in
#: int32: 65537 * 8192 = 5.4e8 < 2^31.
PACK = 8192


def scatter_disp_packed(
    ys: jax.Array,
    xs: jax.Array,
    disp: jax.Array,
    inlier: jax.Array,
    *,
    height: int,
    width: int,
    index_offset: jax.Array | int = 0,
) -> jax.Array:
    """Scatter index-packed disparities with max; returns the packed map.

    ``index_offset`` shifts the event indices used for the last-write-wins
    priority, so event shards on different devices keep globally consistent
    ordering: the partial packed maps combine exactly with an elementwise
    max (see parallel.sharding for the pmax-composed version).
    """
    n = ys.shape[0]
    disp_i = disp.astype(jnp.int32)
    ok = (
        inlier
        & (ys >= 0)
        & (ys < height)
        & (xs >= 0)
        & (xs < width)
        & (disp_i >= 0)
        & (disp_i < PACK)
    )
    idx = jnp.arange(n, dtype=jnp.int32) + index_offset
    packed = jnp.where(ok, (idx + 1) * PACK + disp_i, 0)
    # Out-of-bounds scatter indices are dropped; route masked lanes there.
    ys_s = jnp.where(ok, ys, height)
    flat = jnp.zeros((height * width,), dtype=jnp.int32)
    lin = ys_s * width + xs
    flat = flat.at[lin].max(packed, mode="drop")
    return flat.reshape(height, width)


def unpack_disp(packed: jax.Array) -> jax.Array:
    """Recover the float32 disparity map from a packed map."""
    return (packed % PACK).astype(jnp.float32)


def scatter_disp_last_wins(
    ys: jax.Array,
    xs: jax.Array,
    disp: jax.Array,
    inlier: jax.Array,
    *,
    height: int,
    width: int,
) -> jax.Array:
    """Scatter integer-valued disparities; last valid event per pixel wins.

    Args:
        ys, xs: (N,) int32 target pixel coordinates.
        disp: (N,) float32 integer-valued disparities (>= 0 for inliers).
        inlier: (N,) bool; non-inliers are dropped.
        height, width: output map size.

    Returns:
        (height, width) float32 disparity map, 0 where no event landed.
    """
    return unpack_disp(
        scatter_disp_packed(
            ys, xs, disp, inlier, height=height, width=width
        )
    )
