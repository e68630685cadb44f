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

#: Disparity field width when the priority is a pixel raster index (frame
#: dedup filter paths); (max_key + 1) * PACK_WIDE must fit in uint32.
PACK_WIDE = 4096


def scatter_disp_packed(
    ys: jax.Array,
    xs: jax.Array,
    disp: jax.Array,
    inlier: jax.Array,
    *,
    height: int,
    width: int,
    index_offset: jax.Array | int = 0,
    priority: jax.Array | None = None,
    priority_is_event_index: bool = False,
    pad_shape: tuple[int, int] | None = None,
) -> jax.Array:
    """Scatter index-packed disparities with max; returns the packed map.

    The last-write-wins priority is the event index by default (NumPy
    fancy-indexing order); ``index_offset`` shifts it so event shards on
    different devices keep globally consistent ordering (partial packed
    maps then combine exactly with an elementwise max -- see
    parallel.sharding).  ``priority`` overrides it entirely: the frame
    dedup filters re-emit events in pixel raster order, so their scatters
    use the raster index as priority (ops.filters).  ``pad_shape`` scatters
    into a larger zero-padded map (rows/cols beyond height/width stay 0)
    so the Pallas tail kernel can consume the packed map directly without
    a separate unpack + pad pass.
    """
    n = ys.shape[0]
    out_h, out_w = pad_shape if pad_shape is not None else (height, width)
    assert out_h >= height and out_w >= width
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
    if priority is None or priority_is_event_index:
        # event-index priorities (< capacity) fit the int32 PACK scheme
        if priority is None:
            priority = jnp.arange(n, dtype=jnp.int32) + index_offset
        packed = jnp.where(ok, (priority + 1) * PACK + disp_i, 0)
    else:
        # Filter paths: priorities are pixel raster indices (up to ~1e6), so
        # pack into uint32 with a smaller disparity field.  Valid for
        # (max_key + 1) * PACK_WIDE <= 2^32, asserted by the caller.
        ok = ok & (disp_i < PACK_WIDE)
        packed = jnp.where(
            ok,
            (priority.astype(jnp.uint32) + 1) * jnp.uint32(PACK_WIDE)
            + disp_i.astype(jnp.uint32),
            jnp.uint32(0),
        )
        flat = jnp.zeros((out_h * out_w,), dtype=jnp.uint32)
        ys_s = jnp.where(ok, ys, out_h)
        lin = ys_s * out_w + xs
        flat = flat.at[lin].max(packed, mode="drop")
        return flat.reshape(out_h, out_w)
    # Out-of-bounds scatter indices are dropped; route masked lanes there.
    ys_s = jnp.where(ok, ys, out_h)
    flat = jnp.zeros((out_h * out_w,), dtype=jnp.int32)
    lin = ys_s * out_w + xs
    flat = flat.at[lin].max(packed, mode="drop")
    return flat.reshape(out_h, out_w)


def unpack_disp(packed: jax.Array) -> jax.Array:
    """Recover the float32 disparity map from a packed map."""
    pack = PACK_WIDE if packed.dtype == jnp.uint32 else PACK
    return (packed % pack).astype(jnp.float32)


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
