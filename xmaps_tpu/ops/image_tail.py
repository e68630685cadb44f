"""Dense per-frame image tail: dilate -> remap -> depth -> colorize.

Rebuilds the reference's per-frame OpenCV/Numba image stage
(disp_to_depth.py) as XLA ops that fuse into the single compiled frame
program:

- 7x7 max dilation of the sparse projector-view disparity map
  (cv2.dilate, disp_to_depth.py:74,86); for max-dilation, replicate border
  and -inf border are equivalent, so a plain reduce_window suffices;
- nearest remap rectified -> projector through the int16 inverse LUT
  (cv2.remap INTER_NEAREST/BORDER_CONSTANT, disp_to_depth.py:89-96);
- depth = P[0,3] / disp with zero-preserve (disp_to_depth.py:46-63);
- clip/normalize to uint8 with C-style truncation (disp_to_depth.py:7-21);
- TURBO colormap + white where undefined (disp_to_depth.py:24-43) so
  reprojected light retriggers events.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from xmaps_tpu.utils.colormap import TURBO_BGR_U8

__all__ = [
    "dilate_max",
    "remap_nearest_i16",
    "disparity_to_depth",
    "clip_normalize_u8",
    "colorize_turbo",
]


def dilate_max(img: jax.Array, ksize: int = 7) -> jax.Array:
    """Grayscale max-dilation with a ksize x ksize square structuring
    element, SAME padding (equivalent to cv2.dilate with BORDER_REPLICATE
    for max filters)."""
    return jax.lax.reduce_window(
        img,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(ksize, ksize),
        window_strides=(1, 1),
        padding="SAME",
    )


def remap_nearest_i16(
    img: jax.Array, mapx_i16: jax.Array, mapy_i16: jax.Array
) -> jax.Array:
    """Nearest remap through integer LUTs, BORDER_CONSTANT(0) semantics.

    ``out[i, j] = img[mapy[i, j], mapx[i, j]]`` where in bounds, else 0.
    """
    H, W = img.shape
    xi = mapx_i16.astype(jnp.int32)
    yi = mapy_i16.astype(jnp.int32)
    inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
    xc = jnp.clip(xi, 0, W - 1)
    yc = jnp.clip(yi, 0, H - 1)
    vals = img[yc, xc]
    return jnp.where(inb, vals, jnp.zeros((), dtype=img.dtype))


def disparity_to_depth(disp_map: jax.Array, p03: jax.Array) -> jax.Array:
    """depth = max(P[0,3] / disp, 1e-9), zero where disp == 0.

    The simplified rectified-depth formula of the reference
    (disp_to_depth.py:46-63), which neglects the rectification rotation.
    """
    safe = jnp.where(disp_map == 0.0, 1.0, disp_map)
    depth = jnp.maximum(p03 / safe, 1e-9)
    return jnp.where(disp_map == 0.0, 0.0, depth).astype(jnp.float32)


def clip_normalize_u8(
    depth: jax.Array, z_near: float, z_far: float
) -> jax.Array:
    """Clip to [z_near, z_far], scale to [0, 255], C-truncate to uint8.

    Matches clip_normalize_uint8_depth_frame (disp_to_depth.py:7-21)
    including the np.uint8() truncation (not rounding) and the quirk that
    depth == 0 stays 0 (undefined marker).
    """
    z_near = jnp.float32(z_near)
    z_far = jnp.float32(z_far)
    rng = z_far - z_near
    val = jnp.clip(depth, z_near, z_far)
    val = (val - z_near) / rng * 255.0
    val = jnp.where(depth == 0.0, 0.0, val)
    # guard against f32 rounding pushing 255.0 out of the u8 range (XLA's
    # out-of-range float->int conversion is implementation-defined)
    val = jnp.clip(val, 0.0, 255.0)
    return val.astype(jnp.uint8)  # truncation, as np.uint8(float) in numba


def colorize_turbo(norm_u8: jax.Array) -> jax.Array:
    """Apply the TURBO colormap (BGR) and paint undefined pixels white.

    Matches generate_color_map (disp_to_depth.py:34-43).
    """
    lut = jnp.asarray(TURBO_BGR_U8)
    rgb = lut[norm_u8.astype(jnp.int32)]
    white = jnp.full_like(rgb, 255)
    return jnp.where((norm_u8 == 0)[..., None], white, rgb)


def colorize_turbo_packed(norm_u8: jax.Array) -> jax.Array:
    """TURBO colormap as ONE u32 packed-BGR word per pixel
    (B | G<<8 | R<<16, entry 0 pre-whitened): the XLA twin of the Pallas
    packed-BGR display output -- one gather, no channel planes, no
    interleave.  Host unpacks with a numpy view at display rate."""
    v = TURBO_BGR_U8.astype(np.uint32)
    packed = v[:, 0] | (v[:, 1] << 8) | (v[:, 2] << 16)
    packed[0] = 0xFFFFFF  # undefined pixels render white
    return jnp.asarray(packed)[norm_u8.astype(jnp.int32)]
