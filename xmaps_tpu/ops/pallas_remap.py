"""Pallas static-index remap: dest[i, j] = src[yi[i, j], xi[i, j]].

Used by the offline eval to rectify camera scans ON DEVICE (reference
remaps on host with cv2.remap and ships the 75 MB rectified image; here
the 1.2 MB scan is shipped and the remap runs as VMEM gathers).  The
integer index maps are precomputed on host with the reference's rounding
(calib.maps.remap_nearest: np.rint + BORDER_CONSTANT), so results are
bit-identical to the host remap; out-of-range destinations are pointed at
a dedicated zero row of the padded source.

The source image must fit in VMEM (a few MB -- true for camera frames);
rows referenced by one (8, 128) destination block span a narrow band
(rectification maps are smooth), so the gather uses the same banded
lane/sublane take_along_axis walk as ops.pallas_events._banded_gather.
Out-of-range destinations keep their CLAMPED row (so mixed blocks at the
valid-region boundary do not widen the band walk) and point their lane at
a dedicated zero column of the padded source (BORDER_CONSTANT).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from xmaps_tpu.ops.pallas_events import _banded_gather, _round_up

__all__ = ["build_remap_indices", "remap_static"]


def build_remap_indices(map_x: np.ndarray, map_y: np.ndarray, src_shape):
    """Host-precomputed integer index maps with remap_nearest semantics.

    Returns (yi, xi, inb): int32 index arrays of map shape plus the
    in-bounds mask.  Out-of-range destinations get a clamped row and the
    padded zero column Ws (see module docstring); callers doing plain XLA
    flat gathers should instead use the mask with their own clamping."""
    Hs, Ws = src_shape
    xi = np.rint(np.asarray(map_x)).astype(np.int64)
    yi = np.rint(np.asarray(map_y)).astype(np.int64)
    inb = (xi >= 0) & (xi < Ws) & (yi >= 0) & (yi < Hs)
    yi = np.clip(yi, 0, Hs - 1).astype(np.int32)
    xi = np.where(inb, np.clip(xi, 0, Ws - 1), Ws).astype(np.int32)
    return yi, xi, inb


def _remap_kernel(yi_ref, xi_ref, src_ref, out_ref, *, n_colgroups, blocks):
    outs = []
    for b in range(blocks):
        sl = slice(b * 128, (b + 1) * 128)
        rows = yi_ref[:, sl]
        lanes = xi_ref[:, sl]
        outs.append(
            _banded_gather(
                src_ref, rows, lanes, n_colgroups,
                jnp.zeros((8, 128), jnp.float32),
            )
        )
    out_ref[:] = jnp.concatenate(outs, axis=1)


@functools.partial(jax.jit, static_argnames=("out_shape", "interpret"))
def remap_static(src, yi, xi, out_shape, interpret: bool = False):
    """src (Hs, Ws) f32 + precomputed int index maps -> (H, W) f32."""
    H, W = out_shape
    src = jnp.asarray(src, jnp.float32)
    Hs, Ws = src.shape
    Hs_pad = _round_up(Hs, 8)
    Ws_pad = _round_up(Ws + 1, 128)  # +1: dedicated zero column for OOB
    src_p = jnp.pad(src, ((0, Hs_pad - Hs), (0, Ws_pad - Ws)))

    H_pad = _round_up(H, 8)
    W_pad = _round_up(W, 128)

    def padidx(a):
        # padded destination lanes are cropped from the output; index them
        # at the zero column so they cannot widen a block's row band
        return jnp.pad(
            jnp.asarray(a, jnp.int32),
            ((0, H_pad - H), (0, W_pad - W)),
            constant_values=0,
        )

    yi_p = padidx(yi)
    xi_p = jnp.pad(
        jnp.asarray(xi, jnp.int32),
        ((0, H_pad - H), (0, W_pad - W)),
        constant_values=Ws,
    )

    strip = pl.BlockSpec((8, W_pad), lambda i: (i, 0), memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _remap_kernel, n_colgroups=Ws_pad // 128, blocks=W_pad // 128
    )
    out = pl.pallas_call(
        kernel,
        grid=(H_pad // 8,),
        in_specs=[strip, strip, pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=strip,
        out_shape=jax.ShapeDtypeStruct((H_pad, W_pad), jnp.float32),
        interpret=interpret,
    )(yi_p, xi_p, src_p)
    return out[:H, :W]
