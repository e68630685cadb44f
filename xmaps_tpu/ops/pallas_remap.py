"""Pallas static-index remap: dest[i, j] = src[yi[i, j], xi[i, j]].

Used by the offline eval to rectify camera scans ON DEVICE (reference
remaps on host with cv2.remap and ships the 75 MB rectified image; here
the 1.2 MB scan is shipped and the remap runs as VMEM gathers).  The
integer index maps are precomputed on host with the reference's rounding
(calib.maps.remap_nearest: np.rint + BORDER_CONSTANT), so results are
bit-identical to the host remap; out-of-range destinations are pointed at
a dedicated zero row of the padded source.

Two variants:

- :func:`remap_static` -- the source image fits in VMEM (camera frames).
  Rows referenced by one (8, 128) destination block span a narrow band
  (rectification maps are smooth), so the gather uses the same banded
  lane/sublane take_along_axis walk as ops.pallas_events._banded_gather.
  When the index maps are CONCRETE (the usual case -- they are a pure
  function of the calibration), the per-block COLUMN-group span is also
  computed on host and the gather walks only that window: at the ESL
  eval geometry this cut the forward remap from 5.82 to 3.93 ms/scan
  (eval/profile_esl_init.py attribution, ESL_INIT_r05.json).
- :func:`remap_banded_hbm` -- the source is too large for VMEM (e.g. the
  ESL footprint-box disparity surface, ~37 MB).  The host precomputes,
  per 8-row destination strip, the source row band the strip reads
  (static maps again) and the kernel streams that band from HBM through
  a double-buffered VMEM scratch, prefetching strip i+1's band while
  strip i computes -- the same DMA pattern as
  ops.pallas_events._event_kernel_hbm.  Replaces XLA's serialized
  ~4 ns/element flat gather (2.5 ms/scan for the ESL back-remap).

Out-of-range destinations keep their CLAMPED row (so mixed blocks at the
valid-region boundary do not widen the band walk) and point their lane at
a dedicated zero column of the padded source (BORDER_CONSTANT); the HBM
variant instead clamps both indices and masks the output.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from xmaps_tpu.ops.pallas_events import _banded_gather, _round_up

__all__ = ["build_remap_indices", "remap_static", "remap_banded_hbm"]


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


def _nearest_valid_fill(vals: np.ndarray, ok: np.ndarray) -> np.ndarray:
    """Replace invalid entries with the nearest valid entry's value (same
    row first, whole-row vertical fill for all-invalid rows).

    Out-of-bounds destinations are masked to 0 AFTER the gather, so any
    in-range index works for them -- but build_remap_indices clamps them
    to row 0/H-1 and the zero column, which would blow up the banded
    kernels' host-computed row bands and column spans.  Borrowing the
    nearest valid lane's indices keeps every band exactly as tight as
    the valid data."""
    H, W = vals.shape
    if not ok.any():
        return np.zeros_like(vals)
    j = np.arange(W)[None, :]
    left = np.maximum.accumulate(np.where(ok, j, -1), axis=1)
    right = np.minimum.accumulate(
        np.where(ok, j, W)[:, ::-1], axis=1
    )[:, ::-1]
    dl = np.where(left >= 0, j - left, 1 << 30)
    dr = np.where(right < W, right - j, 1 << 30)
    pick = np.where(dl <= dr, left, right)
    row_has = ok.any(axis=1)
    filled = np.take_along_axis(
        vals, np.clip(pick, 0, W - 1), axis=1
    )
    if not row_has.all():
        i = np.arange(H)
        up = np.maximum.accumulate(np.where(row_has, i, -1))
        dn = np.minimum.accumulate(np.where(row_has, i, H)[::-1])[::-1]
        du = np.where(up >= 0, i - up, 1 << 30)
        dd = np.where(dn < H, dn - i, 1 << 30)
        prow = np.where(du <= dd, up, dn)
        filled = np.where(
            row_has[:, None], filled, filled[np.clip(prow, 0, H - 1)]
        )
    return filled


def _block_col_span(xi_p: np.ndarray) -> int:
    """Max column-group span of any (8, 128) block of a padded index map
    (the static bound _banded_gather's col_span path needs)."""
    H_pad, W_pad = xi_p.shape
    cg = np.asarray(xi_p, np.int64) >> 7
    blocks = cg.reshape(H_pad // 8, 8, W_pad // 128, 128)
    return int(
        (blocks.max(axis=(1, 3)) - blocks.min(axis=(1, 3)) + 1).max()
    )


def _remap_kernel(yi_ref, xi_ref, src_ref, out_ref, *, n_colgroups, blocks,
                  col_span):
    outs = []
    for b in range(blocks):
        sl = slice(b * 128, (b + 1) * 128)
        rows = yi_ref[:, sl]
        lanes = xi_ref[:, sl]
        outs.append(
            _banded_gather(
                src_ref, rows, lanes, n_colgroups,
                jnp.zeros((8, 128), jnp.float32), col_span=col_span,
            )
        )
    out_ref[:] = jnp.concatenate(outs, axis=1)


@functools.partial(
    jax.jit, static_argnames=("out_shape", "interpret", "col_span")
)
def _remap_static_call(src, yi, xi, out_shape, interpret, col_span):
    H, W = out_shape
    src = jnp.asarray(src, jnp.float32)
    Hs, Ws = src.shape
    Hs_pad = _round_up(Hs, 8)
    Ws_pad = _round_up(Ws + 1, 128)  # +1: dedicated zero column for OOB
    src_p = jnp.pad(src, ((0, Hs_pad - Hs), (0, Ws_pad - Ws)))

    H_pad = _round_up(H, 8)
    W_pad = _round_up(W, 128)

    strip = pl.BlockSpec((8, W_pad), lambda i: (i, 0), memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _remap_kernel, n_colgroups=Ws_pad // 128, blocks=W_pad // 128,
        col_span=col_span,
    )
    out = pl.pallas_call(
        kernel,
        grid=(H_pad // 8,),
        in_specs=[strip, strip, pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=strip,
        out_shape=jax.ShapeDtypeStruct((H_pad, W_pad), jnp.float32),
        interpret=interpret,
    )(yi, xi, src_p)
    return out[:H, :W]


def _pad_indices(yi, xi, out_shape, pad_col):
    H, W = out_shape
    H_pad = _round_up(H, 8)
    W_pad = _round_up(W, 128)
    # padded destination lanes are cropped from the output; index them
    # at the pad column so they cannot widen a block's row band
    yi_p = jnp.pad(
        jnp.asarray(yi, jnp.int32),
        ((0, H_pad - H), (0, W_pad - W)),
        constant_values=0,
    )
    xi_p = jnp.pad(
        jnp.asarray(xi, jnp.int32),
        ((0, H_pad - H), (0, W_pad - W)),
        constant_values=pad_col,
    )
    return yi_p, xi_p


def remap_static(src, yi, xi, out_shape, interpret: bool = False,
                 col_span: int | None = None, inb=None):
    """src (Hs, Ws) f32 + precomputed int index maps -> (H, W) f32.

    When yi/xi are concrete (not tracers), the per-block column-group
    span is derived on host automatically and the kernel walks only that
    window (see module docstring); pass ``col_span`` to override.

    ``inb``: the in-bounds mask from build_remap_indices (concrete).
    When given, out-of-bounds destinations borrow the nearest valid
    lane's indices (instead of the zero column at Ws, whose far column
    group would force the span to the full width) and the output is
    masked to 0 outside -- bit-identical results, banded speed."""
    Ws = src.shape[1]
    if inb is not None and not isinstance(yi, jax.core.Tracer):
        inb = np.asarray(inb, bool)
        yi = _nearest_valid_fill(np.asarray(yi, np.int32), inb)
        xi = _nearest_valid_fill(np.asarray(xi, np.int32), inb)
        H, W = out_shape
        H_pad = _round_up(H, 8)
        W_pad = _round_up(W, 128)
        yi_p = np.pad(yi, ((0, H_pad - H), (0, W_pad - W)), mode="edge")
        xi_p = np.pad(xi, ((0, H_pad - H), (0, W_pad - W)), mode="edge")
        if col_span is None:
            col_span = _block_col_span(xi_p)
        out = _remap_static_call(
            src, jnp.asarray(yi_p), jnp.asarray(xi_p), tuple(out_shape),
            interpret, col_span,
        )
        return jnp.where(jnp.asarray(inb), out, jnp.float32(0))
    yi_p, xi_p = _pad_indices(yi, xi, out_shape, pad_col=Ws)
    if col_span is None and not isinstance(xi_p, jax.core.Tracer):
        col_span = _block_col_span(np.asarray(xi_p))
    return _remap_static_call(src, yi_p, xi_p, tuple(out_shape),
                              interpret, col_span)


def _remap_hbm_kernel(
    base_ref,
    yi_ref,
    xi_ref,
    src_ref,
    out_ref,
    band,
    sems,
    *,
    n_colgroups,
    blocks,
    col_span,
    band_rows,
    n_strips,
):
    i = pl.program_id(0)
    slot = jax.lax.rem(i, 2)

    def strip_dma(strip, s):
        b0 = pl.multiple_of(base_ref[strip], 8)
        return pltpu.make_async_copy(
            src_ref.at[pl.ds(b0, band_rows), :], band.at[s], sems.at[s]
        )

    @pl.when(i == 0)
    def _():
        strip_dma(0, 0).start()

    @pl.when(i + 1 < n_strips)
    def _():
        strip_dma(i + 1, 1 - slot).start()

    strip_dma(i, slot).wait()
    base = base_ref[i]
    outs = []
    for b in range(blocks):
        sl = slice(b * 128, (b + 1) * 128)
        rows = yi_ref[:, sl] - base  # band-relative
        lanes = xi_ref[:, sl]
        outs.append(
            _banded_gather(
                band.at[slot], rows, lanes, n_colgroups,
                jnp.zeros((8, 128), jnp.float32), col_span=col_span,
            )
        )
    out_ref[:] = jnp.concatenate(outs, axis=1)


def _hbm_band_plan(src_shape, yi, xi, inb, out_shape):
    """Host prep shared by remap_banded_hbm and its viability check:
    filled/padded index maps, per-strip DMA bases, band height, column
    span, and whether the band fits VMEM."""
    Hs, Ws = src_shape
    H, W = out_shape
    inb = np.asarray(inb, bool)
    yi = np.clip(np.asarray(yi, np.int64), 0, Hs - 1).astype(np.int32)
    xi = np.clip(np.asarray(xi, np.int64), 0, Ws - 1).astype(np.int32)
    assert yi.shape == xi.shape == inb.shape == (H, W)
    # OOB lanes are masked to 0 after the gather; borrow nearby valid
    # indices so their clamped-to-extreme rows/cols don't blow up the
    # row bands (a single OOB lane would otherwise force a full-height
    # DMA band)
    yi = _nearest_valid_fill(yi, inb)
    xi = _nearest_valid_fill(xi, inb)

    H_pad = _round_up(H, 8)
    W_pad = _round_up(W, 128)
    # pad with edge replication: padded lanes (cropped from the output)
    # then never widen a strip's row band or a block's column span
    yi_p = np.pad(yi, ((0, H_pad - H), (0, W_pad - W)), mode="edge")
    xi_p = np.pad(xi, ((0, H_pad - H), (0, W_pad - W)), mode="edge")

    n_strips = H_pad // 8
    strips = yi_p.reshape(n_strips, 8 * W_pad)
    lo = (strips.min(axis=1) // 8) * 8
    hi = strips.max(axis=1) + 1
    band_rows = _round_up(max(int((hi - lo).max()), 8), 8)
    viable = 2 * band_rows * Ws * 4 <= 12 << 20
    # clamp the base so the static-height DMA stays inside src; the
    # window still contains [lo, hi) because hi <= Hs
    base = np.minimum(lo, max(Hs - band_rows, 0)).astype(np.int32)
    return inb, yi_p, xi_p, base, band_rows, _block_col_span(xi_p), viable


def banded_hbm_viable(src_shape, yi, xi, inb, out_shape) -> bool:
    """Whether :func:`remap_banded_hbm` can run these maps: the widest
    destination strip's source row band (after OOB index filling) must
    fit a double-buffered VMEM scratch.  Steeply rotated maps (e.g. the
    ESL back-remap's ~2.5 source rows per lane diagonal) fail this --
    the caller should use an XLA gather instead."""
    return _hbm_band_plan(src_shape, yi, xi, inb, out_shape)[-1]


def remap_banded_hbm(src, yi, xi, inb, out_shape, interpret: bool = False):
    """Large-source remap: dest = where(inb, src[yi, xi], 0).

    ``src``: (Hs, Ws) f32, Hs % 8 == 0 and Ws % 128 == 0 (e.g. the
    padded output of ops.pallas_esl.esl_disparity_search with
    emit_padded) -- it stays in HBM and each destination strip's row
    band is DMA'd to VMEM.  ``yi``/``xi``/``inb`` must be CONCRETE host
    arrays of shape ``out_shape`` (static remap maps): the per-strip DMA
    bases, the band height, and the column span are precomputed from
    them.  Bit-identical to ``where(inb, src[yi, xi], 0)``.  Callers
    must check :func:`banded_hbm_viable` first (asserted here).
    """
    Hs, Ws = src.shape
    assert Hs % 8 == 0 and Ws % 128 == 0, (Hs, Ws)
    H, W = out_shape
    inb, yi_p, xi_p, base, band_rows, col_span, viable = _hbm_band_plan(
        (Hs, Ws), yi, xi, inb, out_shape
    )
    assert viable, (
        f"remap_banded_hbm: a destination strip reads a {band_rows}-row "
        f"source band (> VMEM double-buffered) -- this map is not smooth "
        f"enough for strip banding; use the XLA gather instead "
        f"(see banded_hbm_viable)"
    )
    H_pad, W_pad = yi_p.shape
    n_strips = H_pad // 8

    kernel = functools.partial(
        _remap_hbm_kernel,
        n_colgroups=Ws // 128,
        blocks=W_pad // 128,
        col_span=col_span,
        band_rows=band_rows,
        n_strips=n_strips,
    )
    strip_spec = pl.BlockSpec(
        (8, W_pad), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_strips,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # per-strip DMA base
            strip_spec,
            strip_spec,
            pl.BlockSpec(memory_space=pl.ANY),  # src, HBM
        ],
        out_specs=strip_spec,
        out_shape=jax.ShapeDtypeStruct((H_pad, W_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, band_rows, Ws), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(
        jnp.asarray(base),
        jnp.asarray(yi_p),
        jnp.asarray(xi_p),
        jnp.asarray(src, jnp.float32),
    )
    return jnp.where(jnp.asarray(inb), out[:H, :W], jnp.float32(0))
