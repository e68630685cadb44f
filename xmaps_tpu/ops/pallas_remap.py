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
  (eval/profile_esl_init.py attribution, ESL_INIT_r05.json).  With a
  concrete ``inb`` mask the kernel can further switch to the two-gather
  form (``method``): the source ROW indices are pre-composed on host
  into source-column space (layered where destinations conflict --
  :func:`_compose_two_gather`), so each (row-group, column-group,
  layer) candidate costs one sublane gather + one lane gather + select
  instead of an 8-row broadcast-select walk.
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
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from xmaps_tpu.ops.pallas_events import _banded_gather, _round_up

__all__ = [
    "build_remap_indices",
    "remap_static",
    "remap_banded_hbm",
    "prepare_remap_static",
    "apply_remap_static",
]


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


def _compose_two_gather(yi_p, xi_p, n_colgroups, col_span):
    """Host index composition for the two-gather remap kernel.

    A 2D gather out[i,j] = src[yi[i,j], xi[i,j]] cannot be split into a
    sublane take_along_axis followed by a lane take_along_axis -- the
    row index would be re-evaluated at the gathered lane.  But the maps
    are STATIC, so the row indices can be pre-composed: store the source
    row in SOURCE-column space, R[i, c] = yi at the destination (i, j)
    with xi[i,j] = c.  Then
        v[i, jw] = band[R[i, jw], jw]        (sublane gather)
        w[i, j]  = v[i, xi[i,j] & 127]       (lane gather)
    lands src[yi, xi] at (i, j) exactly.  When two destinations on one
    output row read the same source column with DIFFERENT source rows,
    R gets one LAYER per distinct row (rank by row value); K = max
    layers is geometry-static (e.g. 3 at the ESL eval rotation).

    Returns (key2, R (K, H_pad, n_colgroups*128), K): key2[i,j] =
    ((yi//8)*col_span + (cgi - cg_lo_block))*K + layer picks exactly one
    (rg, cg, layer) kernel iteration per destination; the kernel
    re-derives cg_lo_block from xi and the row-group walk bounds from
    key2's block min/max (key2 is lexicographic in (rg, cgrel, layer)).
    """
    H_pad, W_pad = yi_p.shape
    yi_p = np.asarray(yi_p, np.int64)
    xi_p = np.asarray(xi_p, np.int64)
    n_strips, blocks = H_pad // 8, W_pad // 128

    # layer ranks: unique (output row, source col, source row) triples,
    # ranked by source row within each (row, col) group
    A = n_colgroups * 128
    i_idx = np.repeat(np.arange(H_pad, dtype=np.int64), W_pad)
    c_flat = xi_p.ravel()
    r_flat = yi_p.ravel()
    B = int(r_flat.max()) + 2
    trip = (i_idx * A + c_flat) * B + r_flat
    u = np.unique(trip)
    gid = u // B
    starts = np.r_[0, np.flatnonzero(np.diff(gid)) + 1]
    counts = np.diff(np.r_[starts, len(u)])
    rank = np.arange(len(u)) - np.repeat(starts, counts)
    K = int(rank.max()) + 1
    layer = rank[np.searchsorted(u, trip)].reshape(H_pad, W_pad)

    R = np.zeros((K, H_pad, A), np.int32)
    ui = gid // A
    uc = gid % A
    ur = (u % B).astype(np.int32)
    R[rank, ui, uc] = ur

    cgi = (xi_p >> 7).reshape(n_strips, 8, blocks, 128)
    cg_lo = np.minimum(
        cgi.min(axis=(1, 3)), n_colgroups - col_span
    )
    cgrel = (xi_p >> 7) - np.repeat(
        np.repeat(cg_lo, 8, axis=0), 128, axis=1
    )
    key2 = (((yi_p >> 3) * col_span + cgrel) * K + layer).astype(np.int32)
    return key2, R, K


def _remap_kernel_composed(
    key_ref, xi_ref, R_ref, src_ref, out_ref, *,
    n_colgroups, blocks, col_span, K,
):
    outs = []
    for b in range(blocks):
        sl = slice(b * 128, (b + 1) * 128)
        key = key_ref[:, sl]
        xi = xi_ref[:, sl]
        lcg = xi & 127
        cg0 = jnp.minimum(jnp.min(xi >> 7), n_colgroups - col_span)
        col0 = pl.multiple_of(cg0 * 128, 128)
        # key2 is lexicographic in (rg, cgrel, layer): block min/max
        # recover the row-group walk bounds
        rg_lo = jnp.min(key) // (col_span * K)
        rg_hi = jnp.max(key) // (col_span * K) + 1

        def body(rg, acc, key=key, lcg=lcg, col0=col0):
            row0 = pl.multiple_of(rg * 8, 8)
            tab = src_ref[pl.ds(row0, 8), pl.ds(col0, col_span * 128)]
            for ly in range(K):
                Rw = R_ref[ly, :, pl.ds(col0, col_span * 128)]
                idx = (Rw - row0) & 7  # legal for any value; garbage
                for cg in range(col_span):  # dies in the key select
                    csl = slice(cg * 128, (cg + 1) * 128)
                    v = jnp.take_along_axis(
                        tab[:, csl], idx[:, csl], axis=0
                    )
                    w = jnp.take_along_axis(v, lcg, axis=1)
                    sel = key == (rg * col_span + cg) * K + ly
                    acc = jnp.where(sel, w, acc)
            return acc

        outs.append(
            jax.lax.fori_loop(
                rg_lo, rg_hi, body, jnp.zeros((8, 128), jnp.float32)
            )
        )
    out_ref[:] = jnp.concatenate(outs, axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("out_shape", "interpret", "col_span", "K"),
)
def _remap_static_composed_call(
    src, key2, xi_p, R, out_shape, interpret, col_span, K
):
    H, W = out_shape
    src = jnp.asarray(src, jnp.float32)
    Hs, Ws = src.shape
    Hs_pad = _round_up(Hs, 8)
    Ws_pad = _round_up(Ws + 1, 128)
    src_p = jnp.pad(src, ((0, Hs_pad - Hs), (0, Ws_pad - Ws)))

    H_pad = _round_up(H, 8)
    W_pad = _round_up(W, 128)

    strip = pl.BlockSpec((8, W_pad), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(
            _remap_kernel_composed,
            n_colgroups=Ws_pad // 128, blocks=W_pad // 128,
            col_span=col_span, K=K,
        ),
        grid=(H_pad // 8,),
        in_specs=[
            strip,
            strip,
            pl.BlockSpec(
                (K, 8, Ws_pad), lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=strip,
        out_shape=jax.ShapeDtypeStruct((H_pad, W_pad), jnp.float32),
        interpret=interpret,
    )(key2, xi_p, R, src_p)
    return out[:H, :W]


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


class RemapStaticCfg(NamedTuple):
    """Static (hashable) half of a prepared remap; see
    :func:`prepare_remap_static`."""

    out_shape: tuple
    col_span: int
    K: int  # 0 = walk kernel, >0 = composed two-gather with K layers


def prepare_remap_static(yi, xi, inb, out_shape, src_width,
                         col_span: int | None = None,
                         method: str = "auto"):
    """Host-side preparation of a static remap for use INSIDE a caller's
    jit with the index maps as runtime ARGUMENTS.

    Passing multi-MB index arrays as trace-time constants embeds them in
    the HLO; on a remote-compiled device (tunneled TPU) that blows the
    compile-request payload.  This splits the remap into a hashable
    static config and a tuple of host arrays the caller device_puts once
    and threads through its jit:

        cfg, arrs = prepare_remap_static(yi, xi, inb, out_shape, Ws)
        arrs_dev = tuple(jax.device_put(a) for a in arrs)
        @jax.jit
        def step(src, arrs):
            out = apply_remap_static(src, arrs, cfg)  # (H, W), masked

    Equivalent to remap_static(src, yi, xi, out_shape, inb=inb) -- same
    kernels, same auto method selection, bit-identical.
    """
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
    n_colgroups = _round_up(src_width + 1, 128) // 128
    # "auto" currently means walk: at the ESL eval geometry (K=3,
    # col_span=2) the static op-count model predicts a ~2x composed win,
    # but the full-program totals measured EQUAL (composed + hoisted
    # search prep 9.80 ms/scan vs walk + inline prep 9.76) -- i.e. the
    # composed kernel gave back roughly what the prep hoist saved.
    # Walk is the measured-best default; composed stays opt-in.
    use_composed = method == "composed"
    if use_composed:
        key2, R, K = _compose_two_gather(yi_p, xi_p, n_colgroups, col_span)
    if use_composed:
        cfg = RemapStaticCfg(tuple(out_shape), col_span, K)
        return cfg, (key2, xi_p, R, inb)
    cfg = RemapStaticCfg(tuple(out_shape), col_span, 0)
    return cfg, (yi_p, xi_p, inb)


def apply_remap_static(src, arrs, cfg: RemapStaticCfg,
                       interpret: bool = False):
    """Traceable half of :func:`prepare_remap_static`."""
    if cfg.K > 0:
        key2, xi_p, R, inb = arrs
        out = _remap_static_composed_call(
            src, key2, xi_p, R, cfg.out_shape, interpret,
            cfg.col_span, cfg.K,
        )
    else:
        yi_p, xi_p, inb = arrs
        out = _remap_static_call(
            src, yi_p, xi_p, cfg.out_shape, interpret, cfg.col_span
        )
    return jnp.where(inb, out, jnp.float32(0))


def remap_static(src, yi, xi, out_shape, interpret: bool = False,
                 col_span: int | None = None, inb=None,
                 method: str = "auto"):
    """src (Hs, Ws) f32 + precomputed int index maps -> (H, W) f32.

    When yi/xi are concrete (not tracers), the per-block column-group
    span is derived on host automatically and the kernel walks only that
    window (see module docstring); pass ``col_span`` to override.

    ``inb``: the in-bounds mask from build_remap_indices (concrete).
    When given, out-of-bounds destinations borrow the nearest valid
    lane's indices (instead of the zero column at Ws, whose far column
    group would force the span to the full width) and the output is
    masked to 0 outside -- bit-identical results, banded speed.

    ``method`` (concrete inb path only): "walk" = the 8-row
    broadcast-select band walk; "composed" = the two-gather kernel with
    host-precomposed layered row tables (_compose_two_gather); "auto"
    currently selects walk (measured best at the ESL geometry; see
    prepare_remap_static).  Bit-identical either way."""
    Ws = src.shape[1]
    if inb is not None and not isinstance(yi, jax.core.Tracer):
        cfg, arrs = prepare_remap_static(
            yi, xi, inb, out_shape, Ws,
            col_span=col_span, method=method,
        )
        return apply_remap_static(
            src, tuple(jnp.asarray(a) for a in arrs), cfg,
            interpret=interpret,
        )
    assert method == "auto", "method requires a concrete inb path"
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
