"""Fused Pallas TPU kernel for the per-event gather stage.

XLA lowers arbitrary-index gathers on TPU to ~10 ns/element scalar loops,
which makes the two per-event table lookups of the depth pipeline (packed
rectification LUT + X-map column lookup, reference
cam_proj_calibration.py:277-281 and x_maps_disparity.py:25) the dominant
per-frame cost (~0.5 ms at 32k events).  This kernel keeps both tables
resident in VMEM and performs the gathers with vector lane/sublane
dynamic_gathers (jnp.take_along_axis), visiting only the 8-row table bands
a block of events actually touches:

- events are pre-sorted by raw y on device (jax.lax.sort, ~20 us at 32k --
  the winner-priority is carried explicitly so sorting cannot change
  results);
- a block of 1024 sorted events then spans a narrow band of camera rows
  (and, because rectification is smooth, a narrow band of X-map rows), so
  the per-block fori_loops run with *traced* bounds [ymin//8, ymax//8] --
  typically 3-15 of the 60/165 row-groups;
- within an active row-group, the gather decomposes exactly: for each of
  the 8 sublane rows and each 128-lane column group, broadcast the table
  row segment and take_along_axis by the in-segment lane index, selecting
  lanes whose (row, column-group) match.

The kernel returns raw (x_rect, y_rect, x_proj) per event; disparity,
masking, packing and the scatter stay in the existing JAX ops so the
semantics (and bit-exactness vs the NumPy oracle) are inherited.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "EventGatherPlan",
    "EventGatherHBMPlan",
    "build_event_gather_plan",
    "build_event_gather_hbm_plan",
    "rectify_and_lookup",
    "rectify_and_lookup_hbm",
    "tables_fit_vmem",
    "BLOCK",
]

#: events per grid step (8 sublanes x 128 lanes).  Swept on v5e at 28k
#: events/frame: 1024 -> 387 us/frame, 2048 -> 450, 4096 -> 591 -- larger
#: blocks span more table row groups (y-spread grows with block size),
#: which costs more than the saved per-step overhead.  The kernel is
#: shape-generic, so retuning for other sensors is a one-line change.
BLOCK = 1024

#: VMEM budget for the two resident tables (the core has ~16 MB; leave
#: room for event blocks, outputs and double buffering).
TABLE_VMEM_BUDGET = 10 * 2**20


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def tables_fit_vmem(cam_shape, xmap_shape) -> bool:
    """Whether the padded int32 LUT + pair-packed X-map fit the kernel's
    VMEM budget.

    The X-map stores TWO i16 entries per i32 word (adjacent time bins;
    values are < 2^15 so both halves extract exactly), so its footprint
    is half the naive i32 table.  Rigs that still exceed the budget
    (e.g. the ESL eval's (5760, 1080) X-map, 13 MB packed) use the
    HBM-banded variant instead of failing Mosaic compilation."""
    cam_bytes = _round_up(cam_shape[0], 8) * _round_up(cam_shape[1], 128) * 4
    xmap_bytes = (
        _round_up(xmap_shape[0], 8)
        * _round_up(-(-xmap_shape[1] // 2), 128)
        * 4
    )
    return cam_bytes + xmap_bytes <= TABLE_VMEM_BUDGET


def _pack_xmap_pairs(x_map: np.ndarray) -> np.ndarray:
    """(H, W) X-map -> (H_pad8, ceil(W/2)_pad128) i32 with word j holding
    entries 2j (low half) and 2j+1 (high half).  Entries are in
    [0, X_OFFSET + W_rect) < 2^15, so both halves are sign-free."""
    xm = np.asarray(x_map).astype(np.int32)
    Hx, Wx = xm.shape
    assert xm.min() >= 0 and xm.max() < (1 << 15), "X-map exceeds u15"
    Wp = -(-Wx // 2)
    pairs = np.zeros((_round_up(Hx, 8), _round_up(Wp, 128)), np.int32)
    pairs[:Hx, : Wx - Wx // 2] = xm[:, 0::2]
    pairs[:Hx, : Wx // 2] |= xm[:, 1::2] << 16
    return pairs


class EventGatherPlan(NamedTuple):
    """Padded int32 device tables for the event gather kernel."""

    cam_lut: jax.Array  # (Hc_pad, Wc_pad) i32: mapy<<16 | (mapx & 0xffff)
    x_map: jax.Array  # (Hx_pad, ceil(Wx/2)_pad) i32, TWO entries per word
    cam_h: int
    cam_w: int
    xmap_h: int
    xmap_w: int  # ORIGINAL time-bin count (clipping bound)


def build_event_gather_plan(cam_map_packed, x_map) -> EventGatherPlan:
    cam = np.asarray(cam_map_packed)
    Hc, Wc = cam.shape
    Hx, Wx = np.asarray(x_map).shape
    cam_p = np.zeros((_round_up(Hc, 8), _round_up(Wc, 128)), np.int32)
    cam_p[:Hc, :Wc] = cam
    return EventGatherPlan(
        cam_lut=jnp.asarray(cam_p),
        x_map=jnp.asarray(_pack_xmap_pairs(x_map)),
        cam_h=Hc,
        cam_w=Wc,
        xmap_h=Hx,
        xmap_w=Wx,
    )


def _banded_gather(table_ref, rows, lanes, n_colgroups, acc0, col_span=None):
    """acc[i,j] = table[rows[i,j], lanes[i,j]] for all (i,j) whose row falls
    in [min(rows)//8*8, max(rows)//8*8+8); other lanes keep acc0.

    rows/lanes: (BLOCK//128, 128) i32, lanes in-range of the table width.
    Inner loop cost: 4 vector ops per (row, column-group) pair -- the
    (row, colgroup) match is folded into one key compare, and the
    in-group lane indices are hoisted out of the row loops.

    ``col_span``: static bound on the number of COLUMN groups this
    block's lanes span (max(lanes)//128 - min(lanes)//128 + 1 <= span;
    the caller must guarantee it, e.g. computed on host from static
    remap index maps -- ops.pallas_remap).  The column-group loop then
    walks only a span-wide window loaded at a dynamic 128-aligned
    offset, instead of all n_colgroups groups: for smooth remap maps
    (span ~2 of 26 groups) this is most of the gather's cost.
    """
    rg_lo = jnp.min(rows) // 8
    rg_hi = jnp.max(rows) // 8 + 1
    cgi = lanes >> 7
    l_cg = lanes & 127  # lane index within its column group

    if col_span is not None and col_span < n_colgroups:
        # clamp keeps the window load in bounds; [min(cgi), max(cgi)]
        # still fits because max(cgi) <= n_colgroups - 1
        cg_lo = jnp.minimum(jnp.min(cgi), n_colgroups - col_span)
        key = rows * col_span + (cgi - cg_lo)
        col0 = pl.multiple_of(cg_lo * 128, 128)

        def body_w(rg, acc):
            row0 = pl.multiple_of(rg * 8, 8)
            tab = table_ref[pl.ds(row0, 8), pl.ds(col0, col_span * 128)]
            for s in range(8):
                seg_row = tab[s : s + 1, :]
                for cg in range(col_span):
                    seg = jnp.broadcast_to(
                        seg_row[:, cg * 128 : (cg + 1) * 128], acc0.shape
                    )
                    v = jnp.take_along_axis(seg, l_cg, axis=1)
                    sel = key == (row0 + s) * col_span + cg
                    acc = jnp.where(sel, v, acc)
            return acc

        return jax.lax.fori_loop(rg_lo, rg_hi, body_w, acc0)

    # per-lane key: target row and column group in one comparable word
    key = rows * n_colgroups + cgi

    def body(rg, acc):
        row0 = pl.multiple_of(rg * 8, 8)
        tab = table_ref[pl.ds(row0, 8), :]
        for s in range(8):
            seg_row = tab[s : s + 1, :]
            for cg in range(n_colgroups):
                seg = jnp.broadcast_to(
                    seg_row[:, cg * 128 : (cg + 1) * 128], acc0.shape
                )
                v = jnp.take_along_axis(seg, l_cg, axis=1)
                sel = key == (row0 + s) * n_colgroups + cg
                acc = jnp.where(sel, v, acc)
        return acc

    return jax.lax.fori_loop(rg_lo, rg_hi, body, acc0)


def _event_kernel(
    x_ref,
    y_ref,
    t_ref,
    cam_lut_ref,
    x_map_ref,
    xr_ref,
    yr_ref,
    xproj_ref,
    *,
    cam_h,
    cam_w,
    xmap_h,
    xmap_w,
    cam_colgroups,
    xmap_colgroups,
):
    x = x_ref[:]
    y = y_ref[:]
    t = t_ref[:]

    # --- rectify: one gather through the packed LUT --------------------
    yc = jnp.clip(y, 0, cam_h - 1)
    xc = jnp.clip(x, 0, cam_w - 1)
    packed = _banded_gather(
        cam_lut_ref, yc, xc, cam_colgroups, jnp.zeros(x.shape, jnp.int32)
    )
    xr = (packed << 16) >> 16
    yr = packed >> 16
    xr_ref[:] = xr
    yr_ref[:] = yr

    # --- X-map lookup (pair-packed: word j = entries 2j | 2j+1 << 16,
    # halving the per-row-group column-group loop) ----------------------
    yg = jnp.clip(yr, 0, xmap_h - 1)
    tg = jnp.clip(t, 0, xmap_w - 1)
    word = _banded_gather(
        x_map_ref, yg, tg >> 1, xmap_colgroups,
        jnp.zeros(yg.shape, jnp.int32),
    )
    # entries are < 2^15, so the arithmetic extracts are exact
    xproj_ref[:] = jnp.where((tg & 1) == 1, word >> 16, word & 0xFFFF)


class EventGatherHBMPlan(NamedTuple):
    """Tables for the large-X-map event kernel: the camera LUT stays
    VMEM-resident, the X-map stays in HBM and is streamed to VMEM in
    ``band_rows``-row chunks per event block.

    Rigs like the ESL eval geometry (X-map (5760, 1152) i32 = 26 MB
    against a ~16 MB VMEM) cannot keep the X-map resident.  Events sorted
    by camera row only touch a narrow band of X-map rows per 1024-event
    block, and that band is *predictable from the raw rows alone*: the
    per-camera-row envelope of clipped rectified rows (built on host from
    the same mapy LUT the kernel gathers through) bounds every event's
    X-map row.  A cheap XLA pre-pass turns each block's raw-row min/max
    into a DMA base + row-group count, which also lets block i prefetch
    block i+1's band (double-buffered) — the DMA rides under the gather
    compute instead of serializing with it.
    """

    cam_lut: jax.Array  # (Hc_pad, Wc_pad) i32: mapy<<16 | (mapx & 0xffff)
    #: (Hx_pad + band_rows, ceil(Wx/2)_pad) i32 pair-packed X-map in HBM
    x_map_hbm: jax.Array
    lo_env: jax.Array  # (Hc,) i32: min clipped X-map row for raw rows >= y
    hi_env: jax.Array  # (Hc,) i32: max clipped X-map row for raw rows <= y
    cam_h: int
    cam_w: int
    xmap_h: int
    xmap_w: int  # ORIGINAL time-bin count (clipping bound)
    band_rows: int


def build_event_gather_hbm_plan(
    cam_map_packed, x_map, band_rows: int = 256
) -> EventGatherHBMPlan:
    """band_rows: X-map rows DMA'd per chunk (multiple of 8).  Sized so one
    chunk covers a typical sorted block's row span; larger bands trade HBM
    traffic for fewer (rare) extra-chunk stalls."""
    assert band_rows % 8 == 0
    cam = np.asarray(cam_map_packed)
    Hc, Wc = cam.shape
    Hx, Wx = np.asarray(x_map).shape
    cam_p = np.zeros((_round_up(Hc, 8), _round_up(Wc, 128)), np.int32)
    cam_p[:Hc, :Wc] = cam
    # pair-packed rows (halved width = halved DMA bytes per band), padded
    # by one extra band so the last chunk's static-height DMA stays in
    # bounds for any 8-aligned base below the real row range
    pairs = _pack_xmap_pairs(x_map)
    xm_p = np.zeros((pairs.shape[0] + band_rows, pairs.shape[1]), np.int32)
    xm_p[: pairs.shape[0]] = pairs

    # Per-raw-row envelope of clip(mapy, 0, Hx-1) over the full x range,
    # monotonized into suffix-min / prefix-max so a block's [ymin, ymax]
    # range query is two lookups (exact for monotonic rectification maps,
    # conservative otherwise).
    mapy = (cam.astype(np.int32) >> 16).astype(np.int32)
    yg_tab = np.clip(mapy, 0, Hx - 1)
    row_lo = yg_tab.min(axis=1)
    row_hi = yg_tab.max(axis=1)
    lo_env = np.minimum.accumulate(row_lo[::-1])[::-1]
    hi_env = np.maximum.accumulate(row_hi)

    return EventGatherHBMPlan(
        cam_lut=jnp.asarray(cam_p),
        x_map_hbm=jnp.asarray(xm_p),
        lo_env=jnp.asarray(lo_env.astype(np.int32)),
        hi_env=jnp.asarray(hi_env.astype(np.int32)),
        cam_h=Hc,
        cam_w=Wc,
        xmap_h=Hx,
        xmap_w=Wx,
        band_rows=band_rows,
    )


def _event_kernel_hbm(
    base_ref,
    groups_ref,
    x_ref,
    y_ref,
    t_ref,
    cam_lut_ref,
    x_map_ref,
    xr_ref,
    yr_ref,
    xproj_ref,
    band,
    sems,
    *,
    cam_h,
    cam_w,
    xmap_h,
    xmap_w,
    cam_colgroups,
    xmap_colgroups,
    band_rows,
    nb,
):
    i = pl.program_id(0)
    slot = jax.lax.rem(i, 2)

    def first_dma(blk, s):
        b0 = pl.multiple_of(base_ref[blk], 8)
        return pltpu.make_async_copy(
            x_map_ref.at[pl.ds(b0, band_rows), :], band.at[s], sems.at[s]
        )

    @pl.when(i == 0)
    def _():
        first_dma(0, 0).start()

    @pl.when(i + 1 < nb)
    def _():
        first_dma(i + 1, 1 - slot).start()

    x = x_ref[:]
    y = y_ref[:]
    t = t_ref[:]

    # --- rectify through the VMEM-resident camera LUT -----------------
    yc = jnp.clip(y, 0, cam_h - 1)
    xc = jnp.clip(x, 0, cam_w - 1)
    packed = _banded_gather(
        cam_lut_ref, yc, xc, cam_colgroups, jnp.zeros(x.shape, jnp.int32)
    )
    xr = (packed << 16) >> 16
    yr = packed >> 16
    xr_ref[:] = xr
    yr_ref[:] = yr

    # --- X-map lookup from the streamed band (pair-packed: word j =
    # entries 2j | 2j+1 << 16, halving both the column-group loop and
    # the DMA bytes per band) ------------------------------------------
    yg = jnp.clip(yr, 0, xmap_h - 1)
    tg = jnp.clip(t, 0, xmap_w - 1)
    jw = tg >> 1
    cgi = jw >> 7
    key = yg * xmap_colgroups + cgi
    l_cg = jw & 127

    base0 = base_ref[i]
    groups = groups_ref[i]
    RG = band_rows // 8

    def gather_chunk(chunk_base, band_slot, ngroups, acc):
        # rows [chunk_base, chunk_base + ngroups*8) are resident in
        # band_slot at band-relative offsets
        def body(g, acc):
            tab = band_slot[pl.ds(pl.multiple_of(g * 8, 8), 8), :]
            row_key0 = (chunk_base + g * 8) * xmap_colgroups
            for s in range(8):
                seg_row = tab[s : s + 1, :]
                for cg in range(xmap_colgroups):
                    seg = jnp.broadcast_to(
                        seg_row[:, cg * 128 : (cg + 1) * 128], acc.shape
                    )
                    v = jnp.take_along_axis(seg, l_cg, axis=1)
                    sel = key == row_key0 + s * xmap_colgroups + cg
                    acc = jnp.where(sel, v, acc)
            return acc

        return jax.lax.fori_loop(0, ngroups, body, acc)

    first_dma(i, slot).wait()
    acc = gather_chunk(
        base0,
        band.at[slot],
        jnp.minimum(groups, RG),
        jnp.zeros(yg.shape, jnp.int32),
    )

    # rare tail: a block spanning more than one band streams the extra
    # chunks serially through the third slot
    nchunks = (groups + RG - 1) // RG

    def extra(c, acc):
        eb = pl.multiple_of(base0 + c * band_rows, 8)
        cp = pltpu.make_async_copy(
            x_map_ref.at[pl.ds(eb, band_rows), :], band.at[2], sems.at[2]
        )
        cp.start()
        cp.wait()
        ng = jnp.minimum(groups - c * RG, RG)
        return gather_chunk(eb, band.at[2], ng, acc)

    acc = jax.lax.fori_loop(1, nchunks, extra, acc)
    # entries are < 2^15, so the arithmetic extracts are exact
    xproj_ref[:] = jnp.where((tg & 1) == 1, acc >> 16, acc & 0xFFFF)


def rectify_and_lookup_hbm(
    x: jax.Array,
    y: jax.Array,
    t_scaled: jax.Array,
    plan: EventGatherHBMPlan,
    interpret: bool = False,
    band_bounds: jax.Array | None = None,
):
    """Large-table variant of :func:`rectify_and_lookup`: same contract and
    bit-identical results, with the X-map streamed from HBM per block.
    Sort events by raw y first for performance (not correctness).

    ``band_bounds``: optional (n/BLOCK, 2) int32 [8-aligned row base,
    row-group count] per block, exact bounds computed by the host when it
    sorted the batch by RECTIFIED row (XMapsDepthEngine.make_sorted_batch)
    -- tighter than the on-device raw-row envelope bound, which must
    assume each camera row's full x-spread."""
    n = x.shape[0]
    assert n % BLOCK == 0, f"capacity {n} not a multiple of {BLOCK}"
    nb = n // BLOCK
    rows = n // 128
    block_rows = BLOCK // 128
    R = plan.band_rows
    RG = R // 8

    if band_bounds is not None:
        base = band_bounds[:, 0]
        groups = band_bounds[:, 1]
    else:
        # per-block DMA plan from raw rows alone (reduction + two tiny
        # gathers; no dependence on the rectified values being computed)
        yb = jnp.clip(y, 0, plan.cam_h - 1).reshape(nb, BLOCK)
        lo = plan.lo_env[jnp.min(yb, axis=1)]
        hi = plan.hi_env[jnp.max(yb, axis=1)]
        base = (lo // 8) * 8
        groups = hi // 8 + 1 - lo // 8

    def blk(a):
        return a.reshape(rows, 128)

    kernel = functools.partial(
        _event_kernel_hbm,
        cam_h=plan.cam_h,
        cam_w=plan.cam_w,
        xmap_h=plan.xmap_h,
        xmap_w=plan.xmap_w,
        cam_colgroups=plan.cam_lut.shape[1] // 128,
        xmap_colgroups=plan.x_map_hbm.shape[1] // 128,
        band_rows=R,
        nb=nb,
    )
    ev_spec = pl.BlockSpec(
        (block_rows, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((rows, 128), jnp.int32)
    xr, yr, xproj = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # base
            pl.BlockSpec(memory_space=pltpu.SMEM),  # groups
            ev_spec,
            ev_spec,
            ev_spec,
            pl.BlockSpec(memory_space=pltpu.VMEM),  # cam LUT, resident
            pl.BlockSpec(memory_space=pl.ANY),  # X-map, HBM
        ],
        out_specs=[ev_spec] * 3,
        out_shape=[out_shape] * 3,
        scratch_shapes=[
            pltpu.VMEM((3, R, plan.x_map_hbm.shape[1]), jnp.int32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(
        base.astype(jnp.int32),
        groups.astype(jnp.int32),
        blk(x),
        blk(y),
        blk(t_scaled),
        plan.cam_lut,
        plan.x_map_hbm,
    )
    return xr.reshape(n), yr.reshape(n), xproj.reshape(n)


def rectify_and_lookup(
    x: jax.Array,
    y: jax.Array,
    t_scaled: jax.Array,
    plan: EventGatherPlan,
    interpret: bool = False,
):
    """(N,) i32 event coords + X-map time bins -> (xr, yr, x_proj), each
    (N,) i32.  Bit-identical to rectify_events_packed + the clipped X-map
    gather of compute_event_disparity.  N must be a multiple of 1024; sort
    events by y first for performance (not correctness)."""
    n = x.shape[0]
    assert n % BLOCK == 0, f"capacity {n} not a multiple of {BLOCK}"
    grid = n // BLOCK
    rows = n // 128
    block_rows = BLOCK // 128

    def blk(a):
        return a.reshape(rows, 128)

    kernel = functools.partial(
        _event_kernel,
        cam_h=plan.cam_h,
        cam_w=plan.cam_w,
        xmap_h=plan.xmap_h,
        xmap_w=plan.xmap_w,
        cam_colgroups=plan.cam_lut.shape[1] // 128,
        xmap_colgroups=plan.x_map.shape[1] // 128,
    )
    ev_spec = pl.BlockSpec(
        (block_rows, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((rows, 128), jnp.int32)
    xr, yr, xproj = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            ev_spec,
            ev_spec,
            ev_spec,
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[ev_spec] * 3,
        out_shape=[out_shape] * 3,
        interpret=interpret,
    )(blk(x), blk(y), blk(t_scaled), plan.cam_lut, plan.x_map)
    return xr.reshape(n), yr.reshape(n), xproj.reshape(n)
