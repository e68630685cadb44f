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
    "build_event_gather_plan",
    "rectify_and_lookup",
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
    """Whether the padded int32 LUT + X-map fit the kernel's VMEM budget.

    Large rigs (e.g. the ESL eval's 3x-projector rectification, whose
    X-map is (5760, 1152) i32 = 26 MB) must fall back to the XLA gather
    path instead of failing Mosaic compilation."""
    cam_bytes = _round_up(cam_shape[0], 8) * _round_up(cam_shape[1], 128) * 4
    xmap_bytes = _round_up(xmap_shape[0], 8) * _round_up(xmap_shape[1], 128) * 4
    return cam_bytes + xmap_bytes <= TABLE_VMEM_BUDGET


class EventGatherPlan(NamedTuple):
    """Padded int32 device tables for the event gather kernel."""

    cam_lut: jax.Array  # (Hc_pad, Wc_pad) i32: mapy<<16 | (mapx & 0xffff)
    x_map: jax.Array  # (Hx_pad, Wx_pad) i32
    cam_h: int
    cam_w: int
    xmap_h: int
    xmap_w: int


def build_event_gather_plan(cam_map_packed, x_map) -> EventGatherPlan:
    cam = np.asarray(cam_map_packed)
    xm = np.asarray(x_map).astype(np.int32)
    Hc, Wc = cam.shape
    Hx, Wx = xm.shape
    cam_p = np.zeros((_round_up(Hc, 8), _round_up(Wc, 128)), np.int32)
    cam_p[:Hc, :Wc] = cam
    xm_p = np.zeros((_round_up(Hx, 8), _round_up(Wx, 128)), np.int32)
    xm_p[:Hx, :Wx] = xm
    return EventGatherPlan(
        cam_lut=jnp.asarray(cam_p),
        x_map=jnp.asarray(xm_p),
        cam_h=Hc,
        cam_w=Wc,
        xmap_h=Hx,
        xmap_w=Wx,
    )


def _banded_gather(table_ref, rows, lanes, n_colgroups, acc0):
    """acc[i,j] = table[rows[i,j], lanes[i,j]] for all (i,j) whose row falls
    in [min(rows)//8*8, max(rows)//8*8+8); other lanes keep acc0.

    rows/lanes: (BLOCK//128, 128) i32, lanes in-range of the table width.
    Inner loop cost: 4 vector ops per (row, column-group) pair -- the
    (row, colgroup) match is folded into one key compare, and the
    in-group lane indices are hoisted out of the row loops.
    """
    rg_lo = jnp.min(rows) // 8
    rg_hi = jnp.max(rows) // 8 + 1

    # per-lane key: target row and column group in one comparable word
    cgi = lanes >> 7
    key = rows * n_colgroups + cgi
    l_cg = lanes & 127  # lane index within its column group

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

    # --- X-map lookup ---------------------------------------------------
    yg = jnp.clip(yr, 0, xmap_h - 1)
    tg = jnp.clip(t, 0, xmap_w - 1)
    xproj_ref[:] = _banded_gather(
        x_map_ref, yg, tg, xmap_colgroups, jnp.zeros(yg.shape, jnp.int32)
    )


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
