"""Fused Pallas TPU kernel for the dense image tail.

Replaces the XLA chain dilate -> remap -> depth -> normalize -> colorize
(reference: disp_to_depth.py:76-115) with ONE kernel over output tiles.
XLA's general gather on TPU costs ~10ns/element (~9.5 ms for the 921k-pixel
remap); this kernel exploits the static smoothness of the rectification
maps instead:

- For each (TH, 128) output tile (TH=128 default; taller tiles amortize
  per-step DMA/semaphore/bookkeeping costs), the source pixels live in a
  small axis-aligned band of the rectified disparity map (the maps are
  near-affine: ~1.03 px/row vertically, ~2.44 px/col horizontally, plus a
  few pixels of lens distortion).  The band (RB x CB, precomputed bounds)
  is DMA'd to VMEM, double-buffered across grid steps.
- The 7x7 max-dilation runs on the band in VMEM (separable shifted maxes;
  the +3 halo is included in the band, and zero padding equals
  border-replicate for non-negative disparity).
- The 2D gather decomposes into two exact 1D steps:
  (a) row alignment: aligned[s, c] = dilated[yhat(i0+s, c) - row0, c],
      where yhat places, for every output row, the needed source row at
      every source column it reads (scattered at init, gap-filled with the
      nearest used column);  executed as Mosaic sublane dynamic_gathers
      ((8, 128) table/index) with select-over-row-groups;
  (b) column gather: out[s, l] = aligned[s, X(i0+s, j) - col0], as lane
      dynamic_gathers with select-over-128-column-groups.
  Step (b) evaluates yhat exactly at the scattered positions, so the
  composition equals dilated[Y(i,j), X(i,j)] bit-for-bit.
- depth = P[0,3]/disp, u8 normalization (C-truncation) and the 256-entry
  TURBO colormap (two lane gathers over the split LUT halves + select)
  fuse into the same tile pass.

Everything indexful is precomputed on host at init into a TailPlan.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from xmaps_tpu.utils.colormap import TURBO_BGR_U8

__all__ = [
    "TailPlan",
    "build_tail_plan",
    "pallas_tail",
    "CamTailPlan",
    "build_cam_tail_plan",
    "pallas_colorize",
]


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@dataclass(frozen=True)
class TailPlan:
    """Static gather plan for the fused tail kernel (host-precomputed).

    The plan works on a CROP of the rectified frame: the kernel only ever
    reads rect pixels the projector remap samples (plus the 3-px dilate
    halo), and at large rigs that window is a small fraction of the rect
    frame (the ESL eval geometry reads ~1230x720 of 5760x3240 -- 4.7%).
    Scatter targets outside the crop cannot influence any output pixel
    (they are > dilate-radius away from every sampled source), so
    cropping is bit-exact.  ``crop_row0/crop_col0`` locate the crop in
    full-rect coordinates; the packed scatter map the kernel consumes has
    the crop's padded dims (ops.scatter window scatter).
    """

    full_H: int  # full rectified image height
    full_W: int
    crop_row0: int  # crop origin in full-rect coordinates
    crop_col0: int
    H: int  # crop height (unpadded)
    W: int  # crop width
    H_pad: int  # padded crop dims (row0/col0 clamps stay in-bounds)
    W_pad: int
    Hp: int  # output (projector) height
    Wp: int
    Hp_pad: int
    Wp_pad: int
    TH: int  # output tile height (multiple of 8)
    TW: int  # output tile width (multiple of 128)
    RB: int  # band rows per tile (multiple of 8)
    CB: int  # band cols per tile (multiple of 128)
    GR: int  # grid rows (Hp_pad / TH)
    GC: int  # grid cols (Wp_pad / TW)

    row0: np.ndarray  # (GR*GC,) i32 band row starts
    col0: np.ndarray  # (GR*GC,) i32 band col starts
    #: (GR*GC*4,) i32: per (tile, 8-output-row sub-block) band-relative
    #: 8-aligned first source row actually referenced; the kernel's
    #: row-group loop covers [qbase, qbase + QH*8) instead of the whole
    #: band
    qbase: np.ndarray
    QH: int  # row groups per sub-block (global max, typically 2-3)
    #: (Hp_pad, Wp_pad) i32: absolute rect col; bit 20 selects the yhat slot
    #: (two output pixels can share a rect column with different source
    #: rows at i16 rounding boundaries); -1 if out of bounds
    x_abs: np.ndarray
    yhat_a: np.ndarray  # (Hp_pad, W_pad) i16 source row per rect col (last writer)
    yhat_b: np.ndarray  # (Hp_pad, W_pad) i16 source row per rect col (first writer)

    p03: float
    z_near: float
    z_far: float


def build_tail_plan(
    proj_mapx_i16: np.ndarray,
    proj_mapy_i16: np.ndarray,
    rect_height: int,
    rect_width: int,
    p03: float,
    z_near: float,
    z_far: float,
    tile: tuple[int, int] | None = None,
) -> TailPlan:
    """Precompute band bounds and the two-pass gather tables.

    ``tile`` is the output tile footprint per grid step.  Taller tiles
    amortize the per-step costs (DMA issue, semaphores, grid bookkeeping)
    over more pixels; the width stays at 128 lanes so the per-micro-block
    band column-group loop stays narrow.  With ``tile=None`` the height
    is chosen automatically: 128 for demonstrator-scale outputs (the
    round-2 sweep optimum) and the tallest budget-fitting tile from
    {960..128} for larger outputs (the ESL eval geometry sweep was
    monotone up to 960: 0.475 -> 0.434 ms/frame, round 3).
    """
    TW = 128
    Hp, Wp = proj_mapx_i16.shape
    if tile is not None:
        TH, TW = tile
        candidates = [TH]
    else:
        # tallest tile that fits the VMEM budget (checked below) without
        # burning >20% of the grid on padding rows.  Round-3 sweeps:
        # demonstrator (Hp=1280) 128/256/640 -> 0.339/0.324/0.318 ms;
        # ESL (Hp=1920) 128..960 -> 0.475..0.434 ms.
        candidates = [
            th for th in (960, 640, 512, 384, 256, 128)
            if _round_up(Hp, th) <= Hp * 1.2
        ] or [128]
    assert TW == 128, "tile width must be one lane group"
    full_H, full_W = rect_height, rect_width

    X = proj_mapx_i16.astype(np.int64)
    Y = proj_mapy_i16.astype(np.int64)
    inb = (X >= 0) & (X < full_W) & (Y >= 0) & (Y < full_H)

    # Crop the rect frame to the sampled window + the 3-px dilate halo
    # (see TailPlan docstring -- bit-exact, and at large rigs it shrinks
    # the scatter map and the band DMAs by an order of magnitude).
    # Out-of-bounds output pixels clip INTO the crop: their gather reads
    # are discarded (x_abs = -1), so any in-crop address is fine.
    if inb.any():
        r_lo = max(int(Y[inb].min()) - 3, 0)
        r_hi = min(int(Y[inb].max()) + 3, full_H - 1)
        c_lo = max(int(X[inb].min()) - 3, 0)
        c_hi = min(int(X[inb].max()) + 3, full_W - 1)
    else:
        r_lo, r_hi, c_lo, c_hi = 0, full_H - 1, 0, full_W - 1
    H = r_hi - r_lo + 1
    W = c_hi - c_lo + 1
    Xc = np.clip(X, c_lo, c_hi) - c_lo
    Yc = np.clip(Y, r_lo, r_hi) - r_lo

    def pad_edge(a, rows, cols):
        return np.pad(a, ((0, rows - a.shape[0]), (0, cols - a.shape[1])), mode="edge")

    for TH in candidates:
        Hp_pad = _round_up(Hp, TH)
        Wp_pad = _round_up(Wp, TW)
        GR, GC = Hp_pad // TH, Wp_pad // TW

        Xp = pad_edge(Xc, Hp_pad, Wp_pad)
        Yp = pad_edge(Yc, Hp_pad, Wp_pad)
        inbp = pad_edge(inb.astype(np.int8), Hp_pad, Wp_pad).astype(bool)

        # per-tile source extents (+3 dilate halo on each side)
        ty = Yp.reshape(GR, TH, GC, TW)
        tx = Xp.reshape(GR, TH, GC, TW)
        ymin = ty.min(axis=(1, 3)) - 3
        ymax = ty.max(axis=(1, 3)) + 3
        xmin = tx.min(axis=(1, 3)) - 3
        xmax = tx.max(axis=(1, 3)) + 3

        # Band starts must be tile-aligned (Mosaic memref slicing: sublane
        # tiling 8, lane tiling 128); quantize down and widen the band.
        row0q = (np.maximum(ymin, 0) // 8) * 8
        col0q = (np.maximum(xmin, 0) // 128) * 128
        RB = _round_up(int((ymax - row0q).max()) + 1, 8)
        CB = _round_up(int((xmax - col0q).max()) + 1, 128)
        # scratch budget: 2 band slots + dilated band (i32/f32) + 4 yhat
        # slots (i16) + output tiles; leave the rest of VMEM to Mosaic
        vmem_est = (
            3 * RB * CB * 4 + 4 * TH * CB * 2 + 6 * TH * TW * 4
        )
        if vmem_est <= 7 * 2**20:
            break
    H_pad = _round_up(max(H, RB), 8)
    W_pad = _round_up(max(W, CB), 128)

    row0 = np.clip(row0q, 0, H_pad - RB).astype(np.int32)
    col0 = np.clip(col0q, 0, W_pad - CB).astype(np.int32)

    # yhat: for each output row, the source row needed at each source col it
    # reads; gaps filled with the nearest used column's value.  Two output
    # pixels can round to the same rect column with source rows differing by
    # one (i16 rounding boundaries), so two slots are kept: last writer and
    # first writer; a per-output-pixel bit picks the right one.
    yhat_a = np.zeros((Hp_pad, W_pad), dtype=np.int16)
    yhat_b = np.zeros((Hp_pad, W_pad), dtype=np.int16)
    use_b = np.zeros((Hp_pad, Wp_pad), dtype=bool)
    cols = np.arange(W_pad)
    for i in range(Hp_pad):
        # deterministic first/last-writer maps via np.unique (duplicate-index
        # fancy assignment order is undefined behavior in NumPy)
        xp_i, yp_i = Xp[i], Yp[i]
        u, first_idx = np.unique(xp_i, return_index=True)
        _, ridx = np.unique(xp_i[::-1], return_index=True)
        last_idx = len(xp_i) - 1 - ridx
        row_a = np.full(W_pad, -1, dtype=np.int64)
        row_a[u] = yp_i[last_idx]  # last j wins
        row_b = np.full(W_pad, -1, dtype=np.int64)
        row_b[u] = yp_i[first_idx]  # first j wins
        valid = row_a >= 0
        if not valid.any():
            continue
        idx = np.where(valid, cols, 0)
        np.maximum.accumulate(idx, out=idx)  # nearest valid to the left
        first = int(np.argmax(valid))
        idx[:first] = first  # leading gap -> first valid
        yhat_a[i] = row_a[idx]
        yhat_b[i] = row_b[idx]
        not_a = Yp[i] != yhat_a[i][Xp[i]]
        use_b[i] = not_a
        # every pixel must be served by one of the two slots
        bad = not_a & (Yp[i] != yhat_b[i][Xp[i]])
        if bad.any():
            raise AssertionError(
                f"tail plan: >2 distinct source rows collide at output row {i}"
            )
    x_abs = np.where(inbp, Xp + (use_b.astype(np.int64) << 20), -1).astype(
        np.int32
    )

    # Per (tile, 8-output-row sub-block) source-row window: the rows the
    # column gather actually reads are exactly Yp of the in-bounds output
    # pixels (both collision slots resolve to Yp at their selected lanes),
    # so the kernel's row-group loop only needs to cover that span --
    # typically ~10 rows (two 8-row groups from an unaligned base) instead
    # of the whole band.
    row0_t = row0.reshape(-1)
    nq = TH // 8
    qbase = np.zeros((GR * GC * nq,), np.int32)
    QH = 1
    for ti in range(GR):
        for tj in range(GC):
            t = ti * GC + tj
            for q in range(nq):
                rs = slice(ti * TH + q * 8, ti * TH + (q + 1) * 8)
                cs = slice(tj * TW, (tj + 1) * TW)
                used = inbp[rs, cs]
                if not used.any():
                    continue
                rows = Yp[rs, cs][used] - row0_t[t]
                # 8-aligned base (Mosaic vector loads need aligned sublane
                # starts); the window is at most one group wider for it
                lo = (int(rows.min()) // 8) * 8
                qbase[t * nq + q] = lo
                QH = max(QH, int(rows.max()) // 8 - lo // 8 + 1)
    # keep every window inside the DMA'd band
    qbase = np.minimum(qbase, max(RB - QH * 8, 0)).astype(np.int32)

    return TailPlan(
        full_H=full_H, full_W=full_W, crop_row0=r_lo, crop_col0=c_lo,
        H=H, W=W, H_pad=H_pad, W_pad=W_pad,
        Hp=Hp, Wp=Wp, Hp_pad=Hp_pad, Wp_pad=Wp_pad,
        TH=TH, TW=TW,
        RB=RB, CB=CB, GR=GR, GC=GC,
        row0=row0_t, col0=col0.reshape(-1),
        qbase=qbase, QH=QH,
        x_abs=x_abs, yhat_a=yhat_a, yhat_b=yhat_b,
        p03=float(p03), z_near=float(z_near), z_far=float(z_far),
    )


def _shift_max_lanes(a, s):
    """max(a, a shifted by +-s lanes, vacated lanes = -inf)."""
    neg = jnp.full_like(a[:, :s], -jnp.inf)
    left = jnp.concatenate([a[:, s:], neg], axis=1)
    right = jnp.concatenate([neg, a[:, :-s]], axis=1)
    return jnp.maximum(a, jnp.maximum(left, right))


def _shift_max_sublanes(a, s):
    neg = jnp.full_like(a[:s, :], -jnp.inf)
    up = jnp.concatenate([a[s:, :], neg], axis=0)
    down = jnp.concatenate([neg, a[:-s, :]], axis=0)
    return jnp.maximum(a, jnp.maximum(up, down))


def _tail_kernel(
    row0_ref,
    col0_ref,
    qbase_ref,
    x_abs_ref,
    lut_ref,
    disp_ref,
    yhat_a_ref,
    yhat_b_ref,
    disp_out_ref,
    depth_ref,
    b_ref,
    g_ref,
    r_ref,
    band,
    yh_a,
    yh_b,
    dil,
    sems,
    *,
    plan: TailPlan,
    pack: int = 0,
):
    """Full-output variant: emits disparity + metric depth + BGR."""
    _tail_core(
        row0_ref, col0_ref, qbase_ref, x_abs_ref, lut_ref, disp_ref,
        yhat_a_ref, yhat_b_ref, disp_out_ref, depth_ref, b_ref, g_ref,
        r_ref, band, yh_a, yh_b, dil, sems, plan=plan, pack=pack,
    )


def _tail_kernel_display(
    row0_ref,
    col0_ref,
    qbase_ref,
    x_abs_ref,
    lut_ref,
    disp_ref,
    yhat_a_ref,
    yhat_b_ref,
    b_ref,
    g_ref,
    r_ref,
    band,
    yh_a,
    yh_b,
    dil,
    sems,
    *,
    plan: TailPlan,
    pack: int = 0,
):
    """Display-only variant: emits just the BGR planes -- the reference's
    per-frame output (disp_to_depth.py computes depth/disparity as
    intermediates and hands the window a colorized frame).  Skips two
    full-resolution f32 output stores and their downstream layout
    copies."""
    _tail_core(
        row0_ref, col0_ref, qbase_ref, x_abs_ref, lut_ref, disp_ref,
        yhat_a_ref, yhat_b_ref, None, None, b_ref, g_ref,
        r_ref, band, yh_a, yh_b, dil, sems, plan=plan, pack=pack,
    )


def _tail_core(
    row0_ref,
    col0_ref,
    qbase_ref,
    x_abs_ref,
    lut_ref,
    disp_ref,
    yhat_a_ref,
    yhat_b_ref,
    disp_out_ref,
    depth_ref,
    b_ref,
    g_ref,
    r_ref,
    band,
    yh_a,
    yh_b,
    dil,
    sems,
    *,
    plan: TailPlan,
    pack: int = 0,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    RB, CB = plan.RB, plan.CB
    TH, TW = plan.TH, plan.TW
    i = pl.program_id(0)
    j = pl.program_id(1)
    tile = i * plan.GC + j
    n_tiles = plan.GR * plan.GC
    row0 = pl.multiple_of(row0_ref[tile], 8)
    col0 = pl.multiple_of(col0_ref[tile], 128)

    # Manual double buffering: the grid runs sequentially on one core, so
    # tile t starts tile t+1's band DMAs before doing its own compute --
    # without this, every tile pays the full HBM DMA latency up front.
    def start_dmas(t, slot):
        r0 = pl.multiple_of(row0_ref[t], 8)
        c0 = pl.multiple_of(col0_ref[t], 128)
        ti = t // plan.GC
        pltpu.make_async_copy(
            disp_ref.at[pl.ds(r0, RB), pl.ds(c0, CB)],
            band.at[slot],
            sems.at[slot, 0],
        ).start()
        pltpu.make_async_copy(
            yhat_a_ref.at[pl.ds(ti * TH, TH), pl.ds(c0, CB)],
            yh_a.at[slot],
            sems.at[slot, 1],
        ).start()
        pltpu.make_async_copy(
            yhat_b_ref.at[pl.ds(ti * TH, TH), pl.ds(c0, CB)],
            yh_b.at[slot],
            sems.at[slot, 2],
        ).start()

    def wait_dmas(t, slot):
        r0 = pl.multiple_of(row0_ref[t], 8)
        c0 = pl.multiple_of(col0_ref[t], 128)
        ti = t // plan.GC
        pltpu.make_async_copy(
            disp_ref.at[pl.ds(r0, RB), pl.ds(c0, CB)],
            band.at[slot],
            sems.at[slot, 0],
        ).wait()
        pltpu.make_async_copy(
            yhat_a_ref.at[pl.ds(ti * TH, TH), pl.ds(c0, CB)],
            yh_a.at[slot],
            sems.at[slot, 1],
        ).wait()
        pltpu.make_async_copy(
            yhat_b_ref.at[pl.ds(ti * TH, TH), pl.ds(c0, CB)],
            yh_b.at[slot],
            sems.at[slot, 2],
        ).wait()

    slot = jax.lax.rem(tile, 2)

    @pl.when(tile == 0)
    def _():
        start_dmas(0, 0)

    @pl.when(tile + 1 < n_tiles)
    def _():
        start_dmas(tile + 1, jax.lax.rem(tile + 1, 2))

    wait_dmas(tile, slot)
    band = band.at[slot]
    yh_a = yh_a.at[slot]
    yh_b = yh_b.at[slot]

    # --- dilate the band in VMEM (separable 7x7 max) -----------------------
    # shifted maxes compose: radius 1 then 2 covers the +-3 (7-wide) window
    d = band[:]
    if pack:
        # packed (priority*PACK + disp) input: unpack in-band (PACK is a
        # power of two, so this is a bitwise AND -- see ops.scatter).
        # Mosaic has no u32->f32 cast; the masked value is < pack, so
        # reinterpreting as i32 first is exact.
        d = (d & (pack - 1)).astype(jnp.int32).astype(jnp.float32)
    for s in (1, 2):
        d = _shift_max_lanes(d, s)
    for s in (1, 2):
        d = _shift_max_sublanes(d, s)
    # park the dilated band in scratch: the row-window loop below reads it
    # at per-sub-block *traced* (unaligned) sublane offsets, which needs a
    # ref (values cannot be dynamically sliced)
    dil[:] = d

    # --- per-tile tables ---------------------------------------------------
    # (TH, CB) band-relative source rows, both collision slots
    R_a = yh_a[:].astype(jnp.int32) - row0
    R_b = yh_b[:].astype(jnp.int32) - row0
    X_enc = x_abs_ref[:]  # (TH, 128): abs col | slot bit 20; -1 OOB
    oob = X_enc < 0
    use_b = (X_enc >> 20) & 1
    X = X_enc & ((1 << 20) - 1)
    dxr = jnp.clip(X - col0, 0, CB - 1)
    grp = dxr // 128
    off = dxr % 128

    n_colgrp = CB // 128

    nq = TH // 8
    out_rows = []
    for q in range(nq):  # 8-row sub-blocks of the TH output rows
        # first source row this sub-block actually references: the
        # row-group loop walks QH 8-row windows from this (8-aligned)
        # base instead of the whole band
        qb = pl.multiple_of(qbase_ref[tile * nq + q], 8)
        sl = slice(q * 8, (q + 1) * 8)
        offq = off[sl, :]
        grpq = grp[sl, :]
        useq = use_b[sl, :]
        outq = jnp.zeros((8, 128), jnp.float32)
        for gc in range(n_colgrp):
            csl = slice(gc * 128, (gc + 1) * 128)
            ha = R_a[sl, csl] - qb
            hb = R_b[sl, csl] - qb
            hs_a = ha // 8
            hs_b = hb // 8
            al_a = jnp.zeros((8, 128), jnp.float32)
            al_b = jnp.zeros((8, 128), jnp.float32)
            for h in range(plan.QH):
                # one table load serves both collision slots
                tab = dil[pl.ds(qb + h * 8, 8), csl]
                ia = jnp.clip(ha - h * 8, 0, 7)
                al_a = jnp.where(
                    hs_a == h, jnp.take_along_axis(tab, ia, axis=0), al_a
                )
                ib = jnp.clip(hb - h * 8, 0, 7)
                al_b = jnp.where(
                    hs_b == h, jnp.take_along_axis(tab, ib, axis=0), al_b
                )
            got_a = jnp.take_along_axis(al_a, offq, axis=1)
            got_b = jnp.take_along_axis(al_b, offq, axis=1)
            got = jnp.where(useq == 1, got_b, got_a)
            outq = jnp.where(grpq == gc, got, outq)
        out_rows.append(outq)
    disp = jnp.concatenate(out_rows, axis=0)  # (TH, 128)
    disp = jnp.where(oob, 0.0, disp)
    if disp_out_ref is not None:
        disp_out_ref[:] = disp

    # --- depth + normalize + colorize (reference disp_to_depth.py:7-63) ----
    safe = jnp.where(disp == 0.0, 1.0, disp)
    depth = jnp.maximum(jnp.float32(plan.p03) / safe, 1e-9)
    depth = jnp.where(disp == 0.0, 0.0, depth)
    if depth_ref is not None:
        depth_ref[:] = depth

    zn = jnp.float32(plan.z_near)
    zf = jnp.float32(plan.z_far)
    val = jnp.clip(depth, zn, zf)
    val = (val - zn) / (zf - zn) * 255.0
    val = jnp.where(depth == 0.0, 0.0, val)
    u8 = jnp.clip(val, 0.0, 255.0).astype(jnp.int32)  # C truncation

    lut = lut_ref[:]  # (8, 768) i32: [B_lo B_hi G_lo G_hi R_lo R_hi]
    white = u8 == 0
    for ch, out_ref in ((0, b_ref), (1, g_ref), (2, r_ref)):
        tab_lo = lut[:, ch * 256 : ch * 256 + 128]
        tab_hi = lut[:, ch * 256 + 128 : ch * 256 + 256]
        chunks = []
        for q in range(TH // 8):
            idx = u8[q * 8 : (q + 1) * 8, :] & 127
            hi = u8[q * 8 : (q + 1) * 8, :] >= 128
            lo_v = jnp.take_along_axis(tab_lo, idx, axis=1)
            hi_v = jnp.take_along_axis(tab_hi, idx, axis=1)
            chunks.append(jnp.where(hi, hi_v, lo_v))
        color = jnp.concatenate(chunks, axis=0)
        color = jnp.where(white, 255, color)
        out_ref[:] = color.astype(jnp.uint8)


@dataclass(frozen=True)
class CamTailPlan:
    """Static config of the camera-view colorize kernel (no dilate/remap:
    the camera view scatters at raw event coordinates,
    reference cam_proj_calibration.py:312-317 + disp_to_depth.py:99)."""

    H: int  # camera height (multiple of 8 after padding)
    W: int  # camera width (multiple of 128 after padding)
    H_pad: int
    W_pad: int
    p03: float
    z_near: float
    z_far: float


def build_cam_tail_plan(
    cam_height: int, cam_width: int, p03: float, z_near: float, z_far: float
) -> CamTailPlan:
    return CamTailPlan(
        H=cam_height,
        W=cam_width,
        H_pad=_round_up(cam_height, 32),
        W_pad=_round_up(cam_width, 128),
        p03=float(p03),
        z_near=float(z_near),
        z_far=float(z_far),
    )


def _colorize_kernel(
    lut_ref,
    map_ref,
    disp_out_ref,
    depth_ref,
    b_ref,
    g_ref,
    r_ref,
    *,
    plan: CamTailPlan,
    pack: int,
):
    _colorize_core(
        lut_ref, map_ref, disp_out_ref, depth_ref, b_ref, g_ref, r_ref,
        plan=plan, pack=pack,
    )


def _colorize_kernel_display(
    lut_ref,
    map_ref,
    b_ref,
    g_ref,
    r_ref,
    *,
    plan: CamTailPlan,
    pack: int,
):
    _colorize_core(
        lut_ref, map_ref, None, None, b_ref, g_ref, r_ref,
        plan=plan, pack=pack,
    )


def _colorize_core(
    lut_ref,
    map_ref,
    disp_out_ref,
    depth_ref,
    b_ref,
    g_ref,
    r_ref,
    *,
    plan: CamTailPlan,
    pack: int,
):
    d = map_ref[:]
    if pack:
        # packed (priority*PACK + disp) scatter output; unpack in-band
        d = (d & (pack - 1)).astype(jnp.int32).astype(jnp.float32)
    if disp_out_ref is not None:
        disp_out_ref[:] = d

    # identical formulas to _tail_kernel's epilogue (and the XLA ops in
    # ops.image_tail): depth = P[0,3]/disp with 0-preserve, C-truncation
    # u8 normalization, TURBO LUT, white where undefined
    safe = jnp.where(d == 0.0, 1.0, d)
    depth = jnp.maximum(jnp.float32(plan.p03) / safe, 1e-9)
    depth = jnp.where(d == 0.0, 0.0, depth)
    if depth_ref is not None:
        depth_ref[:] = depth

    zn = jnp.float32(plan.z_near)
    zf = jnp.float32(plan.z_far)
    val = jnp.clip(depth, zn, zf)
    val = (val - zn) / (zf - zn) * 255.0
    val = jnp.where(depth == 0.0, 0.0, val)
    u8 = jnp.clip(val, 0.0, 255.0).astype(jnp.int32)

    lut = lut_ref[:]
    white = u8 == 0
    for ch, out_ref in ((0, b_ref), (1, g_ref), (2, r_ref)):
        tab_lo = lut[:, ch * 256 : ch * 256 + 128]
        tab_hi = lut[:, ch * 256 + 128 : ch * 256 + 256]
        chunks = []
        for q in range(4):
            idx = u8[q * 8 : (q + 1) * 8, :] & 127
            hi = u8[q * 8 : (q + 1) * 8, :] >= 128
            lo_v = jnp.take_along_axis(tab_lo, idx, axis=1)
            hi_v = jnp.take_along_axis(tab_hi, idx, axis=1)
            chunks.append(jnp.where(hi, hi_v, lo_v))
        color = jnp.concatenate(chunks, axis=0)
        color = jnp.where(white, 255, color)
        out_ref[:] = color.astype(jnp.uint8)


def pallas_colorize(
    disp_map: jax.Array,
    plan: CamTailPlan,
    interpret: bool = False,
    pack: int = 0,
    emit_aux: bool = True,
):
    """Camera-view tail: (H_pad, W_pad) packed (or f32) disparity map ->
    (frame_bgr (H, W, 3) u8, depth (H, W) f32, disp (H, W) f32) in one
    tile pass.  Replaces the XLA depth/normalize/colorize chain whose
    TURBO gather costs ~10 ns/px on TPU.  ``emit_aux=False`` returns
    (frame, None, None) and skips the two f32 output stores (the
    streaming display regime)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert disp_map.shape == (plan.H_pad, plan.W_pad)
    grid = (plan.H_pad // 32, plan.W_pad // 128)
    tile = pl.BlockSpec((32, 128), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    f32_plane = jax.ShapeDtypeStruct((plan.H_pad, plan.W_pad), jnp.float32)
    u8_plane = jax.ShapeDtypeStruct((plan.H_pad, plan.W_pad), jnp.uint8)
    if emit_aux:
        kernel = functools.partial(_colorize_kernel, plan=plan, pack=pack)
        out_shapes = [f32_plane, f32_plane, u8_plane, u8_plane, u8_plane]
    else:
        kernel = functools.partial(
            _colorize_kernel_display, plan=plan, pack=pack
        )
        out_shapes = [u8_plane, u8_plane, u8_plane]
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), tile],
        out_specs=[tile] * len(out_shapes),
        out_shape=out_shapes,
        interpret=interpret,
    )(jnp.asarray(_make_lut()), disp_map)
    H, W = plan.H, plan.W
    if emit_aux:
        disp_out, depth, b, g, r = outs
        frame = jnp.stack([b[:H, :W], g[:H, :W], r[:H, :W]], axis=-1)
        return frame, depth[:H, :W], disp_out[:H, :W]
    b, g, r = outs
    frame = jnp.stack([b[:H, :W], g[:H, :W], r[:H, :W]], axis=-1)
    return frame, None, None


def _make_lut() -> np.ndarray:
    """(8, 768) i32: per channel, the 256-entry TURBO LUT split into two
    128-lane halves, rows broadcast for sublane-uniform gathers."""
    lut = np.zeros((8, 768), dtype=np.int32)
    for ch in range(3):  # BGR
        vals = TURBO_BGR_U8[:, ch].astype(np.int32)
        lut[:, ch * 256 : ch * 256 + 128] = vals[:128][None, :]
        lut[:, ch * 256 + 128 : ch * 256 + 256] = vals[128:][None, :]
    return lut


def pallas_tail(
    disp_rect: jax.Array,
    plan: TailPlan,
    interpret: bool = False,
    pack: int = 0,
    emit_aux: bool = True,
):
    """disp_rect -> (frame_bgr (Hp, Wp, 3) u8, depth (Hp, Wp) f32, disp_proj
    (Hp, Wp) f32).

    With ``pack`` == 0, disp_rect is the (H, W) f32 disparity map (padded
    here).  With ``pack`` set to the scatter packing modulus (ops.scatter
    PACK), disp_rect is the already-padded (H_pad, W_pad)
    packed integer map straight from scatter_disp_packed(pad_shape=...)
    and is unpacked inside the kernel -- saving two full-image passes.

    ``emit_aux=False`` selects the display-only kernel variant: depth and
    disparity come back as None and their two full-resolution f32 output
    stores (plus downstream layout copies) are skipped -- the streaming
    path's regime, matching the reference's per-frame output surface."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if pack:
        assert disp_rect.shape == (plan.H_pad, plan.W_pad)
        assert jnp.issubdtype(disp_rect.dtype, jnp.integer)
        disp_pad = disp_rect
        band_dtype = disp_rect.dtype
    else:
        assert disp_rect.shape == (plan.full_H, plan.full_W)
        # slice the plan's crop out of the full rect map (bit-exact: the
        # kernel never reads outside it -- see TailPlan docstring)
        crop = jax.lax.slice(
            disp_rect,
            (plan.crop_row0, plan.crop_col0),
            (plan.crop_row0 + plan.H, plan.crop_col0 + plan.W),
        )
        disp_pad = jnp.pad(
            crop, ((0, plan.H_pad - plan.H), (0, plan.W_pad - plan.W))
        )
        band_dtype = jnp.float32

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(plan.GR, plan.GC),
        in_specs=[
            pl.BlockSpec(
                (plan.TH, 128),
                lambda i, j, *_: (i, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # lut, full
            pl.BlockSpec(memory_space=pl.ANY),  # disp_pad
            pl.BlockSpec(memory_space=pl.ANY),  # yhat_a
            pl.BlockSpec(memory_space=pl.ANY),  # yhat_b
        ],
        out_specs=[
            pl.BlockSpec(
                (plan.TH, 128),
                lambda i, j, *_: (i, j),
                memory_space=pltpu.VMEM,
            )
        ]
        * (5 if emit_aux else 3),
        scratch_shapes=[
            pltpu.VMEM((2, plan.RB, plan.CB), band_dtype),
            pltpu.VMEM((2, plan.TH, plan.CB), jnp.int16),
            pltpu.VMEM((2, plan.TH, plan.CB), jnp.int16),
            pltpu.VMEM((plan.RB, plan.CB), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )

    f32_plane = jax.ShapeDtypeStruct((plan.Hp, plan.Wp), jnp.float32)
    u8_plane = jax.ShapeDtypeStruct((plan.Hp, plan.Wp), jnp.uint8)
    if emit_aux:
        kernel = functools.partial(_tail_kernel, plan=plan, pack=pack)
        out_shapes = [f32_plane, f32_plane, u8_plane, u8_plane, u8_plane]
    else:
        kernel = functools.partial(
            _tail_kernel_display, plan=plan, pack=pack
        )
        out_shapes = [u8_plane, u8_plane, u8_plane]
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
    )(
        jnp.asarray(plan.row0),
        jnp.asarray(plan.col0),
        jnp.asarray(plan.qbase),
        jnp.asarray(plan.x_abs),
        jnp.asarray(_make_lut()),
        disp_pad,
        jnp.asarray(plan.yhat_a),
        jnp.asarray(plan.yhat_b),
    )
    if emit_aux:
        disp_out, depth, b, g, r = outs
    else:
        disp_out = depth = None
        b, g, r = outs
    frame = jnp.stack([b, g, r], axis=-1)
    return frame, depth, disp_out
