"""Fused Pallas TPU kernel for the dense image tail.

Replaces the XLA chain dilate -> remap -> depth -> normalize -> colorize
(reference: disp_to_depth.py:76-115) with ONE kernel over output tiles.
XLA's general gather on TPU costs ~10ns/element (~9.5 ms for the 921k-pixel
remap); this kernel exploits the static smoothness of the rectification
maps instead:

- For each (TH, 128) output tile (TH from a measured ladder; taller tiles
  amortize per-step DMA/semaphore/bookkeeping costs), the source pixels
  live in a small axis-aligned band of the rectified disparity map (the
  maps are near-affine plus a few pixels of lens distortion).  The band
  (RB x CB, precomputed bounds) is DMA'd to VMEM, double-buffered across
  grid steps.
- The 7x7 max-dilation runs on the band in VMEM (separable shifted maxes;
  the +3 halo is included in the band, and zero padding equals
  border-replicate for non-negative disparity).  The dilated band is
  parked twice in scratch: as-is, and shifted up 4 rows -- each 8-output-
  row sub-block picks the phase whose 16-row aligned window covers its
  source rows, so the row-group select chain is statically QHS=2 wide
  (4-phase windows cover any <=13-row span; an 8-aligned-only base would
  need 3 groups for ~2% of sub-blocks, and the static bound pays
  everywhere).
- The 2D gather decomposes into two exact 1D steps:
  (a) row alignment: aligned[s, c] = dilated[yhat(i0+s, c) - row0, c],
      where yhat places, for every output row, the needed source row at
      every source column it reads (scattered at init, gap-filled with
      the nearest used column).  The yhat tables ship as PER-TILE STRIPES
      (n_tiles*TH, CB) i16 with both slots BYTE-PACKED into one word
      (low byte last-writer, high byte first-writer), values pre-biased
      by the band start and the sub-block's window base on the host, so
      the kernel's index math is just ``ia = v & 7; hs = v >> 3`` per
      byte feeding two Mosaic sublane dynamic_gathers ((8, 128)
      table/index) and one select, and ONE stripe DMA serves both slots;
  (b) column gather: out[s, l] = aligned[s, X(i0+s, j) - col0], as lane
      dynamic_gathers with select-over-128-column-groups.
  Step (b) evaluates yhat exactly at the scattered positions, so the
  composition equals dilated[Y(i,j), X(i,j)] bit-for-bit.  Two output
  pixels can share a rect column with different source rows at i16
  rounding boundaries (~0.7% of pixels); the stripe word's high byte
  serves those through the same machinery, selected per pixel by a bit
  in the column table.
- depth = P[0,3]/disp, u8 normalization (C-truncation) and the TURBO
  colormap fuse into the same tile pass.  The colormap is a packed-BGR
  LUT (B | G<<8 | R<<16, 256 entries as two 128-lane halves) with entry
  0 pre-whitened -- the undefined-pixel white mask is exactly u8 == 0
  both here and in the XLA oracle (ops.image_tail.colorize_turbo), so
  one gather chain yields all three channels with no white select.

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
    #: (GR*GC * TH/8,) i32 per (tile, 8-output-row sub-block) window base
    #: in the 2-phase dilated-band scratch: 8-aligned slot base + phase
    #: bit (phase 1 = the copy shifted up 4 rows)
    qenc: np.ndarray
    QHS: int  # static row groups per sub-block window (typically 2)
    #: (Hp_pad, Wp_pad) i32: absolute rect col; bit 20 selects the stripe
    #: slot (two output pixels can share a rect column with different
    #: source rows at i16 rounding boundaries); -1 if out of bounds
    x_abs: np.ndarray
    #: (GR*GC*TH, CB) i16 pre-biased source-row stripes, BYTE-PACKED:
    #: low byte = last-writer slot, high byte = first-writer slot
    #: (collision pixels).  Each byte is yhat - row0[tile] - window_base
    #: [tile, sub-block] when that lands in the sub-block's QHS*8-row
    #: window (so the kernel indexes the window directly: ia = v & 7,
    #: hs = v >> 3), else the 255 sentinel (hs = 31 matches no group;
    #: gap/unserved columns are never selected).  One i16 table instead
    #: of two halves the stripe DMA traffic -- the tail pass's largest
    #: HBM read after the scatter band.
    yh: np.ndarray

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
    is chosen automatically: the tallest budget-fitting tile from
    {960..128} that wastes <20% of the grid on padding rows (the round-3
    sweeps were monotone in TH at both rigs: demonstrator 128/256/640 ->
    0.339/0.324/0.318 ms; ESL 128..960 -> 0.475..0.434 ms/frame).
    """
    TW = 128
    Hp, Wp = proj_mapx_i16.shape
    if tile is not None:
        TH, TW = tile
        candidates = [TH]
    else:
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
        # scratch budget: 2 band slots + 2-phase dilated band + 2 packed
        # yhat stripe slots (i16) + output tiles; leave the rest to Mosaic
        vmem_est = (
            4 * RB * CB * 4 + 2 * TH * CB * 2 + 7 * TH * TW * 4
        )
        if vmem_est <= 8 * 2**20:
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
    yhat_a = np.zeros((Hp_pad, W_pad), dtype=np.int32)
    yhat_b = np.zeros((Hp_pad, W_pad), dtype=np.int32)
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
    # pixels, typically spanning ~6-10 rows.  A base quantized to 4 rows
    # keeps the static window at QHS=2 groups (the kernel holds a second
    # dilated-band copy shifted up 4 rows for odd phases).
    row0_t = row0.reshape(-1)
    col0_t = col0.reshape(-1)
    n_tiles = GR * GC
    nq = TH // 8
    base4 = np.zeros((n_tiles, nq), np.int32)
    need_max = 1
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
                b4 = (int(rows.min()) // 4) * 4
                base4[t, q] = b4
                need_max = max(need_max, int(rows.max()) - b4 + 1)
    QHS = max(2, _round_up(need_max, 8) // 8)
    # keep every window inside the band scratch (phase-1 windows read
    # slot indices [base, base + QHS*8), which must stay < RB); clamping
    # a base down only widens the covered span upward, so coverage holds
    base4 = np.minimum(base4, max(RB - QHS * 8, 0))

    assert QHS * 8 < 255, "byte-packed stripes need window indices < 255"

    def _stripe_byte(v: np.ndarray) -> np.ndarray:
        """Window-relative source row as a byte; 255 = out-of-window
        sentinel (hs = 31, selected by no group)."""
        return np.where((v >= 0) & (v < QHS * 8), v, 255).astype(np.uint16)

    qenc = np.zeros((n_tiles * nq,), np.int32)
    yh = np.full((n_tiles * TH, CB), 0xFFFF, dtype=np.uint16)
    for ti in range(GR):
        for tj in range(GC):
            t = ti * GC + tj
            c0 = col0_t[t]
            for q in range(nq):
                b4 = int(base4[t, q])
                phase = (b4 % 8) // 4
                qenc[t * nq + q] = (b4 - 4 * phase) + phase
                src = slice(ti * TH + q * 8, ti * TH + (q + 1) * 8)
                dst = slice(t * TH + q * 8, t * TH + (q + 1) * 8)
                bias = row0_t[t] + b4
                ca = _stripe_byte(yhat_a[src, c0 : c0 + CB] - bias)
                cb = _stripe_byte(yhat_b[src, c0 : c0 + CB] - bias)
                yh[dst] = ca | (cb << 8)
                # coverage: every used pixel's window index in [0, QHS*8)
                used = inbp[src, tj * TW : (tj + 1) * TW]
                if used.any():
                    hq = Yp[src, tj * TW : (tj + 1) * TW][used] - row0_t[t] - b4
                    assert hq.min() >= 0 and hq.max() < QHS * 8, (
                        f"tail plan window miss: tile {t} sub-block {q} "
                        f"hq range [{hq.min()}, {hq.max()}] vs {QHS * 8}"
                    )

    return TailPlan(
        full_H=full_H, full_W=full_W, crop_row0=r_lo, crop_col0=c_lo,
        H=H, W=W, H_pad=H_pad, W_pad=W_pad,
        Hp=Hp, Wp=Wp, Hp_pad=Hp_pad, Wp_pad=Wp_pad,
        TH=TH, TW=TW,
        RB=RB, CB=CB, GR=GR, GC=GC,
        row0=row0_t, col0=col0_t,
        qenc=qenc, QHS=QHS,
        x_abs=x_abs, yh=yh.view(np.int16),
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
    qenc_ref,
    x_abs_ref,
    lut_ref,
    disp_ref,
    yh_hbm,
    disp_out_ref,
    depth_ref,
    b_ref,
    g_ref,
    r_ref,
    band,
    yh,
    dil,
    sems,
    *,
    plan: TailPlan,
    pack: int = 0,
):
    """Full-output variant: emits disparity + metric depth + BGR."""
    _tail_core(
        row0_ref, col0_ref, qenc_ref, x_abs_ref, lut_ref, disp_ref,
        yh_hbm, disp_out_ref, depth_ref, b_ref, g_ref,
        r_ref, band, yh, dil, sems, plan=plan, pack=pack,
    )


def _tail_kernel_display(
    row0_ref,
    col0_ref,
    qenc_ref,
    x_abs_ref,
    lut_ref,
    disp_ref,
    yh_hbm,
    b_ref,
    g_ref,
    r_ref,
    band,
    yh,
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
        row0_ref, col0_ref, qenc_ref, x_abs_ref, lut_ref, disp_ref,
        yh_hbm, None, None, b_ref, g_ref,
        r_ref, band, yh, dil, sems, plan=plan, pack=pack,
    )


def _tail_kernel_display_packed(
    row0_ref,
    col0_ref,
    qenc_ref,
    x_abs_ref,
    lut_ref,
    disp_ref,
    yh_hbm,
    bgrx_ref,
    band,
    yh,
    dil,
    sems,
    *,
    plan: TailPlan,
    pack: int = 0,
):
    """Display-only variant emitting ONE u32 packed-BGR plane (the word
    the colorize LUT already produces): kills the channel split in-kernel
    AND the downstream 3-plane interleave; the host unpacks with a free
    numpy view at display rate.  (b_ref carries the u32 ref; g_ref=None
    selects the packed colorize path in _tail_core.)"""
    _tail_core(
        row0_ref, col0_ref, qenc_ref, x_abs_ref, lut_ref, disp_ref,
        yh_hbm, None, None, bgrx_ref, None,
        None, band, yh, dil, sems, plan=plan, pack=pack,
    )


def _tail_core(
    row0_ref,
    col0_ref,
    qenc_ref,
    x_abs_ref,
    lut_ref,
    disp_ref,
    yh_hbm,
    disp_out_ref,
    depth_ref,
    b_ref,
    g_ref,
    r_ref,
    band,
    yh,
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
    col0 = pl.multiple_of(col0_ref[tile], 128)

    # Manual double buffering: the grid runs sequentially on one core, so
    # tile t starts tile t+1's band DMAs before doing its own compute --
    # without this, every tile pays the full HBM DMA latency up front.
    def start_dmas(t, slot):
        r0 = pl.multiple_of(row0_ref[t], 8)
        c0 = pl.multiple_of(col0_ref[t], 128)
        pltpu.make_async_copy(
            disp_ref.at[pl.ds(r0, RB), pl.ds(c0, CB)],
            band.at[slot],
            sems.at[slot, 0],
        ).start()
        pltpu.make_async_copy(
            yh_hbm.at[pl.ds(t * TH, TH), :],
            yh.at[slot],
            sems.at[slot, 1],
        ).start()

    def wait_dmas(t, slot):
        r0 = pl.multiple_of(row0_ref[t], 8)
        c0 = pl.multiple_of(col0_ref[t], 128)
        pltpu.make_async_copy(
            disp_ref.at[pl.ds(r0, RB), pl.ds(c0, CB)],
            band.at[slot],
            sems.at[slot, 0],
        ).wait()
        pltpu.make_async_copy(
            yh_hbm.at[pl.ds(t * TH, TH), :],
            yh.at[slot],
            sems.at[slot, 1],
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
    yh = yh.at[slot]

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
    # park the dilated band twice: phase 0 as-is at rows [0, RB), phase 1
    # shifted up 4 rows at [RB, 2RB) -- sub-block windows then always fit
    # QHS aligned groups, and the row-window loop below reads the copies
    # at traced (8-aligned) sublane offsets, which needs a ref anyway
    dil[pl.ds(0, RB)] = d
    dil[pl.ds(RB, RB)] = jnp.concatenate(
        [d[4:], jnp.zeros((4, CB), d.dtype)], axis=0
    )

    # --- per-tile tables ---------------------------------------------------
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
        # window base in the 2-phase dilated-band scratch (8-aligned base
        # + phase bit; phase 1 = the 4-row-shifted copy at rows [RB, 2RB))
        enc = qenc_ref[tile * nq + q]
        ph = jax.lax.rem(enc, 8)
        qb = pl.multiple_of((enc - ph) + ph * RB, 8)
        sl = slice(q * 8, (q + 1) * 8)
        offq = off[sl, :]
        grpq = grp[sl, :]
        useq = use_b[sl, :]
        outq = jnp.zeros((8, 128), jnp.float32)
        for gc in range(n_colgrp):
            csl = slice(gc * 128, (gc + 1) * 128)
            # byte-packed stripe values, pre-biased on host: low byte =
            # last-writer slot, high byte = first-writer slot; within a
            # byte, low 3 bits = row within group, upper bits = group
            # (255 sentinel -> group 31, selected by no h); & 7 bounds
            # the gather index for ANY value, and lanes whose group
            # matches no h are overwritten by no select -- their garbage
            # gathers are never read
            t = yh[sl, csl].astype(jnp.int32)
            ta = t & 255
            tb = (t >> 8) & 255
            ia = ta & 7
            ib = tb & 7
            hs_a = ta >> 3
            hs_b = tb >> 3
            tabs = [dil[pl.ds(qb + h * 8, 8), csl] for h in range(plan.QHS)]
            al_a = jnp.take_along_axis(tabs[0], ia, axis=0)
            al_b = jnp.take_along_axis(tabs[0], ib, axis=0)
            for h in range(1, plan.QHS):
                al_a = jnp.where(
                    hs_a == h, jnp.take_along_axis(tabs[h], ia, axis=0), al_a
                )
                al_b = jnp.where(
                    hs_b == h, jnp.take_along_axis(tabs[h], ib, axis=0), al_b
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

    if g_ref is None:
        _colorize_packed(lut_ref, u8, TH, b_ref)  # u32 packed-BGR plane
    else:
        _colorize_packed(lut_ref, u8, TH, b_ref, g_ref, r_ref)


def _colorize_packed(lut_ref, u8, tile_h, *out_refs):
    """Packed-BGR LUT application: one gather chain for all channels (see
    _make_lut; entry 0 is pre-whitened, so no white select).

    ``out_refs``: (b, g, r) u8 planes, or a single u32 ref that takes the
    packed word directly (B | G<<8 | R<<16; the host unpacks at display
    rate -- kills the device-side channel split + interleave entirely).
    """
    lut = lut_ref[:]  # (8, 256) i32 packed BGR, two 128-lane halves
    tab_lo = lut[:, :128]
    tab_hi = lut[:, 128:256]
    rows = []
    for q in range(tile_h // 8):
        idx = u8[q * 8 : (q + 1) * 8, :] & 127
        hi = u8[q * 8 : (q + 1) * 8, :] >= 128
        lo_v = jnp.take_along_axis(tab_lo, idx, axis=1)
        hi_v = jnp.take_along_axis(tab_hi, idx, axis=1)
        rows.append(jnp.where(hi, hi_v, lo_v))
    bgr = jnp.concatenate(rows, axis=0)
    if len(out_refs) == 1:
        out_refs[0][:] = bgr.astype(jnp.uint32)
        return
    b_ref, g_ref, r_ref = out_refs
    b_ref[:] = (bgr & 255).astype(jnp.uint8)
    g_ref[:] = ((bgr >> 8) & 255).astype(jnp.uint8)
    r_ref[:] = (bgr >> 16).astype(jnp.uint8)


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


def _colorize_kernel_display_packed(
    lut_ref,
    map_ref,
    bgrx_ref,
    *,
    plan: CamTailPlan,
    pack: int,
):
    _colorize_core(
        lut_ref, map_ref, None, None, bgrx_ref, None, None,
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
    # u8 normalization, packed TURBO LUT with pre-whitened entry 0
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

    if g_ref is None:
        _colorize_packed(lut_ref, u8, 32, b_ref)  # u32 packed-BGR plane
    else:
        _colorize_packed(lut_ref, u8, 32, b_ref, g_ref, r_ref)


def pallas_colorize(
    disp_map: jax.Array,
    plan: CamTailPlan,
    interpret: bool = False,
    pack: int = 0,
    emit_aux: bool = True,
    packed_bgr: bool = False,
):
    """Camera-view tail: (H_pad, W_pad) packed (or f32) disparity map ->
    (frame_bgr (H, W, 3) u8, depth (H, W) f32, disp (H, W) f32) in one
    tile pass.  Replaces the XLA depth/normalize/colorize chain whose
    TURBO gather costs ~10 ns/px on TPU.  ``emit_aux=False`` returns
    (frame, None, None) and skips the two f32 output stores (the
    streaming display regime).  ``packed_bgr`` (display-only) returns the
    frame as ONE (H, W) u32 packed-BGR plane (B | G<<8 | R<<16) -- no
    channel split, no interleave; the host unpacks with a numpy view at
    display rate."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert disp_map.shape == (plan.H_pad, plan.W_pad)
    assert not (packed_bgr and emit_aux), "packed_bgr is display-only"
    grid = (plan.H_pad // 32, plan.W_pad // 128)
    tile = pl.BlockSpec((32, 128), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    f32_plane = jax.ShapeDtypeStruct((plan.H_pad, plan.W_pad), jnp.float32)
    u8_plane = jax.ShapeDtypeStruct((plan.H_pad, plan.W_pad), jnp.uint8)
    u32_plane = jax.ShapeDtypeStruct((plan.H_pad, plan.W_pad), jnp.uint32)
    if emit_aux:
        kernel = functools.partial(_colorize_kernel, plan=plan, pack=pack)
        out_shapes = [f32_plane, f32_plane, u8_plane, u8_plane, u8_plane]
    elif packed_bgr:
        kernel = functools.partial(
            _colorize_kernel_display_packed, plan=plan, pack=pack
        )
        out_shapes = [u32_plane]
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
    if packed_bgr:
        return outs[0][:H, :W], None, None
    b, g, r = outs
    frame = jnp.stack([b[:H, :W], g[:H, :W], r[:H, :W]], axis=-1)
    return frame, None, None


def _make_lut() -> np.ndarray:
    """(8, 256) i32 packed-BGR TURBO LUT (B | G<<8 | R<<16) split into two
    128-lane halves, rows broadcast for sublane-uniform gathers; entry 0
    is white (the undefined-pixel mask is exactly u8 == 0, matching
    ops.image_tail.colorize_turbo)."""
    v = TURBO_BGR_U8.astype(np.int32)
    packed = v[:, 0] | (v[:, 1] << 8) | (v[:, 2] << 16)
    packed[0] = 0xFFFFFF
    lut = np.zeros((8, 256), dtype=np.int32)
    lut[:, :128] = packed[:128][None, :]
    lut[:, 128:] = packed[128:][None, :]
    return lut


def pallas_tail(
    disp_rect: jax.Array,
    plan: TailPlan,
    interpret: bool = False,
    pack: int = 0,
    emit_aux: bool = True,
    packed_bgr: bool = False,
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
    path's regime, matching the reference's per-frame output surface.
    ``packed_bgr`` (display-only) returns the frame as ONE (Hp, Wp) u32
    packed-BGR plane instead of (Hp, Wp, 3) u8: the in-kernel channel
    split AND the downstream 3-plane interleave stack disappear; the
    host unpacks with a free numpy view at display rate."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert not (packed_bgr and emit_aux), "packed_bgr is display-only"

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
            pl.BlockSpec(memory_space=pl.ANY),  # packed yh stripes
        ],
        out_specs=[
            pl.BlockSpec(
                (plan.TH, 128),
                lambda i, j, *_: (i, j),
                memory_space=pltpu.VMEM,
            )
        ]
        * (5 if emit_aux else (1 if packed_bgr else 3)),
        scratch_shapes=[
            pltpu.VMEM((2, plan.RB, plan.CB), band_dtype),
            pltpu.VMEM((2, plan.TH, plan.CB), jnp.int16),
            pltpu.VMEM((2 * plan.RB, plan.CB), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )

    f32_plane = jax.ShapeDtypeStruct((plan.Hp, plan.Wp), jnp.float32)
    u8_plane = jax.ShapeDtypeStruct((plan.Hp, plan.Wp), jnp.uint8)
    if emit_aux:
        kernel = functools.partial(_tail_kernel, plan=plan, pack=pack)
        out_shapes = [f32_plane, f32_plane, u8_plane, u8_plane, u8_plane]
    elif packed_bgr:
        kernel = functools.partial(
            _tail_kernel_display_packed, plan=plan, pack=pack
        )
        out_shapes = [jax.ShapeDtypeStruct((plan.Hp, plan.Wp), jnp.uint32)]
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
        jnp.asarray(plan.qenc),
        jnp.asarray(plan.x_abs),
        jnp.asarray(_make_lut()),
        disp_pad,
        jnp.asarray(plan.yh),
    )
    if emit_aux:
        disp_out, depth, b, g, r = outs
    elif packed_bgr:
        return outs[0], None, None
    else:
        disp_out = depth = None
        b, g, r = outs
    frame = jnp.stack([b, g, r], axis=-1)
    return frame, depth, disp_out
