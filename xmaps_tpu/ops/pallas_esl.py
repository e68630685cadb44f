"""Fused Pallas TPU kernel for the ESL-init disparity search.

The reference's disparity_init (eval/compute_depth_esl.py:72-85) scans, for
every nonzero rectified camera pixel (r, c), the projector row window
[c+5, c+900) for the nonzero value closest to the camera value -- O(W x D)
brute force (11.87 s/scan on the paper's CPU, 18.99 ms on its RTX 4090).

The rectified projector time surface is a monotone ramp along each row
(the scan sweeps columns in time; rectification preserves column order),
so the window scan collapses to a 10-step binary search:

- host/XLA prep per row (pure elementwise/scan passes):
    G[j]  = value of the next nonzero at column >= j (suffix fill; with
            monotone rows this is nondecreasing),
    F[j]  = value of the last nonzero at column <= j (prefix fill),
    N[j]  = column of the next nonzero >= j,
    R[j]  = first column of the equal-value run of the last nonzero <= j
            (np.argmin first-minimum semantics on value plateaus),
    C[j]  = prefix count of nonzeros;
- kernel per 8-row strip, everything VMEM-resident: binary search for
    j0 = first j in [c+5, min(c+900, W)) with G[j] >= cam[c],
  then the window argmin is one of two candidates -- the first nonzero
  >= j0 (value G[j0], column N[j0]) and the last nonzero < j0 (value
  F[j0-1], column max(R[j0-1], N[c+5]) after clamping its run into the
  window).  Costs are compared as float32 squares exactly like the
  brute-force path, ties to the smaller column (np.argmin order).
- row-local gathers decompose per output 128-lane group into up to 9
  static source tiles + lane take_along_axis + group select (the window
  is < 1024 columns, so a target is at most 8 lane-groups right of its
  pixel).

Exactness: bit-identical to apps.eval_esl.disparity_init_dense whenever
every row's nonzero values are nondecreasing; rows_monotone() checks this
at setup and callers fall back to the brute-force path otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["rows_monotone", "esl_disparity_search", "esl_search_prep"]

from xmaps_tpu.ops.pallas_events import _round_up  # noqa: E402

MAX_GO = 9  # lane-group offsets 0..8 cover windows < 1024 columns


def rows_monotone(proj_rect: np.ndarray) -> bool:
    """Whether each row's nonzero values are nondecreasing (the fast
    kernel's precondition)."""
    p = np.asarray(proj_rect)
    if not bool(((p == 0) | (p > 0)).all()):
        # _prep_rows' prefix fill uses 0 as the "no value yet" sentinel,
        # so negative nonzero values are out of contract
        return False
    filled = np.where(p != 0, p, -np.inf)
    running = np.maximum.accumulate(filled, axis=1)
    prev = np.concatenate(
        [np.full((p.shape[0], 1), -np.inf), running[:, :-1]], axis=1
    )
    return bool(((p == 0) | (p >= prev)).all())


def _prep_rows(proj):
    """Per-row scan arrays (see module docstring); all (H, W_pad)."""
    H, W_pad = proj.shape
    nz = proj != 0
    j_idx = jax.lax.broadcasted_iota(jnp.int32, (H, W_pad), 1)
    inf = jnp.float32(jnp.inf)

    # suffix fill of next nonzero value / column (reverse prefix scans)
    G = jnp.flip(
        jax.lax.cummin(jnp.flip(jnp.where(nz, proj, inf), 1), axis=1), 1
    )
    N = jnp.flip(
        jax.lax.cummin(jnp.flip(jnp.where(nz, j_idx, W_pad), 1), axis=1), 1
    )
    # prefix fill of last nonzero value (values are > 0 where nonzero)
    F = jax.lax.cummax(jnp.where(nz, proj, jnp.float32(0.0)), axis=1)
    # run starts: nonzero whose previous nonzero has a different value
    prevF = jnp.concatenate(
        [jnp.zeros((H, 1), proj.dtype), F[:, :-1]], axis=1
    )
    newrun = nz & (proj != prevF)
    R = jax.lax.cummax(jnp.where(newrun, j_idx, -1), axis=1)
    C = jnp.cumsum(nz.astype(jnp.int32), axis=1)
    return G, F, N, R, C


def _kernel(
    cam_ref,
    G_ref,
    F_ref,
    N_ref,
    R_ref,
    C_ref,
    out_ref,
    *,
    W: int,
    W_pad: int,
    min_disp: int,
    max_disp: int,
    steps: int,
):
    cam = cam_ref[:]
    G = G_ref[:]
    F = F_ref[:]
    N = N_ref[:]
    R = R_ref[:]
    C = C_ref[:]
    n_grp = W_pad // 128

    c_idx = jax.lax.broadcasted_iota(jnp.int32, cam.shape, 1)

    def gather_row(arr, m):
        """out[., c] = arr[., m[., c]] for m in [c, c + 1024).

        Per output 128-lane group g, the target lives in absolute group
        g..g+8 (windows are < 1024 columns): gather each candidate
        group's static tile with a lane dynamic_gather and select by the
        target group."""
        idx = m % 128
        need = m // 128
        outs = []
        for g in range(n_grp):
            sl = slice(g * 128, (g + 1) * 128)
            idx_g = idx[:, sl]
            need_g = need[:, sl]
            acc = None
            for go in range(min(MAX_GO, n_grp - g)):
                src = arr[:, (g + go) * 128 : (g + go + 1) * 128]
                got = jnp.take_along_axis(src, idx_g, axis=1)
                if acc is None:
                    acc = got
                else:
                    acc = jnp.where(need_g == g + go, got, acc)
            outs.append(acc)
        return jnp.concatenate(outs, axis=1)

    lo = c_idx + min_disp
    hi = jnp.minimum(c_idx + max_disp, W)
    # binary search: first j in [lo, hi) with G[j] >= cam (hi if none)
    l = lo
    r = hi
    for _ in range(steps):
        m = jnp.minimum((l + r) // 2, W_pad - 1)
        gm = gather_row(G, m)
        cond = gm >= cam
        r = jnp.where(cond, m, r)
        l = jnp.where(cond, l, m + 1)
    j0 = jnp.minimum(r, hi)

    j0c = jnp.minimum(j0, W_pad - 1)
    j0m1 = jnp.clip(j0 - 1, 0, W_pad - 1)


    w_u = gather_row(G, j0c)
    cu = gather_row(N, j0c)
    w_l = gather_row(F, j0m1)
    rl = gather_row(R, j0m1)
    cnt_lo = gather_row(C, jnp.clip(lo - 1, 0, W_pad - 1))
    cnt_j0 = gather_row(C, j0m1)
    cnt_hi = gather_row(C, jnp.clip(hi - 1, 0, W_pad - 1))
    n_lo = gather_row(N, jnp.minimum(lo, W_pad - 1))

    cnt_before_lo = jnp.where(lo >= 1, cnt_lo, 0)
    has_upper = (j0 < hi) & (cu < hi)
    has_lower = (j0 > lo) & (cnt_j0 - cnt_before_lo >= 1)
    # clamp the lower run into the window (its run may start before lo)
    cl = jnp.maximum(rl, n_lo)

    v = cam
    du2 = (w_u - v) * (w_u - v)
    dl2 = (v - w_l) * (v - w_l)
    # np.argmin first-minimum: the lower candidate sits at the smaller
    # window index, so ties go to it
    pick_lower = has_lower & (~has_upper | (dl2 <= du2))
    best = jnp.where(pick_lower, cl, cu)
    chosen = has_lower | has_upper

    # reference acceptance: nonzero camera pixel, >= 2 nonzero candidates
    total_cnt = cnt_hi - cnt_before_lo
    ok = (cam != 0) & (total_cnt > 1) & chosen & (c_idx < W)
    out_ref[:] = jnp.where(ok, best - c_idx, 0).astype(jnp.float32)


def footprint_box(
    full_shape: tuple,
    row_range: tuple,
    col_range: tuple,
    max_disp: int = 900,
) -> tuple:
    """Tile-aligned crop box (r0, r1, c0, c1) the search actually
    computes for the given camera-footprint bounds: rows quantized down
    to the sublane tiling, columns widened on the right by the disparity
    window.  Callers that pre-crop their inputs (remap emits only the
    box; see apps.eval_esl) must use exactly this box."""
    H, W = full_shape
    r0 = max((int(row_range[0]) // 8) * 8, 0)
    r1 = min(int(row_range[1]), H)
    c0 = max((int(col_range[0]) // 128) * 128, 0)
    c1 = min(int(col_range[1]) + max_disp, W)
    return r0, r1, c0, c1


@functools.partial(
    jax.jit,
    static_argnames=(
        "min_disp", "max_disp", "interpret", "row_range", "col_range",
        "full_shape", "emit_crop", "emit_padded",
    ),
)
def esl_search_prep(
    proj_rect,
    min_disp: int = 5,
    max_disp: int = 900,
    interpret: bool = False,
    row_range: tuple | None = None,
    col_range: tuple | None = None,
    full_shape: tuple | None = None,
    emit_crop: bool = False,
    emit_padded: bool = False,
):
    """Precompute the search's per-row scan tables (G, F, N, R, C).

    The tables are a pure function of the PROJECTOR ramp -- constant
    across scans -- yet inside the per-scan program XLA re-runs the
    full-surface cummin/cummax/cumsum fusions every scan (measured
    2.19 ms/scan at the ESL eval geometry, eval/profile_esl_init.py).
    Call this once at setup with the same arguments as
    :func:`esl_disparity_search` (minus the camera image) and pass the
    result as its ``prep=``; bit-identical by construction (same ops,
    hoisted).
    """
    proj = jnp.asarray(proj_rect, jnp.float32)
    if full_shape is not None:
        assert row_range is not None and col_range is not None
        H, W = full_shape
        r0, r1, c0, c1 = footprint_box(
            full_shape, row_range, col_range, max_disp
        )
        assert proj.shape == (r1 - r0, c1 - c0)
    else:
        H, W = proj.shape
        if row_range is None:
            r0, r1 = 0, H
        else:
            r0 = max((int(row_range[0]) // 8) * 8, 0)
            r1 = min(int(row_range[1]), H)
        if col_range is None:
            c0, c1 = 0, W
        else:
            c0 = max((int(col_range[0]) // 128) * 128, 0)
            c1 = min(int(col_range[1]) + max_disp, W)
        if r1 > r0 and c1 > c0:
            proj = proj[r0:r1, c0:c1]
    if r1 <= r0 or c1 <= c0:
        return None  # degenerate box: the search returns zeros early
    Hc, Wc = r1 - r0, c1 - c0
    H_pad = _round_up(Hc, 8)
    W_pad = _round_up(Wc, 128)
    proj_p = jnp.pad(
        proj, ((0, H_pad - Hc), (0, W_pad - Wc)), constant_values=0
    )
    return _prep_rows(proj_p)


@functools.partial(
    jax.jit,
    static_argnames=(
        "min_disp", "max_disp", "interpret", "row_range", "col_range",
        "full_shape", "emit_crop", "emit_padded",
    ),
)
def esl_disparity_search(
    cam_rect,
    proj_rect,
    min_disp: int = 5,
    max_disp: int = 900,
    interpret: bool = False,
    row_range: tuple | None = None,
    col_range: tuple | None = None,
    full_shape: tuple | None = None,
    emit_crop: bool = False,
    emit_padded: bool = False,
    prep=None,
):
    """Binary-search ESL-init disparity over monotone rows (see module
    docstring).  cam_rect/proj_rect: (H, W) float32; returns (H, W) f32.

    ``prep``: the (G, F, N, R, C) tables from :func:`esl_search_prep`
    called with identical cropping arguments -- hoists the per-row
    projector scans (constant across scans) out of the per-scan program.
    With prep given, ``proj_rect`` may be None (it is otherwise unused;
    callers jitting over the prep tables as runtime arguments have no
    projector surface to pass).

    ``row_range`` / ``col_range``: static (lo, hi) bounds containing
    EVERY possibly-nonzero camera pixel of cam_rect (e.g. from the
    forward remap's in-bounds mask, a pure function of the calibration
    -- apps.eval_esl).  The search then runs only on that crop, padded
    to tile boundaries and widened by the disparity window on the right.
    Bit-identical to the full search: zero camera pixels produce zero
    output by definition (the acceptance test requires cam != 0), every
    in-crop window is fully resident (cols reach at most c + max_disp
    <= col_hi + max_disp), and the kernel's C-count/F/R prefix scans are
    only ever consumed as in-window differences (never absolute), so the
    missing left-of-crop history cancels.  At the ESL eval geometry the
    camera footprint covers a few percent of the rect surface, so this
    is an order-of-magnitude cut.

    ``full_shape``: pass the full rect (H, W) when cam_rect/proj_rect are
    ALREADY cropped to :func:`footprint_box` of (row_range, col_range) --
    the per-scan remap then never materializes the empty remainder of
    the rect surface (apps.eval_esl pre-crops its remap indices once).
    ``emit_crop`` returns just the box instead of pasting it into a
    full-size zero map (callers gathering through box-relative indices).
    ``emit_padded`` (implies emit_crop) returns the kernel's tile-padded
    (H_pad, W_pad) output uncropped -- padded rows/cols are zero (their
    camera pixels are zero-padding, which the acceptance test rejects)
    -- so a downstream banded consumer (ops.pallas_remap
    .remap_banded_hbm) can DMA it without a slice copy in between.
    """
    # gather_row reaches at most MAX_GO*128-127 lanes right of a pixel,
    # and the cnt gather at lo-1 must stay right of the pixel's group
    assert 1 <= min_disp and max_disp <= MAX_GO * 128 - 127, (
        f"unsupported disparity window [{min_disp}, {max_disp})"
    )
    cam = jnp.asarray(cam_rect, jnp.float32)
    assert proj_rect is not None or prep is not None
    proj = (
        None if proj_rect is None else jnp.asarray(proj_rect, jnp.float32)
    )
    if full_shape is not None:
        assert row_range is not None and col_range is not None
        H, W = full_shape
        r0, r1, c0, c1 = footprint_box(
            full_shape, row_range, col_range, max_disp
        )
        assert proj is None or cam.shape == proj.shape
        assert cam.shape == (r1 - r0, c1 - c0), (
            f"pre-cropped inputs {cam.shape} do not match footprint_box "
            f"{(r1 - r0, c1 - c0)}"
        )
        pre_cropped = True
    else:
        H, W = cam.shape
        if row_range is None:
            r0, r1 = 0, H
        else:
            r0 = max((int(row_range[0]) // 8) * 8, 0)
            r1 = min(int(row_range[1]), H)
        if col_range is None:
            c0, c1 = 0, W
        else:
            c0 = max((int(col_range[0]) // 128) * 128, 0)
            # windows from the last occupied column reach max_disp right
            c1 = min(int(col_range[1]) + max_disp, W)
        pre_cropped = False
    if r1 <= r0 or c1 <= c0:
        if emit_padded:
            return jnp.zeros((8, 128), jnp.float32)  # minimal aligned map
        if emit_crop:
            return jnp.zeros((max(r1 - r0, 0), max(c1 - c0, 0)), jnp.float32)
        return jnp.zeros((H, W), jnp.float32)

    if not pre_cropped:
        cam = cam[r0:r1, c0:c1]
        if proj is not None:
            proj = proj[r0:r1, c0:c1]
    Hc, Wc = r1 - r0, c1 - c0
    # local width of REAL data (absolute W in crop coordinates): windows
    # clip at it and pixels beyond it are invalid, exactly as before
    W_loc = W - c0
    H_pad = _round_up(Hc, 8)
    W_pad = _round_up(Wc, 128)

    def pad(a, fill=0):
        return jnp.pad(
            a,
            ((0, H_pad - Hc), (0, W_pad - Wc)),
            constant_values=fill,
        )

    cam_p = pad(cam)
    if prep is not None:
        G, F, N, R, C = prep
        assert G.shape == (H_pad, W_pad), (
            f"prep tables {G.shape} do not match the padded crop "
            f"{(H_pad, W_pad)} -- esl_search_prep must be called with "
            f"the same cropping arguments"
        )
    else:
        proj_p = pad(proj)
        G, F, N, R, C = _prep_rows(proj_p)

    steps = int(np.ceil(np.log2(max_disp - min_disp))) + 1
    kernel = functools.partial(
        _kernel,
        W=min(W_loc, W_pad),
        W_pad=W_pad,
        min_disp=min_disp,
        max_disp=max_disp,
        steps=steps,
    )
    strip = pl.BlockSpec((8, W_pad), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(H_pad // 8,),
        in_specs=[strip] * 6,
        out_specs=strip,
        out_shape=jax.ShapeDtypeStruct((H_pad, W_pad), jnp.float32),
        interpret=interpret,
    )(cam_p, G, F, N, R, C)
    if emit_padded:
        return out
    out = out[: min(Hc, H - r0), : min(Wc, W - c0)]
    if emit_crop or (row_range is None and col_range is None):
        return out
    full = jnp.zeros((H, W), jnp.float32)
    return jax.lax.dynamic_update_slice(full, out, (r0, c0))
