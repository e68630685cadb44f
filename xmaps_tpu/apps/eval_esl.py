"""ESL baseline (init + refined) for the offline evaluation, TPU-native.

Re-implements the reference's vendored ESL pipeline
(eval/compute_depth_esl.py, from uzh-rpg/ESL) as dense JAX programs whose
outputs play the same roles (esl/depth_init and the refined
esl/depth_optim_filtered pseudo-ground-truth consumed by the evaluation
table, SURVEY.md §4):

- ``disparity_init`` (reference :72-85): per nonzero rectified camera
  pixel, a row-wise nearest-time search over columns [c+5, c+900).
  Rebuilt as a shift-scan over the dense rectified images: one
  lax.fori_loop over the disparity range, pure VPU elementwise ops, no
  per-pixel Python.
- ``depth_optimization`` (reference :104-129): per-pixel bounded scalar
  minimization of a patch L2 cost between the camera time image and the
  projector time surface at the reprojected location.  The projector time
  surface is an analytic column-major ramp (reference :96-101), so the
  patch cost collapses to a closed quadratic in the projected scan time:
  three (2w+1)^2 stencil sums of the camera image are precomputed once and
  every cost evaluation becomes elementwise math -- no gathers.  scipy's
  bounded Brent is replaced by a bounded two-level grid search over the
  same per-pixel bounds depth +- depth^2/P[0,3] (reference :110-112),
  evaluated for ALL pixels simultaneously (the cost is piecewise-constant
  in depth, which defeats Brent/golden-section schemes).
- bilateral + split-Bregman TV denoise (reference :242-247) via
  utils.denoise.

Method-level equivalent rather than bit-exact: argmin tie handling matches
(first minimum wins) but float32 device math vs float64 NumPy, and
golden-section vs Brent, can settle on neighboring minima.  That is the
right contract for a pseudo-GT baseline; the evaluation table compares all
methods against the same GT.
"""

from __future__ import annotations

import argparse
import functools
import glob
import os
import time

import numpy as np

MIN_DISP = 5  # reference eval/compute_depth_esl.py:75
MAX_DISP = 900
OOB_COST = 1.0e10  # dominates any in-bounds quadratic cost (reference: 100000)


@functools.lru_cache(maxsize=None)
def _disparity_init_jit():
    """Module-cached jitted brute-force search (a fresh jit per call would
    re-trace the 895-step loop for every scan)."""
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("lo", "hi"))
    def run(cam, proj, lo, hi):
        H, W = cam.shape
        proj_pad = jnp.concatenate(
            [proj, jnp.zeros((H, hi), proj.dtype)], axis=1
        )

        def body(d, state):
            count, best_cost, best_d = state
            shifted = jax.lax.dynamic_slice(proj_pad, (0, d), (H, W))
            valid = shifted != 0
            cost = (shifted - cam) ** 2
            better = valid & (cost < best_cost)
            return (
                count + valid.astype(jnp.int32),
                jnp.where(better, cost, best_cost),
                jnp.where(better, d, best_d),
            )

        init = (
            jnp.zeros((H, W), jnp.int32),
            jnp.full((H, W), jnp.inf, cam.dtype),
            jnp.zeros((H, W), jnp.int32),
        )
        count, _, best_d = jax.lax.fori_loop(lo, hi, body, init)
        ok = (cam != 0) & (count > 1)
        return jnp.where(ok, best_d, 0).astype(jnp.float32)

    return run


def disparity_init_dense(cam_rect, proj_rect, min_disp=MIN_DISP, max_disp=MAX_DISP):
    """Row-wise nearest-time disparity search (reference :72-85), dense.

    For each pixel c of each row, among nonzero projector pixels at
    columns c+d, d in [min_disp, max_disp), pick the d minimizing
    (proj - cam)^2 (first minimum on ties, like np.argmin); require at
    least two nonzero candidates and a nonzero camera pixel.
    """
    import jax.numpy as jnp

    return _disparity_init_jit()(
        jnp.asarray(cam_rect, jnp.float32),
        jnp.asarray(proj_rect, jnp.float32),
        int(min_disp),
        int(max_disp),
    )


class RefinePlan:
    """Per-pixel statics for the analytic refinement cost.

    cost^2(rho) = C0 - 2 * a(rho) * S1 + K * a(rho)^2       (in-bounds)
    where a = (trunc(x_proj) * Hp + trunc(y_proj)) / (Wp * Hp) is the
    projector scan time at the reprojected pixel and C0/S1 are stencil
    sums of the camera image (see module docstring).
    """

    def __init__(self, calib_params, maps, window_size: int, proj_w: int, proj_h: int):
        from xmaps_tpu.calib.geometry import undistort_points

        cam_K = calib_params.camera_K
        cam_D = calib_params.camera_D
        H, W = calib_params.camera_height, calib_params.camera_width
        xs, ys = np.meshgrid(np.arange(W), np.arange(H))
        pts = np.stack([xs, ys], axis=-1).reshape(-1, 2).astype(np.float32)
        # reference :29-34: undistortPoints(P=cam_K), then normalize by K
        und = undistort_points(pts, cam_K, cam_D, R=None, P=cam_K)
        self.x_n = (
            (und[:, 0] - cam_K[0, 2]) / cam_K[0, 0]
        ).reshape(H, W).astype(np.float32)
        self.y_n = (
            (und[:, 1] - cam_K[1, 2]) / cam_K[1, 1]
        ).reshape(H, W).astype(np.float32)
        self.R = np.asarray(maps.calib.cam2proj_R, np.float32)
        self.T = np.asarray(maps.calib.cam2proj_T, np.float32).reshape(3)
        self.proj_K = np.asarray(calib_params.projector_K, np.float32)
        self.proj_D = np.asarray(calib_params.projector_D, np.float32)
        self.window_size = int(window_size)
        self.w = self.window_size // 2
        self.proj_w = int(proj_w)
        self.proj_h = int(proj_h)
        self.p03 = float(maps.P2[0, 3])
        # per-iters traced refinement programs (see depth_optimization_dense)
        self._jit_cache = {}


def depth_optimization_dense(depth_init, cam_image, plan: RefinePlan, iters: int = 64):
    """Refinement of every defined depth pixel at once (reference
    depth_optimization, :104-129).  The traced program is cached on the
    plan (re-tracing the search loop per scan costs seconds).

    The cost is piecewise-constant in depth (integer projector pixel
    casts), which defeats gradient/golden-section schemes, so the bounded
    minimization is a two-level dense grid search: ``iters`` samples over
    [depth - diff, depth + diff], then ``iters`` more within one coarse
    step of the best sample.  First minimum wins (np.argmin semantics);
    the initial depth is always among the samples, so the result never has
    a higher cost than the init."""
    import jax

    fn = plan._jit_cache.get(iters)
    if fn is None:
        fn = plan._jit_cache[iters] = jax.jit(
            functools.partial(_depth_optimization_impl, plan=plan, iters=iters)
        )
    return fn(depth_init, cam_image)


def _depth_optimization_impl(depth_init, cam_image, *, plan, iters):
    import jax
    import jax.numpy as jnp

    w = plan.w
    ws = plan.window_size
    Hp, Wp = plan.proj_h, plan.proj_w
    K = (2 * w + 1) ** 2
    inv_n = 1.0 / (Wp * Hp)

    # stencil sums of the camera image (computed once per scan)
    cam = jnp.asarray(cam_image, jnp.float32)
    H, W = cam.shape
    pad = jnp.pad(cam, w)  # zero pad; border pixels are masked out below
    S0 = jnp.zeros_like(cam)
    S1 = jnp.zeros_like(cam)
    X1 = jnp.zeros_like(cam)
    B2 = 0.0
    for dy in range(-w, w + 1):
        for dx in range(-w, w + 1):
            c = pad[w + dy : w + dy + H, w + dx : w + dx + W]
            b = (dx * Hp + dy) * inv_n
            S0 = S0 + c * c
            S1 = S1 + c
            X1 = X1 + c * b
            B2 += b * b

    xn = jnp.asarray(plan.x_n)
    yn = jnp.asarray(plan.y_n)
    R = jnp.asarray(plan.R)
    T = jnp.asarray(plan.T)
    pK = jnp.asarray(plan.proj_K)
    k1, k2, p1, p2, k3 = [float(v) for v in np.resize(plan.proj_D, 5)]

    def cost(rho):
        # project_and_backproject_punkt (reference :27-42), elementwise
        X = xn * rho
        Y = yn * rho
        Z = rho
        xp = R[0, 0] * X + R[0, 1] * Y + R[0, 2] * Z + T[0]
        yp = R[1, 0] * X + R[1, 1] * Y + R[1, 2] * Z + T[1]
        zp = R[2, 0] * X + R[2, 1] * Y + R[2, 2] * Z + T[2]
        zp = jnp.where(zp == 0, 1e-12, zp)
        u = xp / zp
        v = yp / zp
        r2 = u * u + v * v
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        ud = u * radial + 2 * p1 * u * v + p2 * (r2 + 2 * u * u)
        vd = v * radial + p1 * (r2 + 2 * v * v) + 2 * p2 * u * v
        px = pK[0, 0] * ud + pK[0, 2]
        py = pK[1, 1] * vd + pK[1, 2]
        xi = px.astype(jnp.int32)  # trunc toward zero (reference :50 int cast)
        yi = py.astype(jnp.int32)
        inb = (
            (yi - w > 0) & (yi + w < Hp) & (xi - w > 0) & (xi + w < Wp)
        )  # reference :54-59 (strict)
        a = (xi * Hp + yi).astype(jnp.float32) * inv_n
        quad = (S0 - 2.0 * X1 + B2) - 2.0 * a * S1 + K * a * a
        return jnp.where(inb, quad, OOB_COST)

    depth0 = jnp.asarray(depth_init, jnp.float32)
    diff = (depth0 * depth0) / plan.p03  # reference :110 bound radius

    lo0 = depth0 - diff
    hi0 = depth0 + diff

    def grid_minimize(center, radius, n):
        # n+1 evenly spaced samples, clamped to the reference's bounds;
        # center is sampled exactly at i = n/2 (n even)
        step = 2.0 * radius / n

        def body(i, state):
            best_cost, best_x = state
            x = jnp.clip(center - radius + i * step, lo0, hi0)
            f = cost(x)
            better = f < best_cost
            return (
                jnp.where(better, f, best_cost),
                jnp.where(better, x, best_x),
            )

        init = (jnp.full_like(center, jnp.inf), center)
        best_cost, best_x = jax.lax.fori_loop(0, n + 1, body, init)
        return best_x, step

    x1, step1 = grid_minimize(depth0, diff, iters)
    refined, _ = grid_minimize(x1, step1, iters)

    # reference :107-108: only pixels with depth > 0, at least window_size
    # away from every border, are optimized; the rest stay 0.
    ys, xs = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    in_region = (
        (ys >= ws) & (ys < H - ws) & (xs >= ws) & (xs < W - ws)
    )
    return jnp.where((depth0 > 0) & in_region, refined, 0.0)


def normalize_scan(cam_image: np.ndarray) -> np.ndarray:
    """Reference :205-209: normalize nonzero values to [0, 1], clamp
    negatives (i.e. former zeros) to 0."""
    nz = cam_image != 0
    lo = cam_image[nz].min()
    hi = cam_image[nz].max()
    out = (cam_image - lo) / (hi - lo)
    out[out < 0] = 0
    return out.astype(np.float32)


def build_device_depth_init(
    maps, calib, proj_rect, p03,
    interpret: bool = False,
    allow_banded: bool = True,
    remap_method: str = "auto",
):
    """The fully device-resident per-scan depth-init program, cropped to
    the static camera footprint.

    The camera occupies a few percent of the 3x-projector rect surface,
    and that footprint is a pure function of the calibration: the
    forward remap's in-bounds mask bounds every possibly-nonzero
    cam_rect pixel, and the back-remap's target set bounds every rect
    position the camera-view gather reads.  Cropping the WHOLE per-scan
    path (remap -> binary search -> back-gather) to the union box is
    bit-identical to the full-surface path (ops/pallas_esl.py; pinned in
    tests/test_pallas_esl.py) and removes the dominant cost -- the remap
    alone materialized 18.7 Mpx per scan at the ESL eval geometry.

    The static box-sized arrays (forward remap index maps, hoisted
    search prep tables) are threaded through the jit as runtime
    ARGUMENTS, not trace constants: ~200 MB of HLO constants exceeds a
    remote-compile payload (tunneled TPU) and bloats every cache entry.

    ``allow_banded``: when the back-remap is viable as the HBM-banded
    Pallas remap (ops.pallas_remap.banded_hbm_viable), use it over the
    search kernel's PADDED output instead of XLA's serialized flat
    gather.  At the ESL eval geometry the back-remap's rotation (~2.5
    source rows per lane) fails the viability check, so the production
    path keeps the XLA gather with an optimization barrier; the round-5
    col-span windowed forward remap + barrier measured 11.87 ->
    9.75 ms/scan on TPU (eval/profile_esl_init.py attribution:
    forward remap 5.82 -> 3.93, XLA-fusion bucket 2.53 -> 2.19).
    Bit-identical either way.
    """
    import jax
    import jax.numpy as jnp

    from xmaps_tpu.ops.pallas_esl import (
        esl_disparity_search,
        esl_search_prep,
        footprint_box,
    )
    from xmaps_tpu.ops.pallas_remap import (
        apply_remap_static,
        build_remap_indices,
        prepare_remap_static,
    )

    H_r, W_r = calib.rect_image_height, calib.rect_image_width
    yi_fwd, xi_fwd, inb_fwd = build_remap_indices(
        maps.camera_mapx, maps.camera_mapy,
        (calib.camera_height, calib.camera_width),
    )
    yi_b, xi_b, inb_b = build_remap_indices(
        maps.disp_cam_mapx_f32, maps.disp_cam_mapy_f32, (H_r, W_r)
    )
    occ_rows = np.nonzero(inb_fwd.any(axis=1))[0]
    occ_cols = np.nonzero(inb_fwd.any(axis=0))[0]
    rb = yi_b[inb_b]
    cb = xi_b[inb_b]
    if len(occ_rows) == 0 and len(rb) == 0:
        fp_rows = fp_cols = (0, 0)  # degenerate calibration
    else:
        lo_r = min(int(occ_rows[0]) if len(occ_rows) else 1 << 30,
                   int(rb.min()) if len(rb) else 1 << 30)
        hi_r = max(int(occ_rows[-1]) + 1 if len(occ_rows) else 0,
                   int(rb.max()) + 1 if len(rb) else 0)
        lo_c = min(int(occ_cols[0]) if len(occ_cols) else 1 << 30,
                   int(cb.min()) if len(cb) else 1 << 30)
        hi_c = max(int(occ_cols[-1]) + 1 if len(occ_cols) else 0,
                   int(cb.max()) + 1 if len(cb) else 0)
        fp_rows, fp_cols = (lo_r, hi_r), (lo_c, hi_c)
    r0, r1, c0, c1 = footprint_box((H_r, W_r), fp_rows, fp_cols)
    box_shape = (r1 - r0, c1 - c0)

    # pre-crop the static inputs ONCE: forward remap indices (so the
    # remap emits only the box), the projector ramp, and box-relative
    # back-gather indices
    cfg_fwd, arrs_fwd = prepare_remap_static(
        yi_fwd[r0:r1, c0:c1], xi_fwd[r0:r1, c0:c1],
        inb_fwd[r0:r1, c0:c1], box_shape, calib.camera_width,
        method=remap_method,
    )
    proj_box = np.asarray(proj_rect)[r0:r1, c0:c1]
    lin_box = jnp.asarray(
        np.where(
            inb_b,
            (yi_b.astype(np.int64) - r0) * box_shape[1] + (xi_b - c0),
            0,
        ).astype(np.int32)
    )
    mask_b = jnp.asarray(inb_b)

    # the search's per-row projector scan tables are constant across
    # scans: hoist them out of the per-scan program (esl_search_prep;
    # XLA re-ran the 2.19 ms/scan of cummin/cummax/cumsum fusions
    # otherwise -- eval/profile_esl_init.py).  Both the prep tables and
    # the remap index arrays ride as RUNTIME arguments: as trace
    # constants they are embedded in the HLO (~200 MB at the ESL
    # geometry), which a tunneled remote-compile rejects outright
    # (HTTP 413) and which the back-remap projector pass has no use for
    prep = esl_search_prep(
        proj_box, row_range=fp_rows, col_range=fp_cols,
        full_shape=(H_r, W_r),
    )
    arrs_fwd = tuple(jax.device_put(jnp.asarray(a)) for a in arrs_fwd)

    use_banded = False
    if allow_banded:
        # box-relative back-remap indices for the banded Pallas gather
        # (consumes the search kernel's PADDED output directly)
        from xmaps_tpu.ops.pallas_esl import _round_up
        from xmaps_tpu.ops.pallas_remap import (
            banded_hbm_viable,
            remap_banded_hbm,
        )

        yi_rel = np.asarray(yi_b, np.int64) - r0
        xi_rel = np.asarray(xi_b, np.int64) - c0
        pad_shape = (
            _round_up(r1 - r0, 8), _round_up(c1 - c0, 128)
        )
        cam_shape = (calib.camera_height, calib.camera_width)
        # steeply rotated back-remaps (ESL: ~2.5 source rows per lane)
        # need full-surface bands that cannot fit VMEM; fall back to the
        # XLA gather there
        use_banded = banded_hbm_viable(
            pad_shape, yi_rel, xi_rel, inb_b, cam_shape
        )

    if use_banded:

        @jax.jit
        def _impl(cam_norm_dev, arrs_fwd, prep):
            cam_box = apply_remap_static(
                cam_norm_dev, arrs_fwd, cfg_fwd, interpret=interpret
            )
            disp_pad = esl_disparity_search(
                cam_box, None, interpret=interpret,
                row_range=fp_rows, col_range=fp_cols,
                full_shape=(H_r, W_r), emit_crop=True, emit_padded=True,
                prep=prep,
            )
            disp_cam = remap_banded_hbm(
                disp_pad, yi_rel, xi_rel, inb_b, cam_shape,
                interpret=interpret,
            )
            depth = jnp.where(disp_cam != 0, p03 / disp_cam, 0.0)
            return disp_cam, depth

    else:

        @jax.jit
        def _impl(cam_norm_dev, arrs_fwd, prep):
            cam_box = apply_remap_static(
                cam_norm_dev, arrs_fwd, cfg_fwd, interpret=interpret
            )
            disp_box = esl_disparity_search(
                cam_box, None, interpret=interpret,
                row_range=fp_rows, col_range=fp_cols,
                full_shape=(H_r, W_r), emit_crop=True, prep=prep,
            )
            # materialize the serialized flat gather ONCE behind a
            # barrier so XLA cannot rematerialize it per consumer (disp
            # and depth both read it); measured with the col-span remap
            # change as fusion bucket 2.53 -> 2.19 ms/scan
            # (eval/profile_esl_init.py)
            gathered = jax.lax.optimization_barrier(
                disp_box.reshape(-1)[lin_box]
            )
            disp_cam = jnp.where(mask_b, gathered, 0.0)
            depth = jnp.where(disp_cam != 0, p03 / disp_cam, 0.0)
            return disp_cam, depth

    def device_depth_init(cam_norm_dev):
        return _impl(cam_norm_dev, arrs_fwd, prep)

    # callers embedding the program inside a LARGER jit (bench groups)
    # must thread the bound arrays through their own signature, or they
    # come back as trace constants
    device_depth_init.impl = _impl
    device_depth_init.bound = (arrs_fwd, prep)
    return device_depth_init


def main(argv=None):
    from xmaps_tpu.utils.jaxenv import respect_jax_platforms

    respect_jax_platforms()  # honor an explicit JAX_PLATFORMS (e.g. cpu)
    parser = argparse.ArgumentParser(
        description="ESL depth baseline (init + refined), TPU-native"
    )
    parser.add_argument("-object_dir", type=str, default="")
    parser.add_argument("-proj_height", type=int, default=1920)
    parser.add_argument("-proj_width", type=int, default=1080)
    parser.add_argument("-calib", type=str, default="")
    parser.add_argument("-w", type=int, default=3, help="Window size")
    parser.add_argument("-num_scans", type=int, default=60)
    parser.add_argument("-start_scan", type=int, default=0)
    parser.add_argument("-cam_width", type=int, default=640)
    parser.add_argument("-cam_height", type=int, default=480)
    parser.add_argument(
        "-skip_refine", action="store_true",
        help="Only compute depth_init (skip optimization + denoise)",
    )
    parser.add_argument(
        "-no_fast_search", action="store_true",
        help="Disable the binary-search Pallas kernel (use the dense "
        "brute-force disparity scan)",
    )
    args = parser.parse_args(argv)

    import jax

    from xmaps_tpu.calib.maps import (
        CalibrationParams,
        CamProjMaps,
        remap_nearest,
    )
    from xmaps_tpu.utils.denoise import bilateral_filter, tv_denoise_split_bregman

    esl_dir = os.path.join(args.object_dir, "esl")
    dirs = {
        name: os.path.join(esl_dir, name)
        for name in ("disparity_init", "depth_init", "depth_optim", "depth_optim_filtered")
    }
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)

    calib = CalibrationParams.from_esl_yaml(
        args.calib,
        camera_width=args.cam_width,
        camera_height=args.cam_height,
        projector_width=args.proj_width,
        projector_height=args.proj_height,
        rectification_scale=3.0,
    )
    maps = CamProjMaps.build_cached(
        calib, zero_undistort_proj_map=True,
        cache_dir=os.path.expanduser("~/.cache/xmaps_tpu"),
    )

    scan_files = sorted(glob.glob(os.path.join(args.object_dir, "scans_np", "*.npy")))
    if not scan_files:
        print(f"No camera files found in {args.object_dir}/scans_np/!")
        return 1
    print(f"Found {len(scan_files)} scans!")

    # analytic projector ramp rectified into the rectified frame
    # (reference :96-101 + :201)
    proj_rect = maps.build_rectified_time_map(
        scan_upwards=False, border_replicate=False
    )
    plan = RefinePlan(calib, maps, args.w, args.proj_width, args.proj_height)
    p03 = float(maps.P2[0, 3])
    rect_shape = (calib.rect_image_height, calib.rect_image_width)

    # Fully device-resident fast path: ship the 1.2 MB scan, rectify with
    # the Pallas static remap, binary-search the disparity, and pull back
    # only the small camera-view result.  Requires monotone rows (true for
    # the rectified ramp) and an accelerator; falls back to the dense
    # brute-force otherwise.  Bit-identical either way.
    from xmaps_tpu.ops.pallas_esl import esl_disparity_search, rows_monotone

    # The Pallas kernels are TPU-specific (Mosaic lowering); other
    # accelerators use the dense XLA brute force.
    on_tpu = jax.devices()[0].platform not in ("cpu", "gpu", "cuda", "rocm")
    use_fast = on_tpu and not args.no_fast_search and rows_monotone(proj_rect)
    if use_fast:
        device_depth_init = build_device_depth_init(
            maps, calib, proj_rect, p03
        )

    for i in range(args.start_scan, min(args.start_scan + args.num_scans, len(scan_files))):
        cam_raw = np.load(scan_files[i])
        if np.count_nonzero(cam_raw) == 0:
            print(f"Skip camera npy file {scan_files[i]} since it is empty")
            continue
        print(f"Processing frame: {i}, camera npy file {scan_files[i]}")
        cam_norm = normalize_scan(cam_raw)

        t0 = time.time()
        if use_fast:
            disparity, depth_init = (
                np.asarray(jax.device_get(a))
                for a in device_depth_init(cam_norm)
            )
        else:
            cam_rect = remap_nearest(
                cam_norm, maps.camera_mapx, maps.camera_mapy,
                border_replicate=False,
            )
            disparity_rect = np.asarray(
                jax.device_get(disparity_init_dense(cam_rect, proj_rect))
            )
            # rectified -> camera view (reference :218-222)
            disparity = remap_nearest(
                disparity_rect,
                maps.disp_cam_mapx_f32,
                maps.disp_cam_mapy_f32,
                border_replicate=False,
            ).astype(np.float32)
            with np.errstate(divide="ignore", invalid="ignore"):
                depth_init = np.where(
                    disparity != 0, p03 / disparity, 0.0
                ).astype(np.float32)
        depth_init = np.asarray(depth_init, np.float32)
        np.save(
            os.path.join(dirs["disparity_init"], f"scans{str(i).zfill(3)}.npy"),
            np.asarray(disparity, np.float32),
        )
        print(f"Completed depth initialization: {i} in time {time.time() - t0}")
        np.save(
            os.path.join(dirs["depth_init"], f"scans{str(i).zfill(3)}.npy"),
            depth_init,
        )

        if args.skip_refine:
            continue

        # reference :211: zeros of the unrectified image -> 1/img[0,0]
        cam_for_refine = cam_norm.copy()
        with np.errstate(divide="ignore"):
            fill = 1.0 / cam_norm[0, 0] if cam_norm[0, 0] != 0 else np.inf
        cam_for_refine[cam_for_refine == 0] = fill

        t0 = time.time()
        depth_optim = np.asarray(
            jax.device_get(
                depth_optimization_dense(depth_init, cam_for_refine, plan)
            )
        ).astype(np.float32)
        print(f"Completed depth refinement: {i} in time {time.time() - t0}")
        np.save(
            os.path.join(dirs["depth_optim"], f"scans{str(i).zfill(3)}.npy"),
            depth_optim,
        )

        t0 = time.time()
        filtered = bilateral_filter(depth_optim, d=5, sigma_color=3.0, sigma_space=3.0)
        filtered = tv_denoise_split_bregman(filtered, mu=0.5)
        filtered = np.asarray(jax.device_get(filtered)).astype(np.float32)
        print(
            f"Completed bilateral filter and denoising: {i} in time {time.time() - t0}"
        )
        np.save(
            os.path.join(dirs["depth_optim_filtered"], f"scans{str(i).zfill(3)}.npy"),
            filtered,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
