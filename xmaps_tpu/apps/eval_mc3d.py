"""MC3D baseline for the offline evaluation, TPU-native.

Re-implements the reference's vendored MC3D per-pixel temporal
correspondence baseline (eval/mc3d_baseline.py:40-78, from uzh-rpg/ESL) as
a dense JAX program.

Reference semantics, per nonzero camera pixel (i, j) of a median-blurred
time-surface scan:

1. (xc, yc) = trunc(inverse camera rectification map[i, j])   (:29-37)
2. proj_id = trunc(Wp * Hp * t);  proj_x = proj_id // Hp,
   proj_y = proj_id % Hp  (column-major unravel, :58-59)
3. search y in [proj_y - nc, proj_y + nc), nc = Hp // 15, for the
   candidate minimizing |yc - trunc(proj_inverse_map_y[y, proj_x])|; if
   the minimum is <= 50 rows and the disparity
   trunc(proj_inverse_map_x[y, proj_x]) - xc is positive, keep it (:60-75)

The inner search is restructured for TPU: the projector inverse row map is
monotone in y along each column, so its inverse INV[x, y_rect] = argmin_y
|PY[y, x] - y_rect| is precomputed per column on the host (searchsorted)
and the per-pixel search becomes two dense gathers -- the candidate row is
INV clamped into the +-nc window (equal to the reference's window argmin
wherever |yc - PY| is unimodal in the window, i.e. everywhere the map is
monotone) followed by the same <= 50 and disparity > 0 acceptance tests.

Depth = P[0,3] / disparity with zero-preserve (:15-17), saved to
mc3d/depth/scansNNN.npy for the evaluation table.
"""

from __future__ import annotations

import argparse
import functools
import glob
import os
import time

import numpy as np

DIFF_Y_MAX = 50  # reference eval/mc3d_baseline.py:71


def build_mc3d_tables(calib, proj_w: int, proj_h: int, cam_w: int, cam_h: int):
    """Host-precomputed static tables (the reference's map setup, :108-113).

    Returns (xc, yc, PX, PY, INV, p03): truncated inverse rect maps for the
    camera grid, truncated inverse rect maps for the projector grid, the
    per-column inverse of PY, and the depth scale.
    """
    from xmaps_tpu.calib.geometry import (
        init_undistort_rectify_map_inverse,
    )
    from xmaps_tpu.calib.rectify import stereo_rectify

    rect_size = (proj_w, proj_h)  # loadCalibParams(calib, proj_shape)
    R1, R2, P1, P2, Q = stereo_rectify(
        calib.projector_K,
        calib.projector_D,
        calib.camera_K,
        calib.camera_D,
        rect_size,
        calib.cam2proj_R,
        calib.cam2proj_T,
    )
    # camera: R1/P1 (first stereoRectify outputs -- reference e3d.R0/P0)
    cam_mx, cam_my = init_undistort_rectify_map_inverse(
        calib.camera_K, calib.camera_D, R1, P1, (cam_w, cam_h)
    )
    # projector: R2/P2 (reference e3d.R1/P1), WITH projector distortion
    proj_mx, proj_my = init_undistort_rectify_map_inverse(
        calib.projector_K, calib.projector_D, R2, P2, (proj_w, proj_h)
    )
    xc = cam_mx.astype(np.int32)  # int() truncation (reference :33-34)
    yc = cam_my.astype(np.int32)
    PX = proj_mx.astype(np.int32)  # (Hp, Wp)
    PY = proj_my.astype(np.int32)

    # per-column inverse of PY: INV[x, yr] = argmin_y |PY[y, x] - yr|,
    # first occurrence on ties (np.argmin semantics).
    rect_h = proj_h * 3  # yc values live in the 3x rectified frame bounds
    INV = np.zeros((proj_w, rect_h), dtype=np.int32)
    for x in range(proj_w):
        col = PY[:, x].astype(np.int64)
        order = np.argsort(col, kind="stable")
        sorted_col = col[order]
        q = np.arange(rect_h)
        pos = np.searchsorted(sorted_col, q)
        pos_lo = np.clip(pos - 1, 0, proj_h - 1)
        pos_hi = np.clip(pos, 0, proj_h - 1)
        # PY is int-truncated, so duplicate-value runs are common; map each
        # candidate to the FIRST position of its value run so the stable
        # sort yields the smallest original y -- np.argmin's first-minimum
        # semantics in the reference's linear search (:64-71)
        pos_lo = np.searchsorted(sorted_col, sorted_col[pos_lo])
        pos_hi = np.searchsorted(sorted_col, sorted_col[pos_hi])
        d_lo = np.abs(sorted_col[pos_lo] - q)
        d_hi = np.abs(sorted_col[pos_hi] - q)
        cand_lo = order[pos_lo]
        cand_hi = order[pos_hi]
        # nearest value; on equal distance prefer the smaller ORIGINAL y
        take_lo = (d_lo < d_hi) | ((d_lo == d_hi) & (cand_lo < cand_hi))
        INV[x] = np.where(take_lo, cand_lo, cand_hi).astype(np.int32)
    return xc, yc, PX, PY, INV, float(P2[0, 3]), rect_size


def mc3d_disparity_dense(cam_image, tables, proj_w: int, proj_h: int):
    """Dense MC3D correspondence (reference compute_disparity, :40-78)."""
    import jax.numpy as jnp

    xc_np, yc_np, PX_np, PY_np, INV_np, p03, rect_size = tables
    rect_w3, rect_h3 = proj_w * 3, proj_h * 3  # reference rectified_shape
    nc = proj_h // 15

    cam = jnp.asarray(cam_image, jnp.float32)
    xc = jnp.asarray(xc_np)
    yc = jnp.asarray(yc_np)
    PXf = jnp.asarray(PX_np.reshape(-1))
    PYf = jnp.asarray(PY_np.reshape(-1))
    INVf = jnp.asarray(INV_np.reshape(-1))
    rect_h = INV_np.shape[1]

    valid = cam > 0
    # reference :52-57: strict in-bounds of the rectified event coords
    valid &= (xc > 0) & (xc < rect_w3) & (yc > 0) & (yc < rect_h3)

    pid = (proj_w * proj_h * cam).astype(jnp.int32)
    in_id = (pid >= 0) & (pid < proj_w * proj_h)  # unravel try/except (:73)
    pid_c = jnp.clip(pid, 0, proj_w * proj_h - 1)
    proj_x = pid_c // proj_h
    proj_y = pid_c % proj_h
    valid &= in_id

    # candidate row: global per-column inverse, clamped into the window
    yc_c = jnp.clip(yc, 0, rect_h - 1)
    y_glob = INVf[proj_x * rect_h + yc_c]
    y_lo = jnp.maximum(proj_y - nc, 0)
    y_hi = jnp.minimum(proj_y + nc, proj_h) - 1
    y_best = jnp.clip(y_glob, y_lo, y_hi)

    lin = y_best * proj_w + proj_x
    py = PYf[lin]
    px = PXf[lin]
    diff = jnp.abs(yc - py)
    disp = px - xc
    ok = valid & (diff <= DIFF_Y_MAX) & (disp > 0)
    return jnp.where(ok, disp, 0).astype(jnp.float32)


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="MC3D temporal-correspondence baseline: per-scan depth "
        "maps for a camera+projector rig (TPU reimplementation)"
    )
    parser.add_argument("-object_dir", type=str, default="")
    parser.add_argument("-proj_height", type=int, default=1920)
    parser.add_argument("-proj_width", type=int, default=1080)
    parser.add_argument("-calib", type=str, default="")
    parser.add_argument("-num_scans", type=int, default=60)
    parser.add_argument("-start_scan", type=int, default=0)
    parser.add_argument("-cam_width", type=int, default=640)
    parser.add_argument("-cam_height", type=int, default=480)
    args = parser.parse_args(argv)

    import jax

    from xmaps_tpu.calib.maps import CalibrationParams
    from xmaps_tpu.utils.denoise import median_blur_3x3

    calib = CalibrationParams.from_esl_yaml(
        args.calib,
        camera_width=args.cam_width,
        camera_height=args.cam_height,
        projector_width=args.proj_width,
        projector_height=args.proj_height,
    )

    depth_dir = os.path.join(args.object_dir, "mc3d", "depth")
    os.makedirs(depth_dir, exist_ok=True)

    scan_files = sorted(glob.glob(os.path.join(args.object_dir, "scans_np", "*.npy")))
    if not scan_files:
        print("No camera files found!")
        return 1
    print(f"Found {len(scan_files)} scans!")

    tables = build_mc3d_tables(
        calib, args.proj_width, args.proj_height, args.cam_width, args.cam_height
    )
    p03 = tables[5]

    for k in range(args.start_scan, min(args.start_scan + args.num_scans, len(scan_files))):
        cam_image = np.load(scan_files[k])
        if np.count_nonzero(cam_image) == 0:
            print(f"Skip {k}")
            continue
        print(scan_files[k])
        t0 = time.time()
        blurred = np.asarray(
            jax.device_get(median_blur_3x3(cam_image.astype(np.float32)))
        )
        disparity = np.asarray(
            jax.device_get(
                mc3d_disparity_dense(
                    blurred, tables, args.proj_width, args.proj_height
                )
            )
        )
        with np.errstate(divide="ignore", invalid="ignore"):
            depth = np.where(disparity != 0, p03 / disparity, 0.0).astype(np.float32)
        print(f"Completed frame {k} in time {time.time() - t0}")
        np.save(os.path.join(depth_dir, f"scans{str(k).zfill(3)}.npy"), depth)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
