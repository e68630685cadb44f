"""ESL-init timing at the real ESL geometry (VERDICT r4 item 5).

Target: beat the paper's 18.99 ms/scan CUDA (RTX 4090) comparison point
(BASELINE.md, paper Table 2).  Round 4 stood at ~34 ms/scan with the
binary-search kernel over the FULL rect surface; round 5 adds the static
camera-footprint crop (ops/pallas_esl.esl_disparity_search row/col
ranges) -- the camera occupies a few percent of the 3x-projector rect
frame, so most strips never contained a possibly-nonzero camera pixel.

Times the exact device path apps/eval_esl.py runs per scan (rectify ->
search -> back-remap -> depth), group-differenced (see memory: per-call
timing through the tunnel is meaningless).  Prints ONE JSON line.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from xmaps_tpu.utils.jaxenv import respect_jax_platforms

    respect_jax_platforms()
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/xmaps_tpu/jax_cache"),
    )
    from xmaps_tpu.calib.maps import CalibrationParams, CamProjMaps
    from xmaps_tpu.ops.pallas_esl import esl_disparity_search, rows_monotone
    from xmaps_tpu.ops.pallas_remap import build_remap_indices

    # ESL_calib_hhi.yaml is in the X-maps dialect; apply from_esl_yaml's
    # rect sizing (3x the projector dims) on top of it
    import dataclasses

    calib = CalibrationParams.from_yaml(
        "/root/reference/data/ESL_calib_hhi.yaml", 640, 480, 1080, 1920
    )
    calib = dataclasses.replace(
        calib, rect_image_width=3 * 1080, rect_image_height=3 * 1920
    )
    maps = CamProjMaps.build_cached(
        calib, zero_undistort_proj_map=True,
        cache_dir=os.path.expanduser("~/.cache/xmaps_tpu"),
    )
    proj_rect = maps.build_rectified_time_map(
        scan_upwards=False, border_replicate=False
    )
    assert rows_monotone(proj_rect)
    rect_shape = (calib.rect_image_height, calib.rect_image_width)
    p03 = float(maps.P2[0, 3])

    from xmaps_tpu.apps.eval_esl import build_device_depth_init

    H, W = rect_shape
    # the production cropped program (exactly what apps/eval_esl runs)
    cropped_init = build_device_depth_init(maps, calib, proj_rect, p03)
    # the opt-in two-gather composed remap variant, for the A/B row
    composed_init = build_device_depth_init(
        maps, calib, proj_rect, p03, remap_method="composed"
    )

    # the round-4 full-surface program, for the comparison row
    yi_fwd, xi_fwd, inb_fwd = build_remap_indices(
        maps.camera_mapx, maps.camera_mapy,
        (calib.camera_height, calib.camera_width),
    )
    occ_rows = np.nonzero(inb_fwd.any(axis=1))[0]
    occ_cols = np.nonzero(inb_fwd.any(axis=0))[0]
    fp_rows = (int(occ_rows[0]), int(occ_rows[-1]) + 1)
    fp_cols = (int(occ_cols[0]), int(occ_cols[-1]) + 1)
    fp_frac = (
        (fp_rows[1] - fp_rows[0]) * (fp_cols[1] - fp_cols[0]) / (H * W)
    )
    # all large tables ride as runtime arguments: closed-over arrays
    # (host or device) ship their bytes in every tunneled remote-compile
    # request (128 MB device closure measured at 255 s; >~200 MB total
    # fails with HTTP 413)
    from xmaps_tpu.ops.pallas_remap import (
        _block_col_span,
        _pad_indices,
        _remap_static_call,
    )

    yi_p, xi_p = _pad_indices(yi_fwd, xi_fwd, rect_shape, pad_col=640)
    cs_full = _block_col_span(np.asarray(xi_p))
    full_args = (
        jax.device_put(jnp.asarray(yi_p)),
        jax.device_put(jnp.asarray(xi_p)),
        jax.device_put(jnp.asarray(proj_rect)),
    )
    yi_b, xi_b, inb_b = build_remap_indices(
        maps.disp_cam_mapx_f32, maps.disp_cam_mapy_f32, (H, W)
    )
    lin_b = jnp.asarray(
        np.where(inb_b, yi_b.astype(np.int64) * W + xi_b, 0).astype(np.int32)
    )
    mask_b = jnp.asarray(inb_b)

    def full_init(cam_norm, yi_d, xi_d, proj_dev):
        cam_rect = _remap_static_call(
            cam_norm, yi_d, xi_d, rect_shape, False, cs_full
        )
        disp_rect = esl_disparity_search(cam_rect, proj_dev)
        disp_cam = jnp.where(mask_b, disp_rect.reshape(-1)[lin_b], 0.0)
        depth = jnp.where(disp_cam != 0, p03 / disp_cam, 0.0)
        return disp_cam, depth

    rng = np.random.default_rng(3)
    cam = np.where(
        rng.random((480, 640)) < 0.85, rng.random((480, 640)), 0
    ).astype(np.float32)
    cam_d = jax.device_put(cam)
    jax.block_until_ready(jax.device_put(np.zeros(32 << 20, np.uint8)))

    def timed(fn, label, bound=()):
        def group(reps):
            @jax.jit
            def g(c, bound):
                acc = jnp.float32(0)
                for i in range(reps):
                    disp, depth = fn(c + jnp.float32(i) * 1e-7, *bound)
                    acc = acc + depth[0, 0] + disp[7, 7]
                return acc

            return g

        # small rep counts: the FULL-surface program is ~19 Mpx per rep
        # and a 9-rep inlined group took >25 min to compile through the
        # tunnel; 1-vs-4 keeps compiles bounded while the 3-rep delta
        # (tens of ms) still dwarfs the ~1-2 ms tunnel jitter
        g1, g4 = group(1), group(4)
        print(f"# {label}: compiling g1...", flush=True)
        jax.block_until_ready(g1(cam_d, bound))
        print(f"# {label}: compiling g4...", flush=True)
        jax.block_until_ready(g4(cam_d, bound))
        print(f"# {label}: timing...", flush=True)
        # Tunnel jitter is additive-positive, so min() over trials is the
        # clean estimate of EACH group; difference the mins.  (min of the
        # per-trial differences is biased toward -inf: one jitter spike on
        # the 1-rep trial produces a negative outlier that min() locks in.)
        t1s, t4s = [], []
        for _ in range(10):
            t0 = time.perf_counter()
            float(g1(cam_d, bound))
            t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(g4(cam_d, bound))
            t4s.append(time.perf_counter() - t0)
        best = (min(t4s) - min(t1s)) / 3
        assert best > 0, (t1s, t4s)
        print(f"# {label}: {best * 1e3:.2f} ms/scan", flush=True)
        return best

    t_crop = timed(
        cropped_init.impl, "footprint crop (production path)",
        bound=cropped_init.bound,
    )
    t_comp = timed(
        composed_init.impl, "footprint crop (composed remap)",
        bound=composed_init.bound,
    )
    t_full = timed(full_init, "full surface (round-4 path)", bound=full_args)

    # bit-equality of the three paths on this scan
    a = np.asarray(cropped_init(cam_d)[0])
    b = np.asarray(full_init(cam_d, *full_args)[0])
    c = np.asarray(composed_init(cam_d)[0])
    assert np.array_equal(a, b), "crop changed the result"
    assert np.array_equal(a, c), "composed remap changed the result"

    print(json.dumps({
        "metric": "esl_init_ms_per_scan",
        "value": round(t_crop * 1e3, 2),
        "unit": "ms",
        "vs_cuda_18_99ms": round(18.99 / (t_crop * 1e3), 2),
        "composed_remap_ms": round(t_comp * 1e3, 2),
        "full_surface_ms": round(t_full * 1e3, 2),
        "footprint_rows": fp_rows,
        "footprint_cols": fp_cols,
        "footprint_area_frac": round(fp_frac, 4),
        "bit_equal_to_full": True,
        "geometry": "ESL_calib_hhi 640x480 cam, 1080x1920 proj, 3x rect",
    }))


if __name__ == "__main__":
    main()
