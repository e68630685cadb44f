"""Binary-search ESL-init kernel + static Pallas remap vs their oracles
(interpret mode on CPU; the same comparisons run compiled on TPU in the
eval CLI, verified bit-identical there)."""

import numpy as np
import pytest

from xmaps_tpu.apps.eval_esl import disparity_init_dense
from xmaps_tpu.calib.maps import remap_nearest
from xmaps_tpu.ops.pallas_esl import esl_disparity_search, rows_monotone
from xmaps_tpu.ops.pallas_remap import build_remap_indices, remap_static


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


@pytest.mark.parametrize("trial", range(3))
def test_esl_search_matches_brute_force(rng, trial):
    H, W = 24, 300 + 80 * trial
    base = np.sort(rng.random((H, W)).astype(np.float32), axis=1)
    if trial % 2:
        base = np.round(base * 60) / 60  # equal-value plateaus
    mask = rng.random((H, W)) < (0.15 + 0.1 * trial)
    proj = np.where(mask, base + 1e-3, 0).astype(np.float32)
    cam = np.where(
        rng.random((H, W)) < 0.3, rng.random((H, W)), 0
    ).astype(np.float32)
    # exact value matches exercise the tie rules
    cc = rng.integers(0, W - 130, 40)
    rr = rng.integers(0, H, 40)
    cam[rr, cc] = proj[rr, np.minimum(cc + 17, W - 1)]

    assert rows_monotone(proj)
    md = 120 + 60 * trial
    want = np.asarray(disparity_init_dense(cam, proj, min_disp=5, max_disp=md))
    got = np.asarray(
        esl_disparity_search(cam, proj, min_disp=5, max_disp=md, interpret=True)
    )
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("trial", range(3))
def test_esl_search_footprint_crop_bit_equal(rng, trial):
    """The static row/col footprint crop must be invisible in the result
    (every nonzero camera pixel inside the bounds; see
    ops/pallas_esl.esl_disparity_search)."""
    H, W = 48, 420 + 64 * trial
    base = np.sort(rng.random((H, W)).astype(np.float32), axis=1)
    mask = rng.random((H, W)) < 0.2
    proj = np.where(mask, base + 1e-3, 0).astype(np.float32)
    cam = np.zeros((H, W), np.float32)
    # occupancy confined to an interior window (like a camera footprint),
    # deliberately not tile-aligned
    r0, r1, c0, c1 = 11, 37, 70, 260 + 40 * trial
    blob = rng.random((r1 - r0, c1 - c0)).astype(np.float32)
    cam[r0:r1, c0:c1] = np.where(blob < 0.4, blob, 0)
    md = 150 + 50 * trial

    full = np.asarray(
        esl_disparity_search(cam, proj, min_disp=5, max_disp=md,
                             interpret=True)
    )
    cropped = np.asarray(
        esl_disparity_search(
            cam, proj, min_disp=5, max_disp=md, interpret=True,
            row_range=(r0, r1), col_range=(c0, c1),
        )
    )
    np.testing.assert_array_equal(full, cropped)
    assert full.any()  # the comparison is not vacuous

    # hoisted projector prep tables (esl_search_prep) must be invisible
    # too -- same ops, computed once instead of per scan
    from xmaps_tpu.ops.pallas_esl import esl_search_prep

    prep = esl_search_prep(
        proj, min_disp=5, max_disp=md,
        row_range=(r0, r1), col_range=(c0, c1),
    )
    with_prep = np.asarray(
        esl_disparity_search(
            cam, proj, min_disp=5, max_disp=md, interpret=True,
            row_range=(r0, r1), col_range=(c0, c1), prep=prep,
        )
    )
    np.testing.assert_array_equal(full, with_prep)


def test_esl_device_depth_init_cropped_matches_dense(rng):
    """The production pre-cropped per-scan program (remap -> search ->
    back-gather, all on the footprint box; apps.eval_esl
    build_device_depth_init) vs the dense full-surface oracle path."""
    from xmaps_tpu.apps.eval_esl import (
        build_device_depth_init,
        disparity_init_dense,
    )
    from xmaps_tpu.calib.maps import CamProjMaps, remap_nearest
    from xmaps_tpu.utils.synthetic import make_synthetic_calibration

    calib = make_synthetic_calibration(
        camera_width=64, camera_height=48,
        projector_width=90, projector_height=160,
        rectification_scale=3.0,
    )
    maps = CamProjMaps(calib, zero_undistort_proj_map=True)
    proj_rect = maps.build_rectified_time_map(
        scan_upwards=False, border_replicate=False
    )
    assert rows_monotone(proj_rect)
    p03 = float(maps.P2[0, 3])

    cam = np.where(
        rng.random((48, 64)) < 0.8, rng.random((48, 64)), 0
    ).astype(np.float32)

    # dense oracle: full remap + dense search + full back-remap
    cam_rect = remap_nearest(
        cam, maps.camera_mapx, maps.camera_mapy, border_replicate=False
    )
    disp_rect = np.asarray(disparity_init_dense(cam_rect, proj_rect))
    want = remap_nearest(
        disp_rect, maps.disp_cam_mapx_f32, maps.disp_cam_mapy_f32,
        border_replicate=False,
    ).astype(np.float32)

    # back-remap variants (XLA flat gather; the HBM-banded Pallas remap
    # when viable at this gentle synthetic rotation) x forward-remap
    # kernels (walk; the opt-in composed two-gather)
    for allow_banded, method in (
        (False, "auto"), (True, "auto"), (False, "composed")
    ):
        dev_init = build_device_depth_init(
            maps, calib, proj_rect, p03,
            interpret=True, allow_banded=allow_banded,
            remap_method=method,
        )
        disp_cam, depth = (np.asarray(a) for a in dev_init(cam))
        np.testing.assert_array_equal(disp_cam, want)
        assert disp_cam.any()


def test_esl_search_empty_footprint():
    cam = np.zeros((16, 256), np.float32)
    proj = np.zeros((16, 256), np.float32)
    out = np.asarray(
        esl_disparity_search(
            cam, proj, interpret=True, row_range=(0, 0), col_range=(0, 0)
        )
    )
    np.testing.assert_array_equal(out, 0)


def test_rows_monotone_detects_violation(rng):
    proj = np.zeros((4, 64), np.float32)
    proj[0, 10] = 0.5
    proj[0, 20] = 0.7
    assert rows_monotone(proj)
    proj[0, 30] = 0.6  # decreasing nonzero
    assert not rows_monotone(proj)


def test_remap_static_matches_remap_nearest(rng):
    Hs, Ws = 48, 64
    H, W = 120, 200
    src = rng.random((Hs, Ws)).astype(np.float32)
    map_x = (rng.random((H, W)) * Ws * 1.2 - 4).astype(np.float32)
    map_y = (rng.random((H, W)) * Hs * 1.2 - 4).astype(np.float32)
    want = remap_nearest(src, map_x, map_y, border_replicate=False)
    yi, xi, inb = build_remap_indices(map_x, map_y, (Hs, Ws))
    assert inb.any() and not inb.all()  # exercises the OOB zero column
    got = np.asarray(remap_static(src, yi, xi, (H, W), interpret=True))
    np.testing.assert_array_equal(got, want)


def _smooth_maps(rng, out_shape, src_shape, margin=2.0):
    """Smooth (rectification-like) float maps: affine + small ripple,
    slightly overshooting the source so OOB lanes exist."""
    H, W = out_shape
    Hs, Ws = src_shape
    jj, ii = np.meshgrid(np.arange(W), np.arange(H))
    map_x = (jj + 0.5) * (Ws + margin) / W - 1.0 + 0.8 * np.sin(ii / 17.0)
    map_y = (ii + 0.5) * (Hs + margin) / H - 1.0 + 0.8 * np.cos(jj / 23.0)
    return map_x.astype(np.float32), map_y.astype(np.float32)


def test_remap_static_col_span_bit_equal(rng):
    """The host-derived column-span window (auto for concrete maps) is an
    identity transform vs the full column walk."""
    Hs, Ws = 40, 512
    H, W = 96, 640
    src = rng.random((Hs, Ws)).astype(np.float32)
    map_x, map_y = _smooth_maps(rng, (H, W), (Hs, Ws))
    yi, xi, inb = build_remap_indices(map_x, map_y, (Hs, Ws))
    assert inb.any() and not inb.all()
    want = remap_nearest(src, map_x, map_y, border_replicate=False)
    from xmaps_tpu.ops.pallas_remap import _block_col_span, _pad_indices

    auto_span = _block_col_span(
        np.asarray(_pad_indices(yi, xi, (H, W), pad_col=Ws)[1])
    )
    assert auto_span < (Ws + 128) // 128 + 1  # the window is real
    for span in (None, auto_span, auto_span + 1, 99):
        got = np.asarray(
            remap_static(src, yi, xi, (H, W), interpret=True, col_span=span)
        )
        np.testing.assert_array_equal(got, want)
    # the inb variant (OOB lanes borrow nearest valid indices, masked
    # output) must match remap_nearest too, with a tighter auto span
    got = np.asarray(
        remap_static(src, yi, xi, (H, W), interpret=True, inb=inb)
    )
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("trial", range(3))
def test_remap_static_composed_bit_equal(rng, trial):
    """The two-gather composed kernel (host layered row tables) vs the
    walk kernel and the host oracle, on rotated upsampling maps that
    force multi-layer conflicts (same output row, same source column,
    different source rows)."""
    from xmaps_tpu.ops.pallas_remap import (
        _block_col_span,
        _compose_two_gather,
        _nearest_valid_fill,
        _round_up,
    )

    Hs, Ws = 40 + 8 * trial, 200 + 64 * trial
    H, W = 120, 300 + 100 * trial
    src = rng.random((Hs, Ws)).astype(np.float32)
    jj, ii = np.meshgrid(np.arange(W), np.arange(H))
    # ~0.35 source cols per dest lane + strong row drift along the lane
    # axis -> same-column destinations within a row disagree on the row
    map_x = (jj * 0.33 + 0.05 * ii - 1.0).astype(np.float32)
    map_y = (ii * 0.28 + 0.09 * jj - 1.0).astype(np.float32)
    yi, xi, inb = build_remap_indices(map_x, map_y, (Hs, Ws))
    assert inb.any() and not inb.all()
    want = remap_nearest(src, map_x, map_y, border_replicate=False)

    # the geometry really exercises layers
    yi_f = _nearest_valid_fill(np.asarray(yi, np.int32), np.asarray(inb))
    xi_f = _nearest_valid_fill(np.asarray(xi, np.int32), np.asarray(inb))
    Hp, Wp = _round_up(H, 8), _round_up(W, 128)
    yi_p = np.pad(yi_f, ((0, Hp - H), (0, Wp - W)), mode="edge")
    xi_p = np.pad(xi_f, ((0, Hp - H), (0, Wp - W)), mode="edge")
    ncg = _round_up(Ws + 1, 128) // 128
    *_, K = _compose_two_gather(yi_p, xi_p, ncg, _block_col_span(xi_p))
    assert K >= 2, "map fails to generate layer conflicts"

    for method in ("walk", "composed"):
        got = np.asarray(
            remap_static(src, yi, xi, (H, W), interpret=True, inb=inb,
                         method=method)
        )
        np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("trial", range(3))
def test_remap_banded_hbm_matches_oracle(rng, trial):
    """HBM-banded large-source remap vs where(inb, src[yi, xi], 0)."""
    from xmaps_tpu.ops.pallas_remap import remap_banded_hbm

    Hs, Ws = 8 * (20 + 4 * trial), 128 * (3 + trial)
    H, W = 56, 200 + 50 * trial
    src = rng.random((Hs, Ws)).astype(np.float32)
    map_x, map_y = _smooth_maps(rng, (H, W), (Hs, Ws))
    yi, xi, inb = build_remap_indices(map_x, map_y, (Hs, Ws))
    assert inb.any() and not inb.all()
    yi_c = np.clip(yi, 0, Hs - 1)
    xi_c = np.clip(xi, 0, Ws - 1)
    want = np.where(inb, src[yi_c, xi_c], 0).astype(np.float32)
    got = np.asarray(
        remap_banded_hbm(src, yi, xi, inb, (H, W), interpret=True)
    )
    np.testing.assert_array_equal(got, want)
