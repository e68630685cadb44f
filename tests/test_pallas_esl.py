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
