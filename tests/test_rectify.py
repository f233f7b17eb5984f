"""Stereo rectification vs the cv2 oracle on the real Stereo-EuRoC.yaml
(the reference's own rectification recipe, stereo_euroc.cc:72-100)."""

import os

import numpy as np
import pytest

from orbslam2_tpu.config import _parse_opencv_yaml
from orbslam2_tpu.ops import rectify

EUROC_YAML = "/root/reference/Config/Stereo-EuRoC.yaml"

cv2 = pytest.importorskip("cv2")
pytestmark = pytest.mark.skipif(not os.path.exists(EUROC_YAML),
                                reason="reference configs not present")


def _flat():
    with open(EUROC_YAML) as f:
        return _parse_opencv_yaml(f.read())


def test_maps_match_cv2():
    flat = _flat()
    for side in ("LEFT", "RIGHT"):
        K = flat[f"{side}.K"]
        D = flat[f"{side}.D"]
        R = flat[f"{side}.R"]
        P = np.asarray(flat[f"{side}.P"])[:3, :3]
        w, h = int(flat[f"{side}.width"]), int(flat[f"{side}.height"])
        mx, my = rectify.init_undistort_rectify_map(K, D, R, P, w, h)
        m1, m2 = cv2.initUndistortRectifyMap(
            K, D, R, P, (w, h), cv2.CV_32FC1)
        np.testing.assert_allclose(mx, m1, atol=2e-3)
        np.testing.assert_allclose(my, m2, atol=2e-3)


def test_remap_matches_cv2(rng):
    flat = _flat()
    rect = rectify.load_rectification(flat)
    assert rect is not None
    h, w = rect.maps.lx.shape
    img_l = rng.uniform(0, 255, (h, w)).astype(np.float32)
    img_r = rng.uniform(0, 255, (h, w)).astype(np.float32)
    out_l, out_r = rect(img_l, img_r)
    ref_l = cv2.remap(img_l, rect.maps.lx, rect.maps.ly, cv2.INTER_LINEAR)
    ref_r = cv2.remap(img_r, rect.maps.rx, rect.maps.ry, cv2.INTER_LINEAR)
    # identical bilinear formula; borders differ (cv2 BORDER_CONSTANT 0 vs
    # our in-bounds mask) only at the out-of-range edge — compare interior
    inb_l = ((rect.maps.lx >= 0) & (rect.maps.lx <= w - 1)
             & (rect.maps.ly >= 0) & (rect.maps.ly <= h - 1))
    diff = np.abs(out_l - ref_l)[inb_l]
    assert np.quantile(diff, 0.999) < 0.5
    diff_r = np.abs(out_r - ref_r)[
        (rect.maps.rx >= 0) & (rect.maps.rx <= w - 1)
        & (rect.maps.ry >= 0) & (rect.maps.ry <= h - 1)]
    assert np.quantile(diff_r, 0.999) < 0.5


def test_jit_remap_matches_host(rng):
    flat = _flat()
    rect = rectify.load_rectification(flat)
    h, w = rect.maps.lx.shape
    img_l = rng.uniform(0, 255, (h, w)).astype(np.float32)
    img_r = rng.uniform(0, 255, (h, w)).astype(np.float32)
    host_l, host_r = rect(img_l, img_r)
    dev_l, dev_r = rect.jit_remap_pair(img_l, img_r)
    np.testing.assert_allclose(np.asarray(dev_l), host_l, atol=1e-3)
    np.testing.assert_allclose(np.asarray(dev_r), host_r, atol=1e-3)


def test_rectified_pair_is_row_aligned(rng):
    """After rectification the two optical axes share fy/cy (P matrices) —
    a world point must land on the same image row in both views.  Build a
    tiny synthetic check: project points through the rectified models."""
    flat = _flat()
    Pl = np.asarray(flat["LEFT.P"], np.float64)
    Pr = np.asarray(flat["RIGHT.P"], np.float64)
    # EuRoC P matrices encode the rectified stereo rig: identical f, cy
    assert abs(Pl[1, 1] - Pr[1, 1]) < 1e-6
    assert abs(Pl[1, 2] - Pr[1, 2]) < 1e-6
    # baseline from P_r[0,3] = -fx * b
    b = -Pr[0, 3] / Pr[0, 0]
    assert b > 0.05       # EuRoC stereo baseline ≈ 11 cm
