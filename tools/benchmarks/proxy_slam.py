"""cv2-only mini-SLAM: the independent end-to-end trajectory oracle.

VERDICT r4 "what's missing" #1: every e2e number in the repo was the
synthetic renderer grading a consumer of itself — a projection-convention
bias shared by renderer and tracker would pass everything.  This module
is the cross-check: a stereo visual odometry + mapping loop built ONLY
from OpenCV's native C++ kernels (the same stack the reference links),
with no code shared with the JAX engine beyond the rendered input frames:

  * ORB extraction        → cv2.ORB_create            (ORBextractor.cc)
  * stereo depth          → BFMatcher L→R + disparity (Frame.cc:464)
  * tracking              → BFMatcher map→frame + cv2.solvePnPRansac
                            + iterative refine        (Tracking.cc:967,
                            Optimizer::PoseOptimization)
  * keyframe mapping      → triangulate stereo matches, transform to
                            world, append to the map bank
                            (LocalMapping::CreateNewMapPoints)

If the repo engine and this loop agree with ground truth independently,
the renderer's conventions are validated from two unrelated directions
(reference acceptance oracle pattern: System.cc:448-683 trajectory files
+ Tools/Benchmarks/Replay/*/benchmark.cc).

Used by tests/test_oracle_proxy.py and the bench oracle leg.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np


def run_proxy_slam(frames: List[Tuple[np.ndarray, np.ndarray]],
                   cam, n_features: int = 1000,
                   kf_every: int = 6, min_inliers: int = 120,
                   max_bank: int = 6000,
                   max_jump_m: float = 2.0) -> List[Optional[np.ndarray]]:
    """Stereo frames [(left_u8, right_u8), ...] → per-frame Tcw (4×4) or
    None where tracking failed.  First frame defines the world origin."""
    import cv2

    orb = cv2.ORB_create(nfeatures=n_features, scaleFactor=1.2, nlevels=8,
                         fastThreshold=20)
    bf = cv2.BFMatcher(cv2.NORM_HAMMING, crossCheck=True)
    K = np.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1]],
                 np.float64)

    def stereo_points(left, right, Twc):
        """Triangulate L↔R ORB matches; return world points + descs."""
        kpl, desl = orb.detectAndCompute(left, None)
        kpr, desr = orb.detectAndCompute(right, None)
        if desl is None or desr is None:
            return np.zeros((0, 3)), np.zeros((0, 32), np.uint8)
        pts, descs = [], []
        for m in bf.match(desl, desr):
            ul, vl = kpl[m.queryIdx].pt
            ur, vr = kpr[m.trainIdx].pt
            d = ul - ur
            if d <= 0.5 or abs(vl - vr) > 2.0:      # row-banded (Frame.cc)
                continue
            z = cam.bf / d
            if z <= 0.1 or z > 80.0:
                continue
            pc = np.array([(ul - cam.cx) * z / cam.fx,
                           (vl - cam.cy) * z / cam.fy, z, 1.0])
            pts.append((Twc @ pc)[:3])
            descs.append(desl[m.queryIdx])
        if not pts:
            return np.zeros((0, 3)), np.zeros((0, 32), np.uint8)
        return np.array(pts, np.float64), np.array(descs, np.uint8)

    # ---- bootstrap: frame 0 is the origin ----
    Tcw = np.eye(4)
    bank_pts, bank_desc = stereo_points(frames[0][0], frames[0][1],
                                        np.linalg.inv(Tcw))
    poses: List[Optional[np.ndarray]] = [Tcw.copy()]
    rvec_prev, tvec_prev = _rt_from_T(Tcw)

    for i, (left, right) in enumerate(frames[1:], start=1):
        kpl, desl = orb.detectAndCompute(left, None)
        ok = False
        if desl is not None and len(bank_pts) >= 8:
            matches = bf.match(bank_desc, desl)
            if len(matches) >= 8:
                obj = bank_pts[[m.queryIdx for m in matches]]
                img = np.array([kpl[m.trainIdx].pt for m in matches],
                               np.float64)
                okf, rvec, tvec, inl = cv2.solvePnPRansac(
                    obj, img, K, None, rvec=rvec_prev.copy(),
                    tvec=tvec_prev.copy(), useExtrinsicGuess=True,
                    iterationsCount=100, reprojectionError=4.0,
                    flags=cv2.SOLVEPNP_EPNP)
                if okf and inl is not None and len(inl) >= 8:
                    inl = inl.ravel()
                    cv2.solvePnP(obj[inl], img[inl], K, None, rvec, tvec,
                                 useExtrinsicGuess=True,
                                 flags=cv2.SOLVEPNP_ITERATIVE)
                    T_new = _T_from_rt(rvec, tvec)
                    # motion gate: a camera cannot teleport between
                    # frames — reject implausible solves instead of
                    # poisoning the bank (the reference goes LOST on
                    # inlier collapse, Tracking.h:82-88)
                    C_new = -T_new[:3, :3].T @ T_new[:3, 3]
                    C_old = -Tcw[:3, :3].T @ Tcw[:3, 3]
                    if np.linalg.norm(C_new - C_old) <= max_jump_m:
                        Tcw = T_new
                        rvec_prev, tvec_prev = rvec.copy(), tvec.copy()
                        ok = True
                        n_inl = len(inl)
        if not ok:
            poses.append(None)
            continue
        poses.append(Tcw.copy())
        if i % kf_every == 0 or n_inl < min_inliers:
            pts, descs = stereo_points(left, right, np.linalg.inv(Tcw))
            if len(pts):
                bank_pts = np.concatenate([bank_pts, pts])[-max_bank:]
                bank_desc = np.concatenate([bank_desc, descs])[-max_bank:]
    return poses


def _rt_from_T(T):
    import cv2
    rvec, _ = cv2.Rodrigues(T[:3, :3].astype(np.float64))
    return rvec, T[:3, 3].reshape(3, 1).astype(np.float64)


def _T_from_rt(rvec, tvec):
    import cv2
    R, _ = cv2.Rodrigues(rvec)
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = tvec.ravel()
    return T
