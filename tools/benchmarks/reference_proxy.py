"""Measured CPU proxy of the reference's per-frame stereo tracking loop.

BASELINE.md's action item: the reference (fabrizioromanelli/ORBSLAM2)
publishes no numbers, so its frames/s must be *measured*.  The full C++
build needs Pangolin + Eigen (not present in this image), but its per-frame
hot path — 2× ORB extraction, stereo descriptor matching, ~3 pose
optimizations over a few hundred 3D-2D matches (SURVEY.md §3.2 "hot" marks)
— is exactly what OpenCV's native C++ kernels expose through cv2:

  * ORB extraction        → cv2.ORB_create(...).detectAndCompute
                            (the reference's ORBextractor *is* a modified
                            copy of OpenCV's ORB, src/ORBextractor.cc:1-48)
  * stereo matching       → cv2.BFMatcher(HAMMING).match L→R
  * projection matching   → BFMatcher against the local-map descriptor set
  * pose optimization ×3  → cv2.solvePnPRansac + solvePnP(ITERATIVE) refine
                            (g2o's 4×10 LM on a 6-dof pose is comparable
                            work to the iterative PnP refinement here)

This *underestimates* the reference's per-frame cost (no keyframe
insertion, no local BA amortization, no covisibility bookkeeping), which
makes the resulting fps an upper bound on the reference — conservative for
our "2×" claim.

Writes tools/benchmarks/reference_proxy.json and prints one JSON line.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    import cv2

    from orbslam2_tpu.config import CameraConfig
    from orbslam2_tpu.utils import synthetic

    cam = CameraConfig(fx=450.0, fy=450.0, cx=320.0, cy=240.0, bf=150.0,
                       width=640, height=480, fps=30.0, th_depth=60.0)
    rng = np.random.default_rng(0)
    scene = synthetic.make_scene(rng, 900, extent=(14.0, 9.0, 40.0),
                                 z_near=3.0)
    poses = synthetic.straight_trajectory(24, step=0.25)
    frames = [synthetic.render_stereo(scene, cam, T, rng, noise=1.0)
              for T in poses]
    frames = [(l.astype(np.uint8), r.astype(np.uint8)) for l, r in frames]

    # reference extractor settings (Config/*.yaml: nFeatures=1000-1200,
    # scaleFactor=1.2, nLevels=8)
    orb = cv2.ORB_create(nfeatures=1000, scaleFactor=1.2, nlevels=8,
                         fastThreshold=20)
    bf = cv2.BFMatcher(cv2.NORM_HAMMING, crossCheck=False)
    K = np.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1]],
                 np.float64)

    # build a static "local map" descriptor bank + 3D points from frame 0
    kp0, des0 = orb.detectAndCompute(frames[0][0], None)
    kpr, desr = orb.detectAndCompute(frames[0][1], None)
    m0 = bf.match(des0, desr)
    pts3d, desc_map = [], []
    for m in m0:
        ul = kp0[m.queryIdx].pt[0]
        ur = kpr[m.trainIdx].pt[0]
        d = ul - ur
        if d <= 0.5:
            continue
        z = cam.bf / d
        if z <= 0 or z > 80:
            continue
        u, v = kp0[m.queryIdx].pt
        pts3d.append([(u - cam.cx) * z / cam.fx, (v - cam.cy) * z / cam.fy, z])
        desc_map.append(des0[m.queryIdx])
    pts3d = np.array(pts3d, np.float64)
    desc_map = np.array(desc_map, np.uint8)

    stage = {"extract": 0.0, "stereo": 0.0, "match": 0.0, "pose": 0.0}
    n_frames = 0
    t_total0 = time.perf_counter()
    for l, r in frames[1:]:
        t0 = time.perf_counter()
        kpl, desl = orb.detectAndCompute(l, None)
        kprr, desrr = orb.detectAndCompute(r, None)
        t1 = time.perf_counter()
        _ = bf.match(desl, desrr)                      # stereo association
        t2 = time.perf_counter()
        # motion-model + local-map projection matching proxy: two matcher
        # passes against the map bank (Tracking runs SearchByProjection
        # twice per frame, Tracking.cc:967,1030)
        mm = bf.match(desc_map, desl)
        mm2 = bf.match(desc_map, desl)
        t3 = time.perf_counter()
        obj = pts3d[[m.queryIdx for m in mm]]
        img = np.array([kpl[m.trainIdx].pt for m in mm], np.float64)
        if len(obj) >= 8:
            okf, rvec, tvec, inl = cv2.solvePnPRansac(
                obj, img, K, None, iterationsCount=50,
                reprojectionError=5.99, flags=cv2.SOLVEPNP_EPNP)
            # reference runs PoseOptimization up to 3× per frame
            for _ in range(3):
                cv2.solvePnP(obj, img, K, None, rvec, tvec,
                             useExtrinsicGuess=True,
                             flags=cv2.SOLVEPNP_ITERATIVE)
        t4 = time.perf_counter()
        stage["extract"] += t1 - t0
        stage["stereo"] += t2 - t1
        stage["match"] += t3 - t2
        stage["pose"] += t4 - t3
        n_frames += 1
    dt = time.perf_counter() - t_total0
    fps = n_frames / dt
    per_frame_ms = {k: round(v / n_frames * 1000, 2) for k, v in stage.items()}

    import platform
    result = {
        "metric": "reference_proxy_stereo_tracking_fps",
        "value": round(fps, 2),
        "unit": "frames/s",
        "host": platform.processor() or "unknown",
        "nproc": os.cpu_count(),
        "per_frame_ms": per_frame_ms,
        "note": ("cv2-native proxy of the reference tracking loop "
                 "(extract+stereo+2x map match+PnP/refine); omits KF/BA "
                 "work so it over-estimates reference fps"),
    }
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "reference_proxy.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
