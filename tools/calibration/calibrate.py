#!/usr/bin/env python
"""Chessboard camera calibration (Tools/Calibration/{Monocular,Stereo}
equivalent): estimate K + rad-tan distortion from chessboard images and
emit the reference's YAML key format (Camera.fx … Camera.k3).

Usage: python tools/calibration/calibrate.py "imgs/*.png" --cols 9 --rows 6
           [--square 0.025] [--out calib.yaml]
Requires OpenCV (host tool, like the reference's).
"""
import argparse
import glob
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("pattern", help="glob of chessboard images")
    ap.add_argument("--cols", type=int, default=9)
    ap.add_argument("--rows", type=int, default=6)
    ap.add_argument("--square", type=float, default=0.025)
    ap.add_argument("--out", default="calib.yaml")
    a = ap.parse_args()

    import cv2
    objp = np.zeros((a.rows * a.cols, 3), np.float32)
    objp[:, :2] = np.mgrid[0:a.cols, 0:a.rows].T.reshape(-1, 2) * a.square
    objpoints, imgpoints = [], []
    shape = None
    for path in sorted(glob.glob(a.pattern)):
        img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
        if img is None:
            continue
        shape = img.shape[::-1]
        ok, corners = cv2.findChessboardCorners(img, (a.cols, a.rows))
        if not ok:
            print(f"no chessboard: {path}")
            continue
        corners = cv2.cornerSubPix(
            img, corners, (11, 11), (-1, -1),
            (cv2.TERM_CRITERIA_EPS + cv2.TERM_CRITERIA_MAX_ITER, 30, 1e-3))
        objpoints.append(objp)
        imgpoints.append(corners)
    if len(objpoints) < 3:
        sys.exit("need at least 3 usable chessboard views")
    rms, K, D, _, _ = cv2.calibrateCamera(objpoints, imgpoints, shape,
                                          None, None)
    print(f"RMS reprojection error: {rms:.4f} px over {len(objpoints)} views")
    d = D.reshape(-1)
    with open(a.out, "w") as f:
        f.write("%YAML:1.0\n\n# calibrated by tools/calibration/calibrate.py\n")
        f.write(f"Camera.fx: {K[0, 0]:.9f}\nCamera.fy: {K[1, 1]:.9f}\n")
        f.write(f"Camera.cx: {K[0, 2]:.9f}\nCamera.cy: {K[1, 2]:.9f}\n\n")
        f.write(f"Camera.k1: {d[0]:.9f}\nCamera.k2: {d[1]:.9f}\n")
        f.write(f"Camera.p1: {d[2]:.9f}\nCamera.p2: {d[3]:.9f}\n")
        f.write(f"Camera.k3: {d[4] if len(d) > 4 else 0.0:.9f}\n\n")
        f.write(f"Camera.width: {shape[0]}\nCamera.height: {shape[1]}\n")
    print(f"wrote {a.out}")


if __name__ == "__main__":
    main()
