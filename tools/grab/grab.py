#!/usr/bin/env python
"""Frame grabbers (Tools/Grab/* + Tools/GrabSequence/IRD equivalents).

The reference's grabbers capture calibration stills from a V4L camera
(grab_monocular.cc: resize to 640x480, save ``calib_<ms>.jpg``) and
record RealSense IR+depth sequences in the layout the IRD replay driver
consumes (GrabSequence/IRD: ``infrared/<ts>.png`` + ``depth/<ts>.png``).

Source abstraction: a cv2.VideoCapture device id, a video file path, or
any callable returning (frame, timestamp) — so recorded streams and the
RealSense adapter (utils/sensors.RealSenseDevice) plug in without
hardware, and tests can drive the writers synthetically.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from typing import Callable, Optional, Tuple

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))


def _cv2():
    try:
        import cv2
        return cv2
    except ImportError:
        return None


def open_source(src) -> Callable[[], Optional[Tuple[np.ndarray, float]]]:
    """Normalize a frame source to a nullary callable → (frame, t)|None."""
    if callable(src):
        return src
    cv2 = _cv2()
    if cv2 is None:
        raise RuntimeError("cv2 unavailable and source is not a callable")
    cap = cv2.VideoCapture(int(src) if str(src).isdigit() else src)
    if not cap.isOpened():
        raise RuntimeError(f"cannot open capture source {src!r}")

    def read():
        ok, frame = cap.read()
        if not ok:
            return None
        t = cap.get(cv2.CAP_PROP_POS_MSEC) / 1e3 or time.time()
        if frame.ndim == 3:
            frame = frame.mean(axis=-1)
        return frame.astype(np.float32), t

    return read


def grab_calibration_stills(src, out_dir: str, n_frames: int = 10,
                            every: int = 10,
                            size: Tuple[int, int] = (640, 480)) -> int:
    """grab_monocular.cc role: save every ``every``-th frame, resized to
    ``size``, as calib_<ms>.jpg.  Returns frames written."""
    cv2 = _cv2()
    os.makedirs(out_dir, exist_ok=True)
    read = open_source(src)
    written = i = 0
    while written < n_frames:
        out = read()
        if out is None:
            break
        frame, t = out
        i += 1
        if i % every:
            continue
        if frame.shape[:2][::-1] != size:
            if cv2 is not None:
                frame = cv2.resize(frame, size)
            else:       # nearest-neighbour fallback
                ys = (np.arange(size[1]) * frame.shape[0] // size[1])
                xs = (np.arange(size[0]) * frame.shape[1] // size[0])
                frame = frame[np.ix_(ys, xs)]
        name = os.path.join(out_dir, f"calib_{int(t * 1e3)}.jpg")
        if cv2 is not None:
            cv2.imwrite(name, np.clip(frame, 0, 255).astype(np.uint8))
        else:
            np.save(name + ".npy", frame)
        written += 1
    return written


def grab_ird_sequence(ir_src, depth_src, out_dir: str,
                      n_frames: int = 100) -> int:
    """GrabSequence/IRD role: record paired IR + depth frames in the
    layout iter_ird_realsense replays (infrared/<t>.png, depth/<t>.png —
    depth in millimetres, uint16)."""
    cv2 = _cv2()
    ir_dir = os.path.join(out_dir, "infrared")
    d_dir = os.path.join(out_dir, "depth")
    os.makedirs(ir_dir, exist_ok=True)
    os.makedirs(d_dir, exist_ok=True)
    read_ir = open_source(ir_src)
    read_d = open_source(depth_src)
    written = 0
    while written < n_frames:
        a = read_ir()
        b = read_d()
        if a is None or b is None:
            break
        ir, t = a
        depth, _ = b
        d16 = np.clip(depth * 1000.0, 0, 65535).astype(np.uint16)
        if cv2 is not None:
            cv2.imwrite(os.path.join(ir_dir, f"{t:.6f}.png"),
                        np.clip(ir, 0, 255).astype(np.uint8))
            cv2.imwrite(os.path.join(d_dir, f"{t:.6f}.png"), d16)
        else:
            np.save(os.path.join(ir_dir, f"{t:.6f}.npy"), ir)
            np.save(os.path.join(d_dir, f"{t:.6f}.npy"), d16)
        written += 1
    return written


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    g1 = sub.add_parser("calib", help="grab calibration stills")
    g1.add_argument("source", help="V4L device id or video path")
    g1.add_argument("--out", default="calib_frames")
    g1.add_argument("--n", type=int, default=10)
    g1.add_argument("--every", type=int, default=10)
    g2 = sub.add_parser("ird", help="record an IRD replay sequence")
    g2.add_argument("ir_source")
    g2.add_argument("depth_source")
    g2.add_argument("--out", default="ird_sequence")
    g2.add_argument("--n", type=int, default=100)
    a = ap.parse_args()
    if a.cmd == "calib":
        n = grab_calibration_stills(a.source, a.out, a.n, a.every)
    else:
        n = grab_ird_sequence(a.ir_source, a.depth_source, a.out, a.n)
    print(f"wrote {n} frames")


if __name__ == "__main__":
    main()
