#!/usr/bin/env python
"""RealSense IRD replay (Test/Replay/IRD/realsense.cc equivalent: recorded
infrared + depth sequence through the RGBD entry, map save enabled)."""
import argparse
import sys

sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])
from orbslam2_tpu.tools import replay


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sequence_dir")
    ap.add_argument("settings", nargs="?", default=None)
    ap.add_argument("--out", default="CameraTrajectory.txt")
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--depth-ext", default="png")
    ap.add_argument("--no-save-map", action="store_true")
    a = ap.parse_args()
    rep = replay.run_ird_realsense(a.sequence_dir, a.settings, a.out,
                                   a.max_frames, a.depth_ext,
                                   save_map=not a.no_save_map)
    rep.print_summary("TrackRGBD")


if __name__ == "__main__":
    main()
