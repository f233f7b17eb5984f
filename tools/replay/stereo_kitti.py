#!/usr/bin/env python
"""KITTI stereo replay (Test/Replay/Stereo/stereo_kitti.cc equivalent).

Usage: python tools/replay/stereo_kitti.py <sequence_dir> <settings.yaml>
           [--out traj.txt] [--max-frames N] [--pace]
"""
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
    ap.add_argument("--pace", action="store_true")
    a = ap.parse_args()
    rep = replay.run_kitti_stereo(a.sequence_dir, a.settings, a.out,
                                  a.max_frames, a.pace)
    rep.print_summary("TrackStereo")


if __name__ == "__main__":
    main()
