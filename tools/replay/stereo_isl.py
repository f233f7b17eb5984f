#!/usr/bin/env python
"""ISL stereo replay with replayer-sync (Test/Replay/Stereo/stereo_isl.cc
equivalent: System constructed with replayer=true, stereo_isl.cc:76)."""
import argparse
import sys

sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])
from orbslam2_tpu.tools import replay


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("left_dir")
    ap.add_argument("right_dir")
    ap.add_argument("times_file")
    ap.add_argument("settings", nargs="?", default=None)
    ap.add_argument("--out", default="CameraTrajectory.txt")
    ap.add_argument("--max-frames", type=int, default=None)
    a = ap.parse_args()
    rep = replay.run_isl_stereo(a.left_dir, a.right_dir, a.times_file,
                                a.settings, a.out, a.max_frames)
    rep.print_summary("TrackStereo")


if __name__ == "__main__":
    main()
