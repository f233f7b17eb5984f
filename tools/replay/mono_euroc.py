#!/usr/bin/env python
"""EuRoC monocular replay (Test/Replay/Monocular/mono_euroc.cc equivalent)."""
import argparse
import sys

sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])
from orbslam2_tpu.tools import replay


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mav_dir")
    ap.add_argument("settings", nargs="?", default=None)
    ap.add_argument("--timestamps", default=None)
    ap.add_argument("--out", default="KeyFrameTrajectory.txt")
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--pace", action="store_true")
    a = ap.parse_args()
    rep = replay.run_euroc_mono(a.mav_dir, a.settings, a.timestamps,
                                a.out, a.max_frames, a.pace)
    rep.print_summary("TrackMonocular")


if __name__ == "__main__":
    main()
