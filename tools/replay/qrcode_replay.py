#!/usr/bin/env python
"""QR-code replay (Test/Replay/QRCode/qrCode.cc equivalent: detect/decode
QR codes over a list of images, save the landmark list)."""
import argparse
import sys

sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])
from orbslam2_tpu.tools import replay


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("images", nargs="+")
    ap.add_argument("--out", default="QRCodes.txt")
    a = ap.parse_args()
    tracker = replay.run_qrcode_replay(a.images, a.out)
    for m in getattr(tracker, "codes", []):
        print(m)


if __name__ == "__main__":
    main()
