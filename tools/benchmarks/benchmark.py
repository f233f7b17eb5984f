#!/usr/bin/env python
"""Benchmark harness (Tools/Benchmarks/Replay/*/benchmark.cc equivalent).

Runs a sequence (real dataset if a path is given, synthetic otherwise) in
SLAM and/or LOC modes, logs per-frame latency, prints median/mean and the
host info dump the reference prints (/proc/cpuinfo, benchmark.cc:123-135 —
here the JAX device list).
"""
import argparse
import json
import sys

sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kind", choices=["synthetic", "kitti", "tum", "euroc"],
                    default="synthetic")
    ap.add_argument("--path", default=None)
    ap.add_argument("--settings", default=None)
    ap.add_argument("--frames", type=int, default=40)
    a = ap.parse_args()

    import jax
    from orbslam2_tpu.tools import replay
    print(f"devices: {jax.devices()}")

    if a.kind == "synthetic":
        rep = replay.run_synthetic_stereo(a.frames)
    elif a.kind == "kitti":
        rep = replay.run_kitti_stereo(a.path, a.settings,
                                      max_frames=a.frames)
    elif a.kind == "tum":
        rep = replay.run_tum_rgbd(a.path, a.settings, max_frames=a.frames)
    else:
        rep = replay.run_euroc_stereo(a.path, a.settings,
                                      max_frames=a.frames)
    rep.print_summary()
    print(json.dumps({"median_ms": rep.median_ms, "mean_ms": rep.mean_ms,
                      "fps": 1000.0 / max(rep.median_ms, 1e-9),
                      "tracked": rep.n_tracked, "frames": rep.n_frames}))


if __name__ == "__main__":
    main()
