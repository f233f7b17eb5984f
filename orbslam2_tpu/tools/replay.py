"""Replay drivers: dataset → System → trajectory, with per-frame timing.

The library-side engine behind the CLI entry points in ``tools/replay/``.
Mirrors the reference's Test/Replay drivers (mono_tum.cc, stereo_kitti.cc,
stereo_euroc.cc, rgbd_tum.cc — SURVEY.md §2.3): load a sequence, feed
frames (optionally paced to timestamps), log per-frame latency the way
Tools/Benchmarks/Replay/*/benchmark.cc does ("`... duration: N ms`",
median/mean at exit), save the trajectory for offline ATE evaluation.
"""

from __future__ import annotations

import sys
import time
from dataclasses import dataclass, field
from typing import Callable, Iterable, List, Optional

import numpy as np

from orbslam2_tpu.config import MONOCULAR, RGBD, STEREO
from orbslam2_tpu.runtime.native import StageTimer
from orbslam2_tpu.runtime.system import System


@dataclass
class ReplayReport:
    n_frames: int = 0
    n_tracked: int = 0
    durations_ms: List[float] = field(default_factory=list)

    @property
    def median_ms(self) -> float:
        return float(np.median(self.durations_ms)) if self.durations_ms else 0.0

    @property
    def mean_ms(self) -> float:
        return float(np.mean(self.durations_ms)) if self.durations_ms else 0.0

    def print_summary(self, label: str = "Track"):
        # benchmark.cc:110-115 prints sorted median + mean tracking time
        print(f"median {label} time: {self.median_ms:.2f} ms")
        print(f"mean {label} time: {self.mean_ms:.2f} ms")
        print(f"tracked {self.n_tracked}/{self.n_frames} frames")


def replay(system: System, frames: Iterable, kind: str,
           pace: bool = False, warmup: int = 2,
           log_every: int = 0) -> ReplayReport:
    """Feed a frame iterator into a System.

    kind: "stereo" → (left, right, t); "rgbd"/"ird" → (img, depth, t);
    "mono" → (img, t).
    """
    rep = ReplayReport()
    timer = StageTimer()
    t_prev = None
    for i, frame in enumerate(frames):
        t = frame[-1]
        if pace and t_prev is not None:
            dt = t - t_prev
            if 0 < dt < 2.0:
                time.sleep(dt)
        t_prev = t

        timer.start()
        if kind == "stereo":
            out = system.track_stereo(frame[0], frame[1], t)
        elif kind in ("rgbd", "ird"):
            out = system.track_rgbd(frame[0], frame[1], t)
        else:
            out = system.track_monocular(frame[0], t)
        ms = timer.stop()
        rep.n_frames += 1
        rep.n_tracked += out is not None
        if i >= warmup:  # skip jit-compile frames in the latency stats
            rep.durations_ms.append(ms)
        if log_every and i % log_every == 0:
            # per-frame line, benchmark.cc:88 style
            print(f"SLAM.Track duration: {ms:.1f} ms", file=sys.stderr)
    return rep


def run_kitti_stereo(seq_dir: str, settings: Optional[str],
                     traj_out: Optional[str] = None,
                     max_frames: Optional[int] = None,
                     pace: bool = False) -> ReplayReport:
    from orbslam2_tpu.utils.datasets import iter_kitti_stereo
    sys_ = System(None, settings, sensor=STEREO)
    frames = iter_kitti_stereo(seq_dir)
    if max_frames:
        frames = _take(frames, max_frames)
    rep = replay(sys_, frames, "stereo", pace=pace)
    if traj_out:
        sys_.save_trajectory_kitti(traj_out)
    sys_.shutdown()
    return rep


def run_tum_rgbd(seq_dir: str, settings: Optional[str],
                 traj_out: Optional[str] = None,
                 max_frames: Optional[int] = None,
                 pace: bool = False) -> ReplayReport:
    from orbslam2_tpu.utils.datasets import iter_tum_rgbd
    sys_ = System(None, settings, sensor=RGBD)
    frames = iter_tum_rgbd(seq_dir)
    if max_frames:
        frames = _take(frames, max_frames)
    rep = replay(sys_, frames, "rgbd", pace=pace)
    if traj_out:
        sys_.save_trajectory_tum(traj_out)
    sys_.shutdown()
    return rep


def run_tum_mono(seq_dir: str, settings: Optional[str],
                 traj_out: Optional[str] = None,
                 max_frames: Optional[int] = None,
                 pace: bool = False) -> ReplayReport:
    from orbslam2_tpu.utils.datasets import iter_tum_rgbd
    sys_ = System(None, settings, sensor=MONOCULAR)
    frames = ((rgb, t) for rgb, _d, t in iter_tum_rgbd(seq_dir))
    if max_frames:
        frames = _take(frames, max_frames)
    rep = replay(sys_, frames, "mono", pace=pace)
    if traj_out:
        sys_.save_trajectory_tum(traj_out)
    sys_.shutdown()
    return rep


def run_euroc_stereo(mav_dir: str, settings: Optional[str],
                     timestamp_file: Optional[str] = None,
                     traj_out: Optional[str] = None,
                     max_frames: Optional[int] = None,
                     pace: bool = False) -> ReplayReport:
    from orbslam2_tpu.ops.rectify import load_rectification
    from orbslam2_tpu.utils.datasets import iter_euroc_stereo
    sys_ = System(None, settings, sensor=STEREO)
    frames = iter_euroc_stereo(mav_dir, timestamp_file)
    if max_frames:
        frames = _take(frames, max_frames)
    # stereo rectification from the LEFT./RIGHT. blocks — the reference
    # driver remaps every frame (stereo_euroc.cc:72-100,165); without it
    # EuRoC's unrectified fisheye pairs cannot run row-banded stereo
    rect = load_rectification(settings) if settings else None
    if rect is not None:
        def _rectified(it):
            for l, r, t in it:
                rl, rr = rect(l, r)
                yield rl, rr, t
        frames = _rectified(frames)
    rep = replay(sys_, frames, "stereo", pace=pace)
    if traj_out:
        sys_.save_trajectory_tum(traj_out)
    sys_.shutdown()
    return rep


def run_synthetic_stereo(n_frames: int = 40, seed: int = 0,
                         traj_out: Optional[str] = None) -> ReplayReport:
    """Synthetic replay — the in-repo stand-in for the dataset drivers."""
    from orbslam2_tpu.config import (CameraConfig, CapacityConfig, OrbConfig,
                                     SlamConfig)
    from orbslam2_tpu.utils import synthetic

    rng = np.random.default_rng(seed)
    cfg = SlamConfig(
        camera=CameraConfig(fx=450.0, fy=450.0, cx=320.0, cy=240.0,
                            bf=150.0, width=640, height=480, fps=10.0,
                            th_depth=60.0),
        orb=OrbConfig(n_features=1000),
        capacity=CapacityConfig(),
        sensor=STEREO)
    scene = synthetic.make_scene(rng, 900, extent=(14.0, 9.0, 40.0),
                                 z_near=3.0)
    poses = synthetic.straight_trajectory(n_frames, step=0.25)
    sys_ = System(None, None, sensor=STEREO, config=cfg)

    def frames():
        for i, T in enumerate(poses):
            l, r = synthetic.render_stereo(scene, cfg.camera, T, rng, 1.0)
            yield l, r, 0.1 * i

    rep = replay(sys_, frames(), "stereo")
    if traj_out:
        sys_.save_trajectory_tum(traj_out)
    sys_.shutdown()
    return rep


def _take(it, n):
    for i, x in enumerate(it):
        if i >= n:
            return
        yield x


def run_kitti_mono(seq_dir: str, settings: Optional[str],
                   traj_out: Optional[str] = None,
                   max_frames: Optional[int] = None,
                   pace: bool = False) -> ReplayReport:
    """mono_kitti.cc: KITTI image_0 as a monocular sequence."""
    from orbslam2_tpu.utils.datasets import iter_kitti_stereo
    sys_ = System(None, settings, sensor=MONOCULAR)
    frames = ((l, t) for l, _r, t in iter_kitti_stereo(seq_dir))
    if max_frames:
        frames = _take(frames, max_frames)
    rep = replay(sys_, frames, "mono", pace=pace)
    if traj_out:
        sys_.save_keyframe_trajectory_tum(traj_out)   # mono_kitti.cc:138
    sys_.shutdown()
    return rep


def run_euroc_mono(mav_dir: str, settings: Optional[str],
                   timestamp_file: Optional[str] = None,
                   traj_out: Optional[str] = None,
                   max_frames: Optional[int] = None,
                   pace: bool = False) -> ReplayReport:
    """mono_euroc.cc: EuRoC cam0 as a monocular sequence."""
    from orbslam2_tpu.utils.datasets import iter_euroc_stereo
    sys_ = System(None, settings, sensor=MONOCULAR)
    frames = ((l, t) for l, _r, t in iter_euroc_stereo(mav_dir,
                                                       timestamp_file))
    if max_frames:
        frames = _take(frames, max_frames)
    rep = replay(sys_, frames, "mono", pace=pace)
    if traj_out:
        sys_.save_keyframe_trajectory_tum(traj_out)   # mono_euroc.cc:119
    sys_.shutdown()
    return rep


def run_isl_stereo(left_dir: str, right_dir: str, times_file: str,
                   settings: Optional[str],
                   traj_out: Optional[str] = None,
                   max_frames: Optional[int] = None) -> ReplayReport:
    """stereo_isl.cc: custom ISL stereo layout with replayer=true — the
    frame clock waits out a running GBA instead of racing it
    (System.cc:169-183; ctor at stereo_isl.cc:76)."""
    from orbslam2_tpu.utils.datasets import iter_isl_stereo
    sys_ = System(None, settings, sensor=STEREO, replayer=True)
    frames = iter_isl_stereo(left_dir, right_dir, times_file)
    if max_frames:
        frames = _take(frames, max_frames)
    rep = replay(sys_, frames, "stereo")
    if traj_out:
        sys_.save_trajectory_tum(traj_out)
    sys_.shutdown()
    return rep


def run_ird_realsense(sequence_dir: str, settings: Optional[str],
                      traj_out: Optional[str] = None,
                      max_frames: Optional[int] = None,
                      depth_extension: str = "png",
                      save_map: bool = True) -> ReplayReport:
    """Test/Replay/IRD/realsense.cc: recorded RealSense IR+depth sequence
    through the RGBD entry, with map save enabled (realsense.cc:94)."""
    from orbslam2_tpu.utils.datasets import iter_ird_realsense
    sys_ = System(None, settings, sensor=RGBD, save_map=save_map)
    cfg = sys_.cfg
    frames = iter_ird_realsense(sequence_dir, depth_extension,
                                cfg.camera.depth_map_factor or 1000.0)
    if max_frames:
        frames = _take(frames, max_frames)
    rep = replay(sys_, frames, "ird")
    if traj_out:
        sys_.save_trajectory_tum(traj_out)
    sys_.shutdown()
    return rep


def run_qrcode_replay(image_paths, out_file: str = "QRCodes.txt"):
    """Test/Replay/QRCode/qrCode.cc: detect/decode QR codes per frame,
    accumulate the landmark list, save QRCodes.txt."""
    from orbslam2_tpu.utils.markers import QrCodeTracker

    tracker = QrCodeTracker()
    if not tracker.available:
        print("cv2 QRCodeDetector unavailable; no-op", file=sys.stderr)
        return tracker
    from orbslam2_tpu.utils.datasets import _imread_gray
    for p in image_paths:
        img = _imread_gray(p) if isinstance(p, str) else p
        tracker.track(img, None)
    tracker.save(out_file)
    return tracker
