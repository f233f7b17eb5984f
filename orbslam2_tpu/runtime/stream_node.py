"""Live-stream node: callback-driven System feeding.

The reference's live entry points are ROS nodes subscribing to image
topics (Test/Replay/ROS/ORB_SLAM2/src/ros_mono.cc:46-77, ros_stereo.cc,
ros_rgbd.cc) and webcam/RealSense loops (Test/Live/*).  This module is the
transport-agnostic equivalent: a node object with `on_image` callbacks
that any source (ROS bridge, GStreamer, RealSenseDevice, a socket) can
drive, plus a pull-driven loop for device-style sources.  Frames can be
processed inline or through a bounded native queue with drop-oldest
backpressure (live sources must never block the producer).
"""

from __future__ import annotations

import threading
from typing import Callable, Optional, Tuple

import numpy as np

from orbslam2_tpu.config import MONOCULAR, RGBD, STEREO
from orbslam2_tpu.runtime.native import TokenQueue
from orbslam2_tpu.runtime.system import System


class StreamNode:
    """Subscribe-style wrapper: push frames in, poses come out via
    ``on_pose`` (the ROS node's publish step)."""

    def __init__(self, system: System,
                 on_pose: Optional[Callable] = None,
                 queue_capacity: int = 4):
        self.system = system
        self.on_pose = on_pose
        self._q = TokenQueue(queue_capacity)
        self._payloads = {}
        self._tok = 0
        self._lock = threading.Lock()
        self._worker: Optional[threading.Thread] = None
        self._running = False
        self.dropped = 0
        self.processed = 0

    # ----------------------------------------------------------- lifecycle
    def start(self):
        self._running = True
        self._worker = threading.Thread(target=self._loop, daemon=True,
                                        name="stream-node")
        self._worker.start()

    def stop(self, timeout: float = 60.0):
        self._running = False
        self._q.close()
        if self._worker is not None:
            self._worker.join(timeout=timeout)

    # ------------------------------------------------------------ callbacks
    def on_image_mono(self, image: np.ndarray, timestamp: float):
        self._enqueue(("mono", image, None, timestamp))

    def on_image_stereo(self, left: np.ndarray, right: np.ndarray,
                        timestamp: float):
        self._enqueue(("stereo", left, right, timestamp))

    def on_image_rgbd(self, image: np.ndarray, depth: np.ndarray,
                      timestamp: float):
        self._enqueue(("rgbd", image, depth, timestamp))

    def _enqueue(self, payload):
        with self._lock:
            tok = self._tok
            self._tok += 1
            self._payloads[tok] = payload
        if self._q.push_latest(tok):
            self.dropped += 1   # live backpressure: drop the oldest frame

    # ---------------------------------------------------------------- loop
    def _loop(self):
        while True:
            tok = self._q.pop(timeout_ms=200)
            if tok is None:
                if not self._running:
                    return
                continue
            with self._lock:
                payload = self._payloads.pop(tok, None)
                # purge payloads whose tokens were dropped from the queue
                stale = [t for t in self._payloads if t < tok]
                for t in stale:
                    self._payloads.pop(t, None)
            if payload is None:
                continue
            kind, a, b, t = payload
            if kind == "mono":
                out = self.system.track_monocular(a, t)
            elif kind == "stereo":
                out = self.system.track_stereo(a, b, t)
            else:
                out = self.system.track_rgbd(a, b, t)
            self.processed += 1
            if self.on_pose is not None:
                self.on_pose(out, t)


def run_device_loop(system: System, device, node: Optional[StreamNode] = None,
                    max_frames: Optional[int] = None) -> int:
    """Pull-driven loop for grab()-style sources (RealSenseDevice / webcams)
    — the Test/Live driver shape.  Returns frames processed."""
    n = 0
    while max_frames is None or n < max_frames:
        frame = device.grab()
        if frame is None:
            break
        img, depth, t = frame
        if node is not None:
            node.on_image_rgbd(img, depth, t)
        else:
            system.track_rgbd(img, depth, t)
        n += 1
    return n
