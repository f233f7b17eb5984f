"""StreamNode: callback feeding, drop-oldest backpressure."""

import time

import numpy as np
import pytest

from orbslam2_tpu.runtime.stream_node import StreamNode


class FakeSystem:
    def __init__(self, delay=0.0):
        self.frames = []
        self.delay = delay

    def track_monocular(self, img, t):
        if self.delay:
            time.sleep(self.delay)
        self.frames.append(t)
        return np.eye(4)

    track_stereo = None
    track_rgbd = None


def test_stream_node_processes_all_when_fast():
    sysm = FakeSystem()
    poses = []
    node = StreamNode(sysm, on_pose=lambda p, t: poses.append(t))
    node.start()
    for i in range(10):
        node.on_image_mono(np.zeros((4, 4)), float(i))
        time.sleep(0.01)
    time.sleep(0.3)
    node.stop()
    assert node.processed == 10
    assert poses == [float(i) for i in range(10)]
    assert node.dropped == 0


def test_stream_node_drops_under_backpressure():
    sysm = FakeSystem(delay=0.05)
    node = StreamNode(sysm, queue_capacity=2)
    node.start()
    for i in range(30):
        node.on_image_mono(np.zeros((4, 4)), float(i))
    time.sleep(1.2)
    node.stop()
    # slow consumer: most frames dropped, newest ones processed
    assert node.dropped > 0
    assert node.processed < 30
    assert sysm.frames[-1] == 29.0  # the latest frame survived
