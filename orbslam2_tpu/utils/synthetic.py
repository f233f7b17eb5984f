"""Synthetic scene generator for tests and benchmarks.

The reference's replay tests use TUM/EuRoC/KITTI datasets from disk
(SURVEY.md §4); this environment has no datasets, so we render our own:
a field of 3D "sprite" landmarks — each with a fixed, distinctive local
intensity patch — projected through the pinhole model onto frames along a
camera trajectory.  Sprites move rigidly with the world, so feature
extraction, stereo depth, tracking, BA and loop closing can all be
validated against exact ground truth.

Host-side numpy: this is a data source, not a kernel.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from orbslam2_tpu.config import CameraConfig


@dataclass
class Scene:
    points: np.ndarray        # [P, 3] world landmarks
    sprites: np.ndarray       # [P, S, S] intensity patches
    background: float


def make_scene(rng: np.random.Generator, n_points: int = 600,
               extent: Tuple[float, float, float] = (12.0, 8.0, 18.0),
               z_near: float = 4.0, sprite: int = 9) -> Scene:
    ex, ey, ez = extent
    pts = np.stack([
        rng.uniform(-ex, ex, n_points),
        rng.uniform(-ey, ey, n_points),
        rng.uniform(z_near, z_near + ez, n_points),
    ], axis=-1).astype(np.float64)
    # high-contrast random patches → strong FAST corners, distinct BRIEFs
    sprites = rng.uniform(0.0, 255.0, size=(n_points, sprite, sprite))
    sprites = np.round(sprites / 64.0) * 64.0   # quantize → sharp edges
    return Scene(points=pts, sprites=sprites.astype(np.float32),
                 background=96.0)


def look_ahead_pose(t: np.ndarray, yaw: float = 0.0, pitch: float = 0.0
                    ) -> np.ndarray:
    """World→camera SE3 for a camera at position t looking along +z."""
    cy, sy = np.cos(yaw), np.sin(yaw)
    cp, sp = np.cos(pitch), np.sin(pitch)
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rx = np.array([[1, 0, 0], [0, cp, -sp], [0, sp, cp]])
    Rwc = Ry @ Rx
    Tcw = np.eye(4)
    Tcw[:3, :3] = Rwc.T
    Tcw[:3, 3] = -Rwc.T @ t
    return Tcw


def render(scene: Scene, cam: CameraConfig, Tcw: np.ndarray,
           rng: Optional[np.random.Generator] = None,
           noise: float = 2.0) -> np.ndarray:
    """Render one grayscale frame [H, W] float32."""
    h, w = cam.height, cam.width
    img = np.full((h, w), scene.background, np.float32)
    pc = scene.points @ Tcw[:3, :3].T + Tcw[:3, 3]
    z = pc[:, 2]
    vis = z > 0.3
    u = cam.fx * pc[:, 0] / np.where(vis, z, 1.0) + cam.cx
    v = cam.fy * pc[:, 1] / np.where(vis, z, 1.0) + cam.cy
    s = scene.sprites.shape[1]
    r = s // 2
    order = np.argsort(-z)  # far to near: near sprites overdraw
    for i in order:
        if not vis[i]:
            continue
        # bilinear subpixel placement — integer pasting would quantize the
        # true disparity/flow to ±0.5 px and break subpixel accuracy tests
        xf, yf = u[i] - r, v[i] - r
        x0, y0 = int(np.floor(xf)), int(np.floor(yf))
        ax, ay = xf - x0, yf - y0
        if x0 < 0 or y0 < 0 or x0 + s + 1 > w or y0 + s + 1 > h:
            continue
        sp = scene.sprites[i]
        pad = np.zeros((s + 1, s + 1), np.float32)
        pad[:s, :s] += sp * (1 - ay) * (1 - ax)
        pad[:s, 1:] += sp * (1 - ay) * ax
        pad[1:, :s] += sp * ay * (1 - ax)
        pad[1:, 1:] += sp * ay * ax
        # composite over background only where the sprite has weight
        wgt = np.zeros((s + 1, s + 1), np.float32)
        wgt[:s, :s] += (1 - ay) * (1 - ax)
        wgt[:s, 1:] += (1 - ay) * ax
        wgt[1:, :s] += ay * (1 - ax)
        wgt[1:, 1:] += ay * ax
        region = img[y0:y0 + s + 1, x0:x0 + s + 1]
        img[y0:y0 + s + 1, x0:x0 + s + 1] = region * (1 - wgt) + pad
    if rng is not None and noise > 0:
        img = img + rng.normal(0.0, noise, img.shape).astype(np.float32)
    return np.clip(img, 0.0, 255.0)


def render_stereo(scene: Scene, cam: CameraConfig, Tcw: np.ndarray,
                  rng: Optional[np.random.Generator] = None,
                  noise: float = 2.0) -> Tuple[np.ndarray, np.ndarray]:
    """Left/right rectified pair; right camera offset by baseline along +x."""
    b = cam.baseline
    T_rl = np.eye(4)
    T_rl[0, 3] = -b          # right camera: x_r = x_l − b
    left = render(scene, cam, Tcw, rng, noise)
    right = render(scene, cam, T_rl @ Tcw, rng, noise)
    return left, right


def straight_trajectory(n: int, step: float = 0.25,
                        start: Tuple[float, float, float] = (0, 0, 0)
                        ) -> List[np.ndarray]:
    """Forward motion along +z (KITTI-like)."""
    return [look_ahead_pose(np.asarray(start, np.float64)
                            + np.array([0, 0, step * i])) for i in range(n)]


def orbit_trajectory(n: int, radius: float = 6.0, z_center: float = 12.0,
                     frac: float = 1.0) -> List[np.ndarray]:
    """Camera circling a point cloud, yawing to keep looking at it —
    closes a loop when frac == 1."""
    poses = []
    for i in range(n):
        a = 2.0 * np.pi * frac * i / n
        t = np.array([radius * np.sin(a), 0.0, z_center - radius * np.cos(a)])
        poses.append(look_ahead_pose(t, yaw=-a))
    return poses
