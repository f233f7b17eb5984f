"""AR demo: the ViewerAR / ros_mono_ar capability
(/root/reference/Test/Replay/ROS/ORB_SLAM2/src/AR/ViewerAR.cc) without
Pangolin — plane detection over the live map + virtual cubes rendered
into the camera frames.

ViewerAR.cc semantics kept:
  * DetectPlane (:392-488): RANSAC 3-point plane fits over map points
    with >5 observations (≥50 required), scored by the MEDIAN point-to-
    plane distance; the plane frame Tpw puts the origin at the inlier
    centroid with y aligned to the normal.
  * "Insert Cube" drops a cube of ``size`` on the latest detected plane;
    several cubes on different planes accumulate (:159-180).

The RANSAC is one jitted batch over all hypotheses (the reference's
50-iteration loop, batched); rendering is host-side numpy (a viewer,
not a kernel)."""

from __future__ import annotations

from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from orbslam2_tpu.config import CameraConfig


class PlaneFit(NamedTuple):
    ok: jax.Array        # bool — enough points / found a plane
    n: jax.Array         # [3] unit normal
    d: jax.Array         # plane offset: n·x + d = 0
    origin: jax.Array    # [3] inlier centroid


@jax.jit
def detect_plane(points: jax.Array, valid: jax.Array, n_obs: jax.Array,
                 key: jax.Array, n_hypotheses: int = 64) -> PlaneFit:
    """Batched DetectPlane (ViewerAR.cc:392): points [P,3]; candidates
    need >5 observations and ≥50 must exist."""
    P = points.shape[0]
    cand = valid & (n_obs > 5)
    n_cand = jnp.sum(cand.astype(jnp.int32))
    p = cand.astype(jnp.float32)
    p = p / jnp.clip(jnp.sum(p), 1.0, None)
    idx = jax.random.choice(key, P, shape=(n_hypotheses, 3), replace=True,
                            p=p)
    tri = points[idx]                                    # [H, 3, 3]
    nrm = jnp.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    nn = jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    nrm = nrm / jnp.clip(nn, 1e-9, None)
    d = -jnp.sum(nrm * tri[:, 0], axis=-1)               # [H]
    dist = jnp.abs(points @ nrm.T + d[None, :])          # [P, H]
    dist = jnp.where(cand[:, None], dist, jnp.nan)
    med = jnp.nanmedian(dist, axis=0)                    # [H]
    med = jnp.where(nn[:, 0] > 1e-6, med, jnp.inf)
    best = jnp.argmin(med)
    n_best = nrm[best]
    d_best = d[best]
    inl = cand & (jnp.abs(points @ n_best + d_best) < 4.0 * med[best])
    w = inl.astype(points.dtype)[:, None]
    origin = jnp.sum(points * w, axis=0) / jnp.clip(jnp.sum(w), 1.0, None)
    return PlaneFit(ok=(n_cand >= 50) & jnp.isfinite(med[best]),
                    n=n_best, d=d_best, origin=origin)


def plane_frame(fit: PlaneFit, up_hint: np.ndarray = None) -> np.ndarray:
    """Twp [4,4]: plane frame with origin at the inlier centroid and the
    y axis along the normal (ViewerAR Plane ctor semantics)."""
    n = np.asarray(fit.n, np.float64)
    if up_hint is not None and float(n @ np.asarray(up_hint)) < 0:
        n = -n
    a = np.array([1.0, 0.0, 0.0])
    if abs(n @ a) > 0.9:
        a = np.array([0.0, 0.0, 1.0])
    x = np.cross(n, a)
    x /= np.linalg.norm(x)
    z = np.cross(x, n)
    Twp = np.eye(4)
    Twp[:3, 0] = x
    Twp[:3, 1] = n
    Twp[:3, 2] = z
    Twp[:3, 3] = np.asarray(fit.origin, np.float64)
    return Twp


_CUBE_EDGES = [(0, 1), (1, 3), (3, 2), (2, 0), (4, 5), (5, 7), (7, 6),
               (6, 4), (0, 4), (1, 5), (2, 6), (3, 7)]


def draw_cube(img: np.ndarray, cam: CameraConfig, Tcw: np.ndarray,
              Twp: np.ndarray, size: float = 0.05,
              intensity: float = 255.0) -> np.ndarray:
    """Render a wireframe cube of side ``size`` sitting ON the plane
    (its base at the plane, as the reference draws it) into a grayscale
    frame.  Host-side sampling rasterizer."""
    s = size / 2.0
    corners_p = np.array([[x, y, z, 1.0]
                          for y in (0.0, size)
                          for x in (-s, s)
                          for z in (-s, s)])         # base at plane level
    Tcp = np.asarray(Tcw, np.float64) @ np.asarray(Twp, np.float64)
    pc = corners_p @ Tcp[:3, :4].T                   # [8, 3]
    out = np.array(img, np.float32, copy=True)
    h, w = out.shape
    z = pc[:, 2]
    if np.any(z <= 0.05):
        return out
    u = cam.fx * pc[:, 0] / z + cam.cx
    v = cam.fy * pc[:, 1] / z + cam.cy
    for i, j in _CUBE_EDGES:
        n_samp = int(max(abs(u[i] - u[j]), abs(v[i] - v[j]), 1)) + 1
        us = np.linspace(u[i], u[j], n_samp).round().astype(int)
        vs = np.linspace(v[i], v[j], n_samp).round().astype(int)
        ok = (us >= 0) & (us < w) & (vs >= 0) & (vs < h)
        out[vs[ok], us[ok]] = intensity
    return out


class ArDemo:
    """ros_mono_ar's menu state: detect planes on demand, keep the cube
    list, overlay them on every tracked frame."""

    def __init__(self, engine, cube_size: float = 0.05, seed: int = 5):
        self.engine = engine
        self.cube_size = cube_size
        self.planes: List[np.ndarray] = []           # Twp per cube
        self._key = jax.random.PRNGKey(seed)

    def insert_cube(self) -> bool:
        """menu.Insert Cube (ViewerAR.cc:170-180): detect a plane in the
        current map, anchor a cube on it."""
        ms = self.engine.ms
        self._key, k = jax.random.split(self._key)
        fit = detect_plane(ms.mp_pos, ms.mp_valid, ms.mp_n_obs, k)
        if not bool(fit.ok):
            return False
        self.planes.append(plane_frame(fit))
        return True

    def clear(self) -> None:
        self.planes = []                             # menu.Clear All

    def render(self, frame: np.ndarray, Tcw: Optional[np.ndarray]
               ) -> np.ndarray:
        if Tcw is None:
            return np.asarray(frame, np.float32)
        out = np.asarray(frame, np.float32)
        for Twp in self.planes:
            out = draw_cube(out, self.engine.cfg.camera, Tcw, Twp,
                            self.cube_size)
        return out
