"""Distributed-BA scaling measurement.

On real multi-chip hardware, scaling efficiency is t(1 chip, problem) /
t(N chips, problem) · 1/N against the BASELINE target (≥70% at N≥2).
Virtual CPU devices share one socket's FLOPs, so no speedup is physically
possible there; the honest measurable quantity is **sharding overhead**:
the SAME total problem, unsharded on one device vs sharded N ways across
the virtual mesh.  Ideal = 1.0 (no overhead); the reported
``scaling_efficiency_pct`` is t_unsharded / t_sharded — the fraction of
ideal throughput surviving GSPMD partitioning + collectives.  On real
chips the same harness reports true scaling efficiency.
"""

from __future__ import annotations

import time
from typing import Dict

import numpy as np


def _problem(cam_cfg, C, pts_per_cam, n_pts, seed=0):
    import jax.numpy as jnp
    from orbslam2_tpu.ops import bundle
    rng = np.random.default_rng(seed)
    pts = np.stack([rng.uniform(-6, 6, n_pts), rng.uniform(-4, 4, n_pts),
                    rng.uniform(6, 25, n_pts)], -1).astype(np.float32)
    poses = np.tile(np.eye(4, dtype=np.float32), (C, 1, 1))
    poses[:, 0, 3] = 0.1 * np.arange(C)
    cam_i = np.repeat(np.arange(C, dtype=np.int32), pts_per_cam)
    pt_i = np.concatenate([
        rng.choice(n_pts, pts_per_cam, replace=False).astype(np.int32)
        for _ in range(C)])
    pc = pts[pt_i] + poses[cam_i][:, :3, 3]
    z = pc[:, 2]
    uv = np.stack([cam_cfg.fx * pc[:, 0] / z + cam_cfg.cx,
                   cam_cfg.fy * pc[:, 1] / z + cam_cfg.cy], -1)
    uv += rng.normal(0, 0.3, uv.shape)
    ur = uv[:, 0] - cam_cfg.bf / z
    O = len(cam_i)
    return bundle.BAProblem(
        poses=jnp.asarray(poses),
        points=jnp.asarray(pts + rng.normal(0, 0.03, pts.shape),
                           jnp.float32),
        point_valid=jnp.ones(n_pts, bool),
        cam_i=jnp.asarray(cam_i), pt_i=jnp.asarray(pt_i),
        uv=jnp.asarray(uv, jnp.float32), ur=jnp.asarray(ur, jnp.float32),
        inv_sigma2=jnp.ones(O, jnp.float32), valid=jnp.ones(O, bool))


def measure_scaling(C: int = 64, pts_per_cam: int = 512,
                    n_pts: int = 8192, repeats: int = 3) -> Dict:
    """Returns {"scaling_devices", "scaling_efficiency_pct", ...}."""
    import jax
    from orbslam2_tpu.config import CameraConfig
    from orbslam2_tpu.parallel import dist_ba, mesh as mesh_mod
    from orbslam2_tpu.utils import camera as cam_mod

    cam_cfg = CameraConfig(fx=450.0, fy=450.0, cx=320.0, cy=240.0, bf=150.0)
    cam = cam_mod.Camera.from_config(cam_cfg)
    n_dev = jax.device_count()

    def run(mesh, prob, n_free):
        poses, points, inl = dist_ba.distributed_bundle_adjust(
            mesh, cam, prob, n_free=n_free, iters_a=5, iters_b=10,
            fix_first_free=True, solver="cg")
        jax.block_until_ready(poses)
        return poses

    def timed(mesh, prob, n_free):
        run(mesh, prob, n_free)            # compile
        ts = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            run(mesh, prob, n_free)
            ts.append(time.perf_counter() - t0)
        return min(ts)

    # the SAME total problem, unsharded vs sharded across the mesh
    prob = _problem(cam_cfg, C, pts_per_cam, n_pts)
    mesh1 = mesh_mod.make_mesh(jax.devices()[:1])
    t1 = timed(mesh1, prob, C)
    meshN = mesh_mod.make_mesh()
    tN = timed(meshN, prob, C)

    eff = t1 / tN if tN > 0 else 0.0
    virtual = jax.default_backend() == "cpu"
    return {
        "scaling_devices": n_dev,
        "scaling_mode": ("sharding-overhead proxy (virtual mesh shares one "
                         "socket)" if virtual else "strong scaling"),
        "scaling_unsharded_ms": round(t1 * 1e3, 1),
        "scaling_sharded_ms": round(tN * 1e3, 1),
        "scaling_efficiency_pct": round(100.0 * eff, 1),
        "scaling_shapes": {"cameras": C, "observations": C * pts_per_cam,
                           "points": n_pts},
    }


if __name__ == "__main__":
    import json
    print(json.dumps(measure_scaling()))
