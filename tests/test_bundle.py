"""Schur-complement bundle adjustment vs synthetic ground truth."""

import jax.numpy as jnp
import numpy as np

from orbslam2_tpu.config import CameraConfig
from orbslam2_tpu.ops import bundle
from orbslam2_tpu.utils import camera as cam_mod
from orbslam2_tpu.utils import lie, synthetic

CAM_CFG = CameraConfig(fx=450.0, fy=450.0, cx=320.0, cy=240.0,
                       bf=150.0, width=640, height=480)


def _make_ba_problem(rng, n_free=6, n_fixed=2, n_pts=300, noise_px=0.4,
                     pose_pert=0.02, pt_pert=0.05, stereo=True,
                     outlier_frac=0.05):
    cam = cam_mod.Camera.from_config(CAM_CFG)
    n_cams = n_free + n_fixed
    poses_true = [synthetic.look_ahead_pose(np.array([0.3 * i, 0.0, 0.4 * i]))
                  for i in range(n_cams)]
    pts_true = np.stack([rng.uniform(-6, 6, n_pts), rng.uniform(-4, 4, n_pts),
                         rng.uniform(6, 25, n_pts)], -1)

    cam_i, pt_i, uvs, urs = [], [], [], []
    for ci, T in enumerate(poses_true):
        pc = pts_true @ T[:3, :3].T + T[:3, 3]
        z = pc[:, 2]
        u = CAM_CFG.fx * pc[:, 0] / z + CAM_CFG.cx
        v = CAM_CFG.fy * pc[:, 1] / z + CAM_CFG.cy
        vis = (z > 0.5) & (u > 10) & (u < 630) & (v > 10) & (v < 470)
        for pi in np.where(vis)[0]:
            cam_i.append(ci)
            pt_i.append(pi)
            uu = u[pi] + rng.normal(0, noise_px)
            vv = v[pi] + rng.normal(0, noise_px)
            uvs.append((uu, vv))
            urs.append(uu - CAM_CFG.bf / z[pi] + rng.normal(0, noise_px)
                       if stereo else -1.0)
    O = len(cam_i)
    uvs = np.asarray(uvs, np.float32)
    urs = np.asarray(urs, np.float32)
    n_out = int(O * outlier_frac)
    out_idx = rng.choice(O, n_out, replace=False)
    uvs[out_idx] += rng.uniform(10, 40, (n_out, 2))

    # perturb free cameras and all points
    poses0 = np.stack(poses_true).astype(np.float32)
    for i in (range(1, n_free) if n_fixed == 0 else range(n_free)):
        xi = np.concatenate([rng.normal(0, pose_pert, 3),
                             rng.normal(0, pose_pert * 5, 3)]).astype(np.float32)
        poses0[i] = np.asarray(lie.se3_exp(jnp.asarray(xi))) @ poses0[i]
    pts0 = pts_true + rng.normal(0, pt_pert, pts_true.shape)

    prob = bundle.BAProblem(
        poses=jnp.asarray(poses0),
        points=jnp.asarray(pts0, jnp.float32),
        point_valid=jnp.ones(n_pts, bool),
        cam_i=jnp.asarray(cam_i, jnp.int32),
        pt_i=jnp.asarray(pt_i, jnp.int32),
        uv=jnp.asarray(uvs),
        ur=jnp.asarray(urs),
        inv_sigma2=jnp.ones(O, jnp.float32),
        valid=jnp.ones(O, bool))
    return cam, prob, np.stack(poses_true), pts_true, out_idx


def _pose_errors(poses_est, poses_true, n):
    errs_t, errs_r = [], []
    for i in range(n):
        dT = poses_est[i] @ np.linalg.inv(poses_true[i])
        errs_t.append(np.linalg.norm(dT[:3, 3]))
        errs_r.append(np.degrees(np.arccos(
            np.clip((np.trace(dT[:3, :3]) - 1) / 2, -1, 1))))
    return np.asarray(errs_t), np.asarray(errs_r)


def test_local_ba_converges(rng):
    cam, prob, poses_true, pts_true, out_idx = _make_ba_problem(rng)
    poses, points, inlier = bundle.bundle_adjust(cam, prob, n_free=6)
    poses, points = np.asarray(poses), np.asarray(points)

    et, er = _pose_errors(poses, poses_true, 6)
    assert et.max() < 8e-3, et          # ≈ noise floor for 0.4 px obs noise
    assert er.max() < 0.05, er
    pt_err = np.linalg.norm(points - pts_true, axis=-1)
    assert np.median(pt_err) < 0.12, np.median(pt_err)  # depth noise floor at z≈15 m
    # outliers rejected
    inlier = np.asarray(inlier)
    assert inlier[out_idx].mean() < 0.1
    assert inlier.mean() > 0.85


def test_local_ba_improves_over_init(rng):
    cam, prob, poses_true, pts_true, _ = _make_ba_problem(
        rng, pose_pert=0.03, pt_pert=0.1)
    et0, _ = _pose_errors(np.asarray(prob.poses), poses_true, 6)
    poses, points, _ = bundle.bundle_adjust(cam, prob, n_free=6)
    et1, _ = _pose_errors(np.asarray(poses), poses_true, 6)
    assert et1.max() < 0.05 * et0.max()


def test_global_ba_gauge_fixed(rng):
    cam, prob, poses_true, pts_true, _ = _make_ba_problem(
        rng, n_free=8, n_fixed=0)
    poses, points, inlier = bundle.bundle_adjust(
        cam, prob, n_free=8, fix_first_free=True, iters_a=10, iters_b=10)
    poses = np.asarray(poses)
    # camera 0 must not move (gauge anchor)
    np.testing.assert_allclose(poses[0], np.asarray(prob.poses)[0], atol=1e-6)
    et, er = _pose_errors(poses, poses_true, 8)
    assert et.max() < 8e-3, et
    assert er.max() < 0.08, er


def test_mono_ba(rng):
    cam, prob, poses_true, pts_true, _ = _make_ba_problem(
        rng, stereo=False, outlier_frac=0.0)
    poses, points, inlier = bundle.bundle_adjust(cam, prob, n_free=6)
    et, er = _pose_errors(np.asarray(poses), poses_true, 6)
    assert et.max() < 2.5e-2, et   # mono-only: weaker depth observability


def test_fixed_cameras_unchanged(rng):
    cam, prob, poses_true, pts_true, _ = _make_ba_problem(rng)
    poses, _, _ = bundle.bundle_adjust(cam, prob, n_free=6)
    np.testing.assert_allclose(np.asarray(poses)[6:],
                               np.asarray(prob.poses)[6:], atol=1e-7)


def test_cg_solver_matches_dense(rng):
    """The matrix-free CG path (global-BA solver) must land on the same
    optimum as the dense Schur + Cholesky path."""
    cam, prob, poses_true, pts_true, _ = _make_ba_problem(rng)
    poses_d, points_d, inl_d = bundle.bundle_adjust(
        cam, prob, n_free=6, solver="dense")
    poses_c, points_c, inl_c = bundle.bundle_adjust(
        cam, prob, n_free=6, solver="cg", cg_iters=48)
    et_d, er_d = _pose_errors(np.asarray(poses_d), poses_true, 6)
    et_c, er_c = _pose_errors(np.asarray(poses_c), poses_true, 6)
    # both converge to ground truth...
    assert et_c.max() < 0.02 and er_c.max() < 0.1
    # ...and to (nearly) each other
    assert abs(et_c.max() - et_d.max()) < 5e-3
    np.testing.assert_allclose(np.asarray(points_c), np.asarray(points_d),
                               atol=0.02)


def test_cg_solver_gauge_fixed(rng):
    cam, prob, poses_true, pts_true, _ = _make_ba_problem(
        rng, n_free=8, n_fixed=0)
    poses, points, _ = bundle.bundle_adjust(
        cam, prob, n_free=8, solver="cg", fix_first_free=True)
    np.testing.assert_allclose(np.asarray(poses)[0], poses_true[0], atol=1e-6)
    et, er = _pose_errors(np.asarray(poses), poses_true, 8)
    assert et.max() < 0.03
