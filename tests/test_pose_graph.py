"""Sim3 pose-graph optimization: loop-drift correction on a synthetic chain."""

import jax.numpy as jnp
import numpy as np

from orbslam2_tpu.ops import pose_graph
from orbslam2_tpu.utils import lie, synthetic


def _chain_problem(rng, K=24, drift=0.02, fix_scale=True):
    """Circle trajectory; odometry edges with drift; loop edge exact."""
    poses_true = synthetic.orbit_trajectory(K, radius=5.0, z_center=10.0)
    # integrated odometry with per-step bias → accumulating drift
    est = [poses_true[0]]
    rels = []
    for k in range(1, K):
        rel_true = poses_true[k] @ np.linalg.inv(poses_true[k - 1])
        noise = np.asarray(lie.se3_exp(jnp.asarray(
            np.concatenate([rng.normal(0, drift * 0.3, 3),
                            rng.normal(0, drift, 3)]), jnp.float32)))
        rel_noisy = noise @ rel_true
        rels.append(rel_noisy)
        est.append(rel_noisy @ est[-1])
    est = np.stack(est).astype(np.float32)

    E = K + 1  # K−1 odometry + 1 loop (+1 pad)
    e_i = np.zeros(E, np.int32)
    e_j = np.zeros(E, np.int32)
    m = np.tile(np.eye(4, dtype=np.float32), (E, 1, 1))
    w = np.zeros(E, np.float32)
    for k in range(1, K):
        # edge (i=k, j=k−1), measurement = noisy odometry S_i S_j⁻¹
        e_i[k - 1], e_j[k - 1] = k, k - 1
        m[k - 1] = rels[k - 1]
        w[k - 1] = 1.0
    # loop edge: exact relative pose between last and first
    e_i[K - 1], e_j[K - 1] = K - 1, 0
    m[K - 1] = (poses_true[K - 1] @ np.linalg.inv(poses_true[0])).astype(
        np.float32)
    w[K - 1] = 1.0

    fixed = np.zeros(K, bool)
    fixed[0] = True
    s, R, t = pose_graph.sim3_from_se3(jnp.asarray(est))
    prob = pose_graph.PoseGraphProblem(
        s=s, R=R, t=t, fixed=jnp.asarray(fixed),
        vertex_valid=jnp.ones(K, bool),
        e_i=jnp.asarray(e_i), e_j=jnp.asarray(e_j),
        m_s=jnp.ones(E, jnp.float32),
        m_R=jnp.asarray(m[:, :3, :3]), m_t=jnp.asarray(m[:, :3, 3]),
        e_weight=jnp.asarray(w))
    return prob, np.stack(poses_true), est


def _center_errors(poses_est, poses_true):
    errs = []
    for Te, Tg in zip(poses_est, poses_true):
        Ce = -Te[:3, :3].T @ Te[:3, 3]
        Cg = -Tg[:3, :3].T @ Tg[:3, 3]
        errs.append(np.linalg.norm(Ce - Cg))
    return np.asarray(errs)


def test_pose_graph_corrects_loop_drift(rng):
    prob, poses_true, est0 = _chain_problem(rng)
    err0 = _center_errors(est0, poses_true)
    s, R, t = pose_graph.optimize_pose_graph(prob, n_iters=15, cg_iters=48)
    poses = np.asarray(pose_graph.se3_from_sim3(s, R, t))
    err1 = _center_errors(poses, poses_true)
    assert err0[-1] > 0.2, err0[-1]             # sanity: there WAS drift
    # the loop-end error must collapse (that's what the loop edge pins);
    # mid-chain sag is bounded by the odometry noise itself
    assert err1[-1] < 0.2 * err0[-1], (err0[-1], err1[-1])
    assert err1.mean() < 0.85 * err0.mean(), (err0.mean(), err1.mean())
    # anchor unchanged
    np.testing.assert_allclose(poses[0], est0[0], atol=1e-5)


def test_pose_graph_scale_drift_mono(rng):
    """Sim3 mode absorbs scale drift (the monocular loop-closing case)."""
    prob, poses_true, est0 = _chain_problem(rng, drift=0.015,
                                            fix_scale=False)
    # inject scale drift into the initial estimates: grow 1% per step
    K = prob.s.shape[0]
    scales = (1.01 ** np.arange(K)).astype(np.float32)
    prob = prob._replace(s=jnp.asarray(scales))
    s, R, t = pose_graph.optimize_pose_graph(prob, n_iters=20, cg_iters=48,
                                             fix_scale=False)
    s = np.asarray(s)
    # loop edge (scale 1) should pull end-of-chain scale back toward 1
    assert abs(s[-1] - 1.0) < abs(scales[-1] - 1.0) * 0.6, s[-1]
