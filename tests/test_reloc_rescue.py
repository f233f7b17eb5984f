"""Relocalization rescue rounds (Tracking.cc:1549-1580) + the
lost-≤5-KF auto-reset (Tracking.cc:571-580).

The rescue test builds the failure case directly: a frame whose
descriptors are corrupted past TH_LOW for most features (direct BoW-style
matching yields only ~25 inliers — below the ≥50 acceptance) but within
TH_HIGH, so only the 10 px SearchByProjection window can recover them.
Before round 4 this candidate was discarded; with the rescue it must
relocalize."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbslam2_tpu.config import (CameraConfig, CapacityConfig, OrbConfig,
                                 STEREO, SlamConfig)
from orbslam2_tpu.models import map_state as M
from orbslam2_tpu.models.vocabulary import default_vocabulary
from orbslam2_tpu.runtime import tracking
from orbslam2_tpu.runtime.loop_closing import LoopCloser
from orbslam2_tpu.utils import synthetic


def _cfg():
    return SlamConfig(
        camera=CameraConfig(fx=450.0, fy=450.0, cx=320.0, cy=240.0,
                            bf=150.0, width=640, height=480, fps=10.0,
                            th_depth=60.0),
        orb=OrbConfig(n_features=256),
        capacity=CapacityConfig(max_keyframes=8, max_map_points=2048,
                                local_ba_keyframes=4, local_ba_points=512),
        sensor=STEREO)


def _flip_bits(desc_row: np.ndarray, n_bits: int, rng) -> np.ndarray:
    """XOR ``n_bits`` distinct random bits of a 256-bit descriptor."""
    out = desc_row.copy()
    bits = rng.choice(256, size=n_bits, replace=False)
    for b in bits:
        out[b // 32] ^= np.uint32(1) << np.uint32(b % 32)
    return out


def test_reloc_rescue_recovers_thin_direct_match(rng):
    cfg = _cfg()
    N = cfg.orb.n_features_padded
    n_feat = 180
    cam = cfg.camera

    # 3D points in front of the (identity-pose) keyframe, projected
    pts_c = np.stack([rng.uniform(-4, 4, n_feat), rng.uniform(-3, 3, n_feat),
                      rng.uniform(6, 25, n_feat)], -1)
    u = cam.fx * pts_c[:, 0] / pts_c[:, 2] + cam.cx
    v = cam.fy * pts_c[:, 1] / pts_c[:, 2] + cam.cy
    inb = (u > 20) & (u < cam.width - 20) & (v > 20) & (v < cam.height - 20)
    pts_c, u, v = pts_c[inb], u[inb], v[inb]
    n_feat = len(u)
    assert n_feat >= 120

    desc = rng.integers(0, 2 ** 32, (N, 8), dtype=np.uint32)
    xy = np.zeros((N, 2), np.float32)
    xy[:n_feat, 0] = u
    xy[:n_feat, 1] = v
    valid = np.zeros((N,), bool)
    valid[:n_feat] = True

    ms = M.empty_map(cfg)
    assoc = np.full((N,), M.NO_MP, np.int32)
    assoc[:n_feat] = np.arange(n_feat)
    ms = M.add_map_points(
        ms, jnp.asarray(assoc.clip(0)),
        jnp.asarray(np.pad(pts_c, ((0, N - n_feat), (0, 0))), jnp.float32),
        jnp.asarray(valid), ref_kf=jnp.zeros((N,), jnp.int32))
    ms = M.add_keyframe(
        ms, jnp.int32(0), jnp.eye(4, dtype=jnp.float32), jnp.int32(0),
        jnp.float32(0.0), jnp.asarray(xy), jnp.zeros((N,), jnp.int32),
        jnp.zeros((N,), jnp.float32), jnp.asarray(desc), jnp.asarray(valid),
        jnp.full((N,), -1.0, jnp.float32), jnp.full((N,), -1.0, jnp.float32),
        jnp.asarray(assoc), parent=jnp.int32(-1))
    ms = M.add_observations(ms, jnp.int32(0), jnp.arange(N, dtype=jnp.int32),
                            jnp.asarray(assoc.clip(0)), jnp.asarray(valid),
                            cfg.orb.scale_factor, cfg.orb.n_levels)

    # query frame at the same pose: 25 clean-ish descriptors (≤20 flipped
    # bits → direct match), the rest 60-75 flipped bits (TH_LOW=50 fails,
    # TH_HIGH=100 passes → only the projection rescue finds them)
    fdesc = desc.copy()
    for i in range(n_feat):
        n_bits = int(rng.integers(4, 20)) if i < 25 else \
            int(rng.integers(60, 76))
        fdesc[i] = _flip_bits(desc[i], n_bits, rng)

    voc = default_vocabulary(k=cfg.capacity.vocab_k,
                             levels=cfg.capacity.vocab_levels)
    lc = LoopCloser(cfg, voc)
    lc.db = lc.db.add(jnp.int32(0), jnp.zeros((voc.n_words,), jnp.float32))

    Tcw, n, assoc_out = lc.f_reloc(
        ms, jnp.asarray(fdesc), jnp.asarray(valid), jnp.asarray(xy),
        jnp.zeros((N,), jnp.int32), jnp.full((N,), -1.0, jnp.float32),
        jnp.zeros((N,), jnp.float32), jnp.int32(0),
        jax.random.PRNGKey(0))
    n = int(n)
    assert n >= 50, f"rescue failed: only {n} inliers"
    # recovered pose is the keyframe pose (identity)
    T = np.asarray(Tcw)
    assert np.linalg.norm(T[:3, 3]) < 0.05, T[:3, 3]
    assert int(jnp.sum(assoc_out >= 0)) >= 50


@pytest.mark.slow
def test_auto_reset_on_bad_bootstrap(rng):
    """LOST with ≤5 keyframes ⇒ full reset and clean re-initialization
    (Tracking.cc:571-580).  Feed a short good stretch (1-2 KFs), then
    black frames (nothing to track), then a good stretch again."""
    from orbslam2_tpu.runtime.slam import SlamEngine

    cfg = _cfg()
    world = synthetic.make_world(rng)
    poses = synthetic.straight_trajectory(16, step=0.3)
    eng = SlamEngine(cfg, enable_loop_closing=True)

    for i in range(3):
        l, r = synthetic.render_world_stereo(world, cfg.camera, poses[i],
                                             rng, 1.0)
        eng.track_stereo(l, r, 0.1 * i)
    assert eng.state == tracking.OK
    assert eng.n_kfs <= 5

    black = np.zeros((cfg.camera.height, cfg.camera.width), np.uint8)
    for i in range(3, 6):
        eng.track_stereo(black, black, 0.1 * i)
    assert eng.stats.get("resets", 0) >= 1
    assert eng.n_kfs <= 1            # map was wiped (black may re-init 0 KF)

    for i in range(6, 16):
        l, r = synthetic.render_world_stereo(world, cfg.camera, poses[i],
                                             rng, 1.0)
        out = eng.track_stereo(l, r, 0.1 * i)
    assert eng.state == tracking.OK
    assert out is not None
    # trajectory restarted at the reset (reference clears the lists)
    assert len(eng.trajectory) <= 10
