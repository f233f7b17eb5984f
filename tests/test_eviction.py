"""Keyframe-capacity eviction (VERDICT r4 next #4: capacity exhaustion
must do better than warn-and-stop): at exhaustion the engine frees one
slot by evicting the most redundant live keyframe, relaxing the 0.9
KeyFrameCulling gate (LocalMapping.cc:629) — the bounded-map policy."""

import jax.numpy as jnp
import numpy as np
import pytest

from orbslam2_tpu.config import (CameraConfig, CapacityConfig, OrbConfig,
                                 STEREO, SlamConfig)
from orbslam2_tpu.runtime import local_mapping
from orbslam2_tpu.utils import synthetic


def make_cfg(K=6, feats=256):
    return SlamConfig(
        camera=CameraConfig(fx=450.0, fy=450.0, cx=320.0, cy=240.0,
                            bf=150.0, width=640, height=480, fps=10.0,
                            th_depth=60.0),
        orb=OrbConfig(n_features=feats),
        capacity=CapacityConfig(max_keyframes=K, max_map_points=1 << 12,
                                local_ba_keyframes=4, local_ba_points=1024),
        sensor=STEREO)


def test_evict_protects_anchor_current_and_recent():
    from orbslam2_tpu.models import map_state as M
    cfg = make_cfg()
    mfns = local_mapping.make_mapping_fns(cfg)
    ms = M.empty_map(cfg)
    # three live keyframes, all recent → nothing evictable
    ms = ms._replace(
        kf_valid=jnp.asarray([True, True, True, False, False, False]),
        kf_frame_id=jnp.asarray([0, 1, 2, 0, 0, 0], jnp.int32))
    ms2, victim = mfns.evict_keyframe(ms, jnp.int32(2), jnp.int32(5))
    assert int(victim) == -1
    np.testing.assert_array_equal(np.asarray(ms2.kf_valid),
                                  np.asarray(ms.kf_valid))
    # make keyframe 1 old → it becomes the victim (0 and current=2 are
    # protected)
    ms3, victim = mfns.evict_keyframe(ms, jnp.int32(2), jnp.int32(100))
    assert int(victim) == 1
    assert not bool(np.asarray(ms3.kf_valid)[1])


@pytest.mark.slow
def test_engine_keeps_inserting_past_capacity(rng):
    from orbslam2_tpu.runtime.slam import SlamEngine
    cfg = make_cfg(K=6, feats=400)
    world = synthetic.make_world(rng)
    poses = synthetic.straight_trajectory(40, step=0.3)
    eng = SlamEngine(cfg, enable_loop_closing=False)
    for i, T in enumerate(poses):
        l, r = synthetic.render_world_stereo(world, cfg.camera, T, rng, 1.0)
        eng.track_stereo(l, r, 0.1 * i)
    assert eng.state == 2, eng.stats
    assert eng.stats.get("kf_evicted", 0) > 0, eng.stats
    # the map stays bounded and the engine keeps tracking + inserting
    assert eng.n_kfs <= cfg.capacity.max_keyframes
    assert eng.stats["kf_inserted"] > cfg.capacity.max_keyframes
    poses_est = eng.frame_poses()
    assert sum(p is not None for p in poses_est) == len(poses)
