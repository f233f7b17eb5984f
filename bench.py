"""Benchmark: per-chip frame tracking throughput.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Measures the full per-frame tracking hot path — ORB frontend (pyramid,
FAST, BRIEF, stereo matching) + two-stage projection matching + two LM
pose optimizations against a live map — in the streaming-window mode
(runtime/streaming.py): a lax.scan carries (pose, velocity, associations)
across frames so a window of frames is one device program and one
device→host transfer.  This is the localization-mode serving path (the
reference benchmarks LOC mode too, Tools/Benchmarks/executeBenchmarks.sh)
and the front half of SLAM mode; on remote-attached TPUs it is also the
only measurement not dominated by tunnel round-trip latency.

vs_baseline: the reference publishes no numeric tables (BASELINE.md); its
claim is real-time tracking at camera rate on an i7 — the fastest camera
config in the repo is 30 fps (Config/RealSense-D435i-IRD.yaml), so
vs_baseline = fps / 30.
"""

import json
import os
import sys
import time

import numpy as np

REFERENCE_FPS = 30.0  # camera-rate real-time claim, best case in repo
WINDOW = 8            # frames per device program


def _enable_compile_cache():
    """Persistent XLA compile cache (jax.config, not env: this image\'s
    sitecustomize imports jax before us)."""
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def main():
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from orbslam2_tpu.config import (CameraConfig, CapacityConfig, OrbConfig,
                                     STEREO, SlamConfig)
    from orbslam2_tpu.runtime.slam import SlamEngine
    from orbslam2_tpu.runtime.streaming import make_window_tracker
    from orbslam2_tpu.utils import synthetic

    cfg = SlamConfig(
        camera=CameraConfig(fx=450.0, fy=450.0, cx=320.0, cy=240.0,
                            bf=150.0, width=640, height=480, fps=10.0,
                            th_depth=60.0),
        orb=OrbConfig(n_features=1000),
        capacity=CapacityConfig(max_keyframes=128, max_map_points=1 << 14,
                                local_ba_keyframes=8, local_ba_points=2048),
        sensor=STEREO)

    rng = np.random.default_rng(0)
    scene = synthetic.make_scene(rng, 900, extent=(14.0, 9.0, 40.0),
                                 z_near=3.0)
    poses = synthetic.straight_trajectory(8 + WINDOW, step=0.25)
    frames = [synthetic.render_stereo(scene, cfg.camera, T, rng, noise=1.0)
              for T in poses]

    # build a live map (sync SLAM) + warm the tracking jits
    eng = SlamEngine(cfg, enable_loop_closing=False)
    for i in range(8):
        eng.track_stereo(*frames[i], timestamp=0.1 * i)

    # streaming window over the next WINDOW frames, device-resident
    left = jnp.asarray(np.stack([f[0] for f in frames[8:8 + WINDOW]]),
                       jnp.float32)
    right = jnp.asarray(np.stack([f[1] for f in frames[8:8 + WINDOW]]),
                        jnp.float32)
    track_window = make_window_tracker(cfg)
    Tprev = jnp.asarray(eng.last_Tcw, jnp.float32)
    vel_inv = (np.linalg.inv(eng.velocity) if eng.velocity is not None
               else np.eye(4, dtype=np.float32))
    Tprev2 = jnp.asarray((vel_inv @ eng.last_Tcw).astype(np.float32))
    args = (eng.ms, left, right, Tprev, Tprev2, eng.last_assoc,
            eng.last_inlier, jnp.int32(eng.ref_kf))
    out = track_window(*args)
    jax.block_until_ready(out.poses)   # compile + warm

    n_windows = 12 if jax.default_backend() != "cpu" else 2
    t0 = time.perf_counter()
    for _ in range(n_windows):
        out = track_window(*args)
    jax.block_until_ready(out.poses)
    dt = time.perf_counter() - t0
    fps = (WINDOW * n_windows) / dt

    print(json.dumps({
        "metric": "stereo_tracking_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / REFERENCE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
