"""Benchmark: per-chip frame tracking throughput.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Measures the full per-frame hot path (the analogue of the reference's
``Tools/Benchmarks`` per-frame `TrackX duration` timing): ORB frontend
(pyramid, FAST, BRIEF, stereo matching) + two-stage projection matching +
two LM pose optimizations against a populated map, steady-state jitted.

vs_baseline: the reference publishes no numeric tables (BASELINE.md);
its claim is real-time tracking at camera rate on an i7 — the fastest
camera config in the repo is 30 fps (Config/RealSense-D435i-IRD.yaml), so
vs_baseline = fps / 30.
"""

import json
import os
import sys
import time

import numpy as np

def _enable_compile_cache():
    """Persistent XLA compile cache: first bench run pays compiles, later
    runs (and later driver rounds) start hot.  Must use jax.config (this
    image's sitecustomize imports jax before us, so env vars are too
    late)."""
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

REFERENCE_FPS = 30.0  # camera-rate real-time claim, best case in repo


def main():
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from orbslam2_tpu.config import (CameraConfig, CapacityConfig, OrbConfig,
                                     STEREO, SlamConfig)
    from orbslam2_tpu.runtime.slam import SlamEngine
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
    poses = synthetic.straight_trajectory(12, step=0.25)
    frames = [synthetic.render_stereo(scene, cfg.camera, T, rng, noise=1.0)
              for T in poses]

    eng = SlamEngine(cfg, enable_loop_closing=False)
    # build a live map + warm every jit cache
    for i, (lf, rt) in enumerate(frames[:8]):
        eng.track_stereo(lf, rt, timestamp=0.1 * i)

    # steady-state timing of the tracking step (device-resident inputs)
    lf = jnp.asarray(frames[8][0], jnp.float32)
    rt = jnp.asarray(frames[8][1], jnp.float32)
    Tcw_pred = jnp.asarray(eng._predict_pose(), jnp.float32)

    def step():
        fd = eng.frontend(lf, rt)
        res = eng.f_track(eng.ms, fd, Tcw_pred, eng.last_assoc,
                          eng.last_inlier)
        return res.Tcw

    jax.block_until_ready(step())  # warm
    n_iter = 20 if jax.default_backend() != "cpu" else 3
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = step()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_iter
    fps = 1.0 / dt

    print(json.dumps({
        "metric": "stereo_tracking_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / REFERENCE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
