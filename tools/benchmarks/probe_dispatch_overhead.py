"""Probe: decompose the ~86 ms per-window dispatch overhead.

Candidates: the 2.4 MB uint8 H2D payload transfer, the per-output-buffer
runtime charge (~2 ms/buffer measured r2 — SlamWindowOut carries 17
arrays incl. the 9-field stacked FrameData), and the base RPC.  Measures
t(dispatch+block) for: (a) the real tracker, (b) a variant returning
only 4 small outputs, (c) the real tracker with the payload already
device-resident.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..", "..",
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    import jax.numpy as jnp
    from orbslam2_tpu.config import (CameraConfig, CapacityConfig, OrbConfig,
                                     STEREO, SlamConfig)
    from orbslam2_tpu.runtime.windowed import (WindowedSlamEngine,
                                               make_slam_window_tracker)
    from orbslam2_tpu.utils import synthetic

    W = 4
    cfg = SlamConfig(
        camera=CameraConfig(fx=450.0, fy=450.0, cx=320.0, cy=240.0,
                            bf=150.0, width=640, height=480, fps=10.0,
                            th_depth=60.0),
        orb=OrbConfig(n_features=1000),
        capacity=CapacityConfig(max_keyframes=128, max_map_points=1 << 14,
                                local_ba_keyframes=8, local_ba_points=2048),
        sensor=STEREO)
    rng = np.random.default_rng(0)
    world = synthetic.make_world(rng)
    poses = synthetic.straight_trajectory(40, step=0.25)
    frames = [synthetic.render_world_stereo(world, cfg.camera, T, rng,
                                            noise=1.0) for T in poses]
    eng = WindowedSlamEngine(cfg, enable_loop_closing=False, window=W)
    for i in range(40):
        eng.track_stereo(*frames[i], timestamp=0.1 * i)
    eng.flush()
    ms = eng.ms
    pay_np = eng._window_payload(
        [(np.concatenate([frames[36][0].astype(np.uint8).reshape(-1),
                          frames[36][1].astype(np.uint8).reshape(-1)]), 0.0)
         for _ in range(W)])
    sT = jnp.asarray(np.stack([eng.last_Tcw, eng.last_Tcw]).astype(
        np.float32))
    assoc, inl, ref = eng.last_assoc, eng.last_inlier, jnp.int32(eng.ref_kf)

    tracker = eng.f_track_window

    small = make_slam_window_tracker(cfg, W)

    @jax.jit
    def tracker_small(ms_, pay_, sT_, a_, i_, r_):
        out = small(ms_, pay_, sT_, a_, i_, r_)
        return (out.summaries, out.state_T, out.last_assoc,
                out.last_inlier)

    def t_min(fn, *args, n=7):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            out = fn(*args)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        return min(ts)

    # warm
    for f in (tracker, tracker_small):
        jax.block_until_ready(f(ms, pay_np, sT, assoc, inl, ref))

    pay_dev = jax.device_put(pay_np)
    jax.block_until_ready(pay_dev)

    a = t_min(tracker, ms, pay_np, sT, assoc, inl, ref)
    b = t_min(tracker_small, ms, pay_np, sT, assoc, inl, ref)
    c = t_min(tracker, ms, pay_dev, sT, assoc, inl, ref)
    d = t_min(tracker_small, ms, pay_dev, sT, assoc, inl, ref)
    print(f"full outputs, host payload   : {a*1e3:7.1f} ms")
    print(f"small outputs, host payload  : {b*1e3:7.1f} ms")
    print(f"full outputs, device payload : {c*1e3:7.1f} ms")
    print(f"small outputs, device payload: {d*1e3:7.1f} ms")
    print(f"=> H2D cost ~{(a-c)*1e3:.1f} ms, output-buffer cost "
          f"~{(c-d)*1e3:.1f} ms")

    # device_put throughput for the payload
    t0 = time.perf_counter()
    for _ in range(5):
        jax.block_until_ready(jax.device_put(pay_np))
    print(f"device_put({pay_np.nbytes/1e6:.1f} MB): "
          f"{(time.perf_counter()-t0)/5*1e3:.1f} ms")


if __name__ == "__main__":
    main()
