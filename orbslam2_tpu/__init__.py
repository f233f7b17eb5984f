"""orbslam2_tpu — a TPU-native visual SLAM framework.

A from-scratch re-design of the capabilities of ORB-SLAM2
(fabrizioromanelli fork) for TPU hardware: the numerical core is
JAX/XLA/Pallas, the map is array-structured functional state instead of a
pointer graph, and multi-chip scaling uses jax.sharding meshes instead of
threads+mutexes.

Layer map (mirrors reference SURVEY.md §1):
  utils/     — L-1 foundations: SE3/Sim3, camera model, config, datasets, IO
  ops/       — L2 kernels: ORB extraction, matching, stereo, RANSAC, BA
  models/    — L1 data model: Frame, array-structured Map, keyframe DB, BoW
  parallel/  — P6: sharded BA + DB scoring over device meshes
  runtime/   — L3/L4: tracking state machine, mapping, loop closing, System
"""

__version__ = "0.1.0"

from orbslam2_tpu.config import SlamConfig  # noqa: F401
