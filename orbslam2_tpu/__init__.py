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

import jax as _jax

# f32 matmuls/einsums MUST run at full precision on TPU: the default
# bf16-input MXU path destroys the LM normal equations and projection
# geometry — measured on-chip: the scale-circuit drift explodes 1.1 m →
# 13 m within 250 frames at default precision while the identical run is
# clean on CPU and at "highest".  The deliberately-bf16 kernels (the MXU
# Hamming form) pass bf16 operands explicitly and are unaffected.
# Respect an explicit user setting.
if _jax.config.jax_default_matmul_precision is None:
    _jax.config.update("jax_default_matmul_precision", "highest")

from orbslam2_tpu.config import SlamConfig  # noqa: F401
