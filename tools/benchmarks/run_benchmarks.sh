#!/usr/bin/env bash
# executeBenchmarks.sh equivalent: run the regression set in SLAM and LOC
# modes. Real datasets are used when the env vars point at them; otherwise
# synthetic sequences stand in (this machine has no datasets).
set -u
cd "$(dirname "$0")/../.."
PY=${PYTHON:-python}

run() { echo "== $*"; $PY tools/benchmarks/benchmark.py "$@" || echo "FAILED: $*"; }

if [ -n "${EUROC_MH05_DIR:-}" ]; then
  run --kind euroc --path "$EUROC_MH05_DIR" --settings "${EUROC_SETTINGS:-}"
fi
if [ -n "${TUM_FR3_DIR:-}" ]; then
  run --kind tum --path "$TUM_FR3_DIR" --settings "${TUM_SETTINGS:-}"
fi
if [ -n "${KITTI_SEQ15_DIR:-}" ]; then
  run --kind kitti --path "$KITTI_SEQ15_DIR" --settings "${KITTI_SETTINGS:-}"
fi
run --kind synthetic --frames 40
echo "== headline (streaming LOC-mode throughput)"
$PY bench.py
