#!/bin/bash
# Flagship-bench ablation matrix on the real TPU: attributes per-frame
# cost to pipeline stages by end-to-end deltas and isolates accuracy
# regressions. Writes one JSON line per config to stdout.
set -u
cd "$(dirname "$0")/.."
run() {
  echo "### $*" >&2
  timeout 1500 python bench.py "$@" 2>/dev/null | tail -1
}
run                                   # default: 256-KF slab, BoW LC, gba amortized
run --gba-steps 0                     # minus amortized post-loop GBA
run --no-lc                           # minus the whole LC program
run --kf-interval 0.5                 # half the keyframe rate (mapper chain cost)
run --fpd 1                           # per-frame dispatch (transport overhead)
run --max-kf 64 --max-mp 16384        # round-3 map capacity (slab-size cost)
