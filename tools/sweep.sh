#!/bin/sh
# Benchmark sweep — parity with /root/reference/test/benchmark.sh (workers x
# min-frame-size grid, 2 reps) using a synthetic in-RAM corpus.  Workers map
# to device-batch width on TPU (SURVEY.md §2).  Render with tools/report.py.
#
# Usage: sh tools/sweep.sh [--zstd|--lz4] [MB] > results.txt
set -e
CODEC=${1:---zstd}
MB=${2:-64}
REPS=2
cd "$(dirname "$0")/.."
for w in 1 2 4 8 16; do
  for f in 1 4 16 64; do
    for _ in $(seq $REPS); do
      python tools/benchmark.py "$CODEC" --synthetic "$MB" "$w" "$f" -t
    done
  done
done
