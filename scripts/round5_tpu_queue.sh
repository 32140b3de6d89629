#!/bin/bash
# Round-5 TPU measurement queue (run while the chip is free; one job at a time).
# Usage: bash scripts/round5_tpu_queue.sh [stage...]   (default: all stages)
set -x
cd "$(dirname "$0")/.."
stages="${@:-kernel corner panel gather}"

for s in $stages; do
  case $s in
    kernel)
      # VERDICT #7: grid-axis x-shift variant — A/B at radius 4/8, then the
      # previously-impossible radius 12/16 compiles (fwd-only; bwd keeps the
      # unroll). Unrolled baselines first (cache-warm from r4).
      for r in 4 8; do
        MVDETR_MSDA_XGRID=0 timeout 1800 python scripts/bench_kernel.py --radius $r --fwd_only --iters 10
        MVDETR_MSDA_XGRID=1 timeout 1800 python scripts/bench_kernel.py --radius $r --fwd_only --iters 10
      done
      for r in 12 16; do
        timeout 2400 python scripts/bench_kernel.py --radius $r --fwd_only --iters 10
      done
      ;;
    corner)
      # VERDICT #2: window-local one-hot corner einsum vs the scan, on-chip
      timeout 2400 python scripts/exp_corner_stencil.py --scale mid
      ;;
    panel)
      # VERDICT #3: 3-seed accuracy panel, worst-seed floor
      timeout 5400 python scripts/hard_benchmark.py --panel --epochs 15
      ;;
    gather)
      # VERDICT #5: reference-exact gather vs windowed at the 90-MODA point
      # (seed 5; the panel's seed-5 run is the windowed side of the A/B)
      timeout 7200 python scripts/hard_benchmark.py --attn_mode gather --epochs 15 --floor 0
      ;;
  esac
done
