#!/bin/bash
# Regenerate RESULTS.md convergence rows (VERDICT r3 item 5): the round-3
# schedule doubled (40 epochs x 150 steps) on two seeds, batch 1 remat-off
# (the measured ~30% win at 128^3 — docs/PERF.md). Each run appends its own
# row to RESULTS.md via the --preset results plumbing and logs to /tmp.
#
# Sequential on purpose: one chip, and the second run reuses the first's
# compile cache (identical HLO — only the data seed differs).
set -x
cd "$(dirname "$0")/.."
timeout 7200 python examples/train_synthetic.py --preset results \
  --epochs 40 --seed 0 --remat 0 --out /tmp/vg_results_e40_s0 \
  > /tmp/r4_results_s0.log 2>&1
echo "seed0 rc=$?"
timeout 7200 python examples/train_synthetic.py --preset results \
  --epochs 40 --seed 1 --remat 0 --out /tmp/vg_results_e40_s1 \
  > /tmp/r4_results_s1.log 2>&1
echo "seed1 rc=$?"
