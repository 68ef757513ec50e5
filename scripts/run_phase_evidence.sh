#!/bin/bash
# Committed eval evidence for the capability claims (VERDICT r4 next #9):
# phase 1 + phase 3 synthetic runs, 3 seeds x n=32 per arm, results under
# results/phase{1,3}/seed<S>/.  Run after the trained artifacts ship.
set -u
LOG=/tmp/phase_evidence.log
for seed in 0 1 2; do
  for phase in 1 3; do
    out="results/phase${phase}/seed${seed}"
    mkdir -p "$out"
    echo "=== phase $phase seed $seed $(date) ===" >> "$LOG"
    timeout 2400 python benchmarks/run_phase${phase}.py --synthetic \
      --configs qa_lm gvp_light synthetic_gate \
      --max-samples 32 --seed "$seed" --shuffle \
      --output-dir "$out" >> "$LOG" 2>&1
    echo "=== phase $phase seed $seed exit $? $(date) ===" >> "$LOG"
  done
done
echo "=== all done $(date) ===" >> "$LOG"
