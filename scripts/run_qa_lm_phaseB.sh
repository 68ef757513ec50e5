#!/bin/bash
# Supervisor for the QA-LM v5 Phase-B ladder: short supervised chunks with
# warm restarts (the tunnel stalls sporadically mid-run; a watchdog retry
# bounds the loss to one chunk).  Final eval runs separately from disk.
set -u
OUT=outputs/qa_lm_v5_B
CHUNK_STEPS=${CHUNK_STEPS:-1000}
N_CHUNKS=${N_CHUNKS:-4}
INIT=outputs/qa_lm_v5_shortA2
LOG=/tmp/qa_lm_phaseB.log

for i in $(seq 1 "$N_CHUNKS"); do
  if [ -f "$OUT/params.npz" ]; then INIT="$OUT"; fi
  echo "=== chunk $i/$N_CHUNKS (init from $INIT) $(date) ===" >> "$LOG"
  timeout 3600 python scripts/train_qa_lm.py \
    --out "$OUT" --geometry v5 --curriculum full \
    --init-from "$INIT" --steps "$CHUNK_STEPS" \
    --lr 1.5e-4 --seed $((100 + i)) \
    --pipeline-frac 0.3 --short-mix 0.15 --lookup-frac 0.1 \
    --family-weights 0.15 0.15 0.2 0.2 0.3 0.0 \
    --eval-samples 0 >> "$LOG" 2>&1
  rc=$?
  echo "=== chunk $i exit $rc $(date) ===" >> "$LOG"
  if [ $rc -ne 0 ] && [ ! -f "$OUT/params.npz" ]; then
    echo "chunk $i failed before any checkpoint; retrying once" >> "$LOG"
    timeout 3600 python scripts/train_qa_lm.py \
      --out "$OUT" --geometry v5 --curriculum full \
      --init-from "$INIT" --steps "$CHUNK_STEPS" \
      --lr 1.5e-4 --seed $((500 + i)) \
      --pipeline-frac 0.3 --short-mix 0.15 --lookup-frac 0.1 \
      --family-weights 0.15 0.15 0.2 0.2 0.3 0.0 \
      --eval-samples 0 >> "$LOG" 2>&1
  fi
done
echo "=== ladder done $(date) ===" >> "$LOG"
