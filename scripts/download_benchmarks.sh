#!/usr/bin/env bash
# Download benchmark datasets into data/benchmarks/ (network required).
#
# Parity surface: /root/reference/scripts/download_benchmarks.sh —
# GlitchBench (HF parquet), PhysGame, VideoGameQA-Bench, LongVideoBench,
# MLVU annotations. In zero-egress environments, run the phase runners
# with --synthetic instead.
set -euo pipefail

ROOT="${1:-data/benchmarks}"
mkdir -p "$ROOT"

hf_snapshot() {  # repo_id dest [repo_type]
  python - "$1" "$2" "${3:-dataset}" <<'PY'
import sys
from huggingface_hub import snapshot_download
repo_id, dest, repo_type = sys.argv[1], sys.argv[2], sys.argv[3]
snapshot_download(repo_id=repo_id, local_dir=dest, repo_type=repo_type)
print(f"downloaded {repo_id} -> {dest}")
PY
}

echo "== GlitchBench (CVPR 2024, 593 glitches) =="
hf_snapshot "sail-sg/GlitchBench" "$ROOT/glitchbench" || true

echo "== PhysGame (880 physics-violation videos) =="
hf_snapshot "PhysGame/PhysGame-Benchmark" "$ROOT/physgame" || true

echo "== VideoGameQA-Bench (NeurIPS 2025) =="
hf_snapshot "taesiri/VideoGameQA-Bench" "$ROOT/videogameqa" || true

echo "== LongVideoBench (6678 MCQ) =="
hf_snapshot "longvideobench/LongVideoBench" "$ROOT/longvideobench" || true

echo "== MLVU annotations (3102 QA) =="
hf_snapshot "MLVU/MLVU" "$ROOT/mlvu" || true

echo "done. Point the phase runners at --data-dir $ROOT/<benchmark>."
