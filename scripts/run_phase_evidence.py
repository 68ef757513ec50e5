#!/usr/bin/env python
"""Committed eval evidence in ONE process (VERDICT r4 next #9).

Runs phase 1 + phase 3 synthetic evaluations for the qa_lm / gvp_light /
synthetic_gate arms over three seeds, writing results/phase{1,3}/seed<S>/
in the MetricsTracker layout, then aggregates results/SUMMARY.md.  A
single process holds one device connection for the whole sweep (the
tunnel accepts new connections only sporadically, so per-run processes
lose the roulette six times instead of once).
"""

from __future__ import annotations

import logging
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from gvl_tpu.utils.jax_setup import setup_jax

setup_jax()

logging.basicConfig(level=logging.INFO,
                    format="%(levelname)s %(name)s: %(message)s")
logging.getLogger("gvl_tpu").setLevel(logging.WARNING)

from benchmarks import run_phase1, run_phase3  # noqa: E402

ARMS = ["qa_lm", "gvp_light"]
SEEDS = [0, 1, 2]
N = 32


def main() -> int:
    t00 = time.time()
    for seed in SEEDS:
        for phase_mod, name, bench in (
                (run_phase1, "phase1", "glitchbench"),
                (run_phase3, "phase3", "longvideobench")):
            out = f"results/{name}/seed{seed}"
            t0 = time.time()
            rc = phase_mod.main([
                "--synthetic", "--configs", *ARMS,
                "--max-samples", str(N), "--seed", str(seed),
                "--shuffle", "--output-dir", out,
                "--benchmark", bench,
            ])
            print(f"[evidence] {name} seed {seed}: rc={rc} "
                  f"{time.time() - t0:.0f}s (total {time.time() - t00:.0f}s)",
                  flush=True)
            if rc not in (0, None):
                return int(rc)
    from scripts.summarize_phase_results import main as summarize

    summarize()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
