#!/usr/bin/env python
"""Phase 1 evaluation: GlitchBench + PhysGame (glitch & physics detection).

CLI parity with `/root/reference/benchmarks/run_phase1.py`.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from benchmarks.loaders.glitchbench import GlitchBenchLoader
from benchmarks.loaders.physgame import PhysGameLoader
from benchmarks.phase_runner import run_phase


def _extra(parser):
    parser.add_argument("--benchmark", default="all",
                        choices=["glitchbench", "physgame", "all"])


def main(argv=None) -> int:
    import argparse

    # peek at --benchmark to choose loaders
    peek = argparse.ArgumentParser(add_help=False)
    peek.add_argument("--benchmark", default="all")
    known, _ = peek.parse_known_args(argv)

    factories = []
    if known.benchmark in ("glitchbench", "all"):
        factories.append(lambda cfg: GlitchBenchLoader(cfg))
    if known.benchmark in ("physgame", "all"):
        factories.append(lambda cfg: PhysGameLoader(cfg))

    return run_phase(
        "phase1", __doc__, factories, argv=argv, extra_args=_extra,
    )


if __name__ == "__main__":
    raise SystemExit(main())
