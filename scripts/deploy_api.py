#!/usr/bin/env python
"""Serve the gameplay-video QA pipeline over HTTP.

(The reference ships this file EMPTY — `/root/reference/scripts/deploy_api.py`
is 0 bytes; see SURVEY.md §1.)
"""

from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from gvl_tpu.utils.jax_setup import setup_jax

setup_jax()

from gvl_tpu.config import load_preset
from gvl_tpu.serving import serve


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8080)
    parser.add_argument("--preset", default="light",
                        choices=["light", "standard", "full"])
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO,
                        format="%(levelname)s %(name)s: %(message)s")
    serve(args.host, args.port, load_preset(args.preset))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
