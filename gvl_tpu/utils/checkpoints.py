"""Flat-npz checkpoint IO + repo-relative path resolution.

One implementation for every artifact family (segmenter, OCR, HiCo):
params trees serialize as ``np.savez`` with ``/``-joined key paths, and
preset-default checkpoint paths like ``outputs/sam_params.npz`` resolve
relative to the repo root so library callers work from any CWD.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np

_REPO_ROOT = Path(__file__).resolve().parents[2]


def resolve_repo_path(path) -> Optional[str]:
    """Path as given if it exists, else relative to the repo root."""
    if not path:
        return None
    p = Path(path)
    if p.exists():
        return str(p)
    rooted = _REPO_ROOT / p
    return str(rooted) if rooted.exists() else None


def _escape(part: str) -> str:
    return part.replace("\\", "\\\\").replace("/", "\\/")


def _split_key(key: str) -> tuple:
    """Split on ``/`` not preceded by a backslash, then unescape.

    Param names may themselves contain ``/`` (the Whisper encoder's
    ``conv1/kernel``); those are escaped as ``\\/`` at save time.  Keys
    written before escaping existed contain no backslashes, so they
    split identically under both schemes.
    """
    parts, cur, i = [], [], 0
    while i < len(key):
        ch = key[i]
        if ch == "\\" and i + 1 < len(key):
            cur.append(key[i + 1])
            i += 2
        elif ch == "/":
            parts.append("".join(cur))
            cur = []
            i += 1
        else:
            cur.append(ch)
            i += 1
    parts.append("".join(cur))
    return tuple(parts)


def save_flat_npz(tree: dict, path) -> None:
    from flax.traverse_util import flatten_dict

    flat = {"/".join(_escape(p) for p in k): np.asarray(v)
            for k, v in flatten_dict(tree).items()}
    np.savez(path, **flat)


def load_flat_npz(path) -> dict:
    import jax.numpy as jnp
    from flax.traverse_util import unflatten_dict

    with np.load(path) as data:
        flat = {_split_key(k): jnp.asarray(data[k]) for k in data}
    return unflatten_dict(flat)
