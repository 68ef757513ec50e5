"""Safe loading of reference ``.pt`` artifacts.

Compat paths (projector weights, feature caches, demo embeddings —
reference layouts at ``qwen_reasoning_core.py:1112-1122`` and
``extract_features.py:1432-1468``) may be pointed at downloaded HF-hub
files, which are untrusted content.  These files are plain tensor dicts,
so ``weights_only=True`` suffices; arbitrary-pickle loading is only
attempted when explicitly opted in.
"""

from __future__ import annotations

import logging
from pathlib import Path

logger = logging.getLogger(__name__)


def safe_torch_load(path: Path | str, allow_pickle: bool = False):
    """``torch.load`` with ``weights_only=True``; optional legacy fallback.

    With ``allow_pickle=True`` a file that the safe loader rejects is
    retried with full unpickling after a loud warning (for first-party
    legacy artifacts only — never remote downloads).
    """
    import torch

    try:
        return torch.load(path, map_location="cpu", weights_only=True)
    except Exception as exc:
        if not allow_pickle:
            raise
        logger.warning(
            "%s is not loadable with weights_only=True (%s); retrying with "
            "full unpickling — only safe for trusted first-party files",
            path, exc,
        )
        return torch.load(path, map_location="cpu", weights_only=False)
