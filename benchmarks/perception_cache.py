"""Two-stage evaluation cache: per-video perception artifacts on disk.

Parity surface: `/root/reference/benchmarks/perception_cache.py` — one
directory per video hash holding metadata.json + npz embeddings + JSON
artifacts, a versioned ``CACHE_VERSION`` compatibility gate, an
``index.json`` across entries, and invalidation.
"""

from __future__ import annotations

import hashlib
import json
import logging
import shutil
import time
from pathlib import Path
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

CACHE_VERSION = "1.0.0"

ARRAY_KEYS = ("siglip", "videomae", "wav2vec2")
JSON_KEYS = ("sam_entities", "ocr", "audio", "timeline", "kb")


def video_cache_key(video_path: str) -> str:
    """md5(path:size:mtime) — matches the reference scheme."""
    p = Path(video_path)
    if p.exists():
        stat = p.stat()
        payload = f"{video_path}:{stat.st_size}:{stat.st_mtime}"
    else:
        payload = video_path  # synthetic:// and friends
    return hashlib.md5(payload.encode()).hexdigest()


class PerceptionCache:
    """Directory-per-video artifact cache for Stage A/B evaluation."""

    def __init__(self, cache_dir: str | Path = "data/benchmark_cache"):
        self.cache_dir = Path(cache_dir)
        self.cache_dir.mkdir(parents=True, exist_ok=True)
        self._index_path = self.cache_dir / "index.json"

    def _entry(self, video_path: str) -> Path:
        return self.cache_dir / video_cache_key(video_path)

    def has(self, video_path: str) -> bool:
        meta = self._entry(video_path) / "metadata.json"
        if not meta.exists():
            return False
        try:
            doc = json.loads(meta.read_text())
            return doc.get("cache_version") == CACHE_VERSION
        except Exception:
            return False

    def save(
        self,
        video_path: str,
        arrays: Optional[dict[str, np.ndarray]] = None,
        artifacts: Optional[dict[str, object]] = None,
    ) -> Path:
        entry = self._entry(video_path)
        entry.mkdir(parents=True, exist_ok=True)
        meta = {
            "cache_version": CACHE_VERSION,
            "video_path": str(video_path),
            "created_at": time.time(),
            "arrays": [],
            "artifacts": [],
        }
        for key, arr in (arrays or {}).items():
            np.savez_compressed(entry / f"{key}.npz", data=np.asarray(arr))
            meta["arrays"].append(key)
        for key, doc in (artifacts or {}).items():
            (entry / f"{key}.json").write_text(json.dumps(doc, default=str))
            meta["artifacts"].append(key)
        (entry / "metadata.json").write_text(json.dumps(meta, indent=2))
        self._update_index(video_path, entry)
        return entry

    def load(self, video_path: str) -> Optional[dict]:
        if not self.has(video_path):
            return None
        entry = self._entry(video_path)
        meta = json.loads((entry / "metadata.json").read_text())
        out: dict = {"metadata": meta}
        for key in meta.get("arrays", []):
            with np.load(entry / f"{key}.npz") as z:
                out[key] = z["data"]
        for key in meta.get("artifacts", []):
            out[key] = json.loads((entry / f"{key}.json").read_text())
        return out

    def invalidate(self, video_path: str) -> bool:
        entry = self._entry(video_path)
        if entry.exists():
            shutil.rmtree(entry)
            return True
        return False

    def clear(self) -> None:
        for child in self.cache_dir.iterdir():
            if child.is_dir():
                shutil.rmtree(child, ignore_errors=True)
        self._index_path.unlink(missing_ok=True)

    def _update_index(self, video_path: str, entry: Path) -> None:
        index = {}
        if self._index_path.exists():
            try:
                index = json.loads(self._index_path.read_text())
            except Exception:
                index = {}
        index[video_cache_key(video_path)] = {
            "video_path": str(video_path),
            "entry": entry.name,
            "updated_at": time.time(),
        }
        self._index_path.write_text(json.dumps(index, indent=2))

    def get_statistics(self) -> dict:
        entries = [p for p in self.cache_dir.iterdir() if p.is_dir()]
        return {
            "cache_version": CACHE_VERSION,
            "num_entries": len(entries),
            "total_size_mb": sum(
                f.stat().st_size for p in entries for f in p.rglob("*")
                if f.is_file()
            ) / 1024 ** 2,
        }


def create_perception_cache(
    cache_dir: str = "data/benchmark_cache",
) -> PerceptionCache:
    return PerceptionCache(cache_dir)
