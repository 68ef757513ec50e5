"""Process-level JAX configuration: persistent compilation cache.

Remote-attached TPUs (the axon tunnel) pay tens of seconds per XLA
compile; enabling JAX's persistent compilation cache makes every
recompile of an already-seen program a disk hit.  Called once, lazily,
by the entry points; a no-op when the user already configured a cache.
"""

from __future__ import annotations

import logging
import os
from pathlib import Path

logger = logging.getLogger(__name__)

_DONE = False


def setup_jax(cache_dir: str | None = None) -> None:
    global _DONE
    if _DONE:
        return
    _DONE = True
    import jax

    # honor an explicit JAX_PLATFORMS before the backend initializes:
    # out-of-tree PJRT plugins (the axon TPU tunnel) win over the env
    # var, so a user running an entry script with JAX_PLATFORMS=cpu
    # would silently get the tunnel-attached TPU — and tunnel dispatch
    # latency on a CPU-shaped workload is pathological
    requested = os.environ.get("JAX_PLATFORMS", "")
    if requested:
        try:
            jax.config.update("jax_platforms", requested)
        except Exception:
            pass

    target = (
        cache_dir
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or str(Path.home() / ".cache" / "gvl_tpu_xla")
    )
    try:
        # CPU executables are AOT-compiled for the exact host CPU; cached
        # blobs break (or spam SIGILL-risk load errors) when the session
        # migrates hosts, and CPU compiles are cheap anyway.  The cache
        # exists for the accelerator (a tunnel-attached TPU pays tens of
        # seconds per compile), so enable it only there.
        backend = jax.default_backend()
        if backend not in ("tpu",):
            logger.debug(
                "persistent compile cache skipped on %s backend", backend)
            return
        Path(target).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", target)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        logger.info("XLA compilation cache at %s", target)
    except Exception as exc:  # never fatal
        logger.debug("compilation cache setup failed: %s", exc)
