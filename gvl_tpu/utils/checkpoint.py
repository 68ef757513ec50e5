"""Orbax-backed checkpointing for model/optimizer state.

The reference has no optimizer-state or mid-epoch resume (SURVEY §5.4);
this provides both: versioned step checkpoints with retention, saving any
pytree (params, opt_state, host metadata) and restoring onto the current
mesh.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any, Optional

logger = logging.getLogger(__name__)


class CheckpointManager:
    """Thin wrapper over orbax.checkpoint.CheckpointManager.

    >>> mgr = CheckpointManager("checkpoints/run1", max_to_keep=3)
    >>> mgr.save(step=100, state={"params": params, "opt": opt_state})
    >>> state = mgr.restore()                 # latest
    >>> state = mgr.restore(step=100)
    """

    def __init__(self, directory: str | Path, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self._manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True,
            ),
        )

    def save(self, step: int, state: Any, force: bool = False) -> bool:
        import orbax.checkpoint as ocp

        saved = self._manager.save(
            step, args=ocp.args.StandardSave(state), force=force
        )
        self._manager.wait_until_finished()
        if saved:
            logger.info("checkpoint saved at step %d -> %s", step,
                        self.directory)
        return bool(saved)

    def restore(self, step: Optional[int] = None,
                template: Any = None) -> Any:
        import orbax.checkpoint as ocp

        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        if template is not None:
            return self._manager.restore(
                step, args=ocp.args.StandardRestore(template)
            )
        return self._manager.restore(step)

    def latest_step(self) -> Optional[int]:
        return self._manager.latest_step()

    def all_steps(self) -> list[int]:
        return list(self._manager.all_steps())

    def close(self) -> None:
        self._manager.close()
