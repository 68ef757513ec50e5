"""Shared utilities: stage profiling, logging, timestamp helpers."""

from gvl_tpu.utils.profiler import StageTimer, stage_scope

__all__ = ["StageTimer", "stage_scope"]
