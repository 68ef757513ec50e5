"""Shared utilities: stage profiling, logging, timestamp helpers."""

from gvl_tpu.utils.profiler import StageTimer, stage_scope
from gvl_tpu.utils.jax_setup import setup_jax

__all__ = ["StageTimer", "stage_scope", "setup_jax"]
