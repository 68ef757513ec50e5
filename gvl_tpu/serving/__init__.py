"""HTTP serving API for the perception-reasoning pipeline."""

from gvl_tpu.serving.api import InferenceService, create_server, serve
from gvl_tpu.serving.batch_engine import ContinuousBatchingEngine
from gvl_tpu.serving.engine_server import EngineServer

__all__ = [
    "InferenceService",
    "create_server",
    "serve",
    "ContinuousBatchingEngine",
    "EngineServer",
]
