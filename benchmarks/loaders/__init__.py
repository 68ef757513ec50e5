"""Benchmark data loaders in the unified sample schema."""

from benchmarks.loaders.base import (
    AnswerFormat,
    BenchmarkConfig,
    BenchmarkLoader,
    BenchmarkSample,
    TaskType,
)
from benchmarks.loaders.glitchbench import GlitchBenchLoader, create_glitchbench_loader
from benchmarks.loaders.physgame import PhysGameLoader, create_physgame_loader
from benchmarks.loaders.videogameqa import (
    VideoGameQALoader,
    create_videogameqa_loader,
)
from benchmarks.loaders.longvideo import (
    LongVideoBenchLoader,
    MLVULoader,
    create_longvideobench_loader,
    create_mlvu_loader,
)

__all__ = [
    "TaskType",
    "AnswerFormat",
    "BenchmarkSample",
    "BenchmarkConfig",
    "BenchmarkLoader",
    "GlitchBenchLoader",
    "create_glitchbench_loader",
    "PhysGameLoader",
    "create_physgame_loader",
    "VideoGameQALoader",
    "create_videogameqa_loader",
    "LongVideoBenchLoader",
    "create_longvideobench_loader",
    "MLVULoader",
    "create_mlvu_loader",
]
