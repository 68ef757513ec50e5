"""Evaluation infrastructure: loaders, runners, metrics, phase harnesses.

Mirrors the reference's benchmark surface (`/root/reference/benchmarks/`):
Phase 1 = GlitchBench/PhysGame, Phase 2 = VideoGameQA-Bench, Phase 3 =
LongVideoBench/MLVU, plus a generic eval harness and a perception cache.
"""
