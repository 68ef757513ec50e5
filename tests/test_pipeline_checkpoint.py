"""Stage-parallel pipeline + Orbax checkpoint manager."""

import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gvl_tpu.parallel.pipeline import (
    PerceptionPipeline,
    PipelineStage,
    assign_stage_devices,
    build_perception_pipeline,
)
from gvl_tpu.utils.checkpoint import CheckpointManager


class TestPipeline:
    def test_results_in_order_and_correct(self):
        devices = jax.devices()
        stages = [
            PipelineStage("a", jax.jit(lambda x: x + 1), devices[0]),
            PipelineStage("b", jax.jit(lambda x: x * 2), devices[1]),
            PipelineStage("c", jax.jit(lambda x: x - 3), devices[2]),
        ]
        pipeline = PerceptionPipeline(stages, queue_depth=2)
        inputs = [jnp.full((4,), i, jnp.float32) for i in range(10)]
        outputs = list(pipeline.run(inputs))
        for i, out in enumerate(outputs):
            np.testing.assert_allclose(np.asarray(out), (i + 1) * 2 - 3)
        assert pipeline.stage_counts == {"a": 10, "b": 10, "c": 10}

    def test_stages_overlap(self):
        """With sleeps in each stage, pipelined wall time ≈ max-stage·n,
        not sum-of-stages·n."""
        active = {"concurrent": 0, "max_concurrent": 0}
        lock = threading.Lock()

        def make(name):
            def fn(x):
                with lock:
                    active["concurrent"] += 1
                    active["max_concurrent"] = max(
                        active["max_concurrent"], active["concurrent"])
                time.sleep(0.02)
                with lock:
                    active["concurrent"] -= 1
                return x
            return fn

        pipeline = PerceptionPipeline([
            PipelineStage("s1", make("s1")),
            PipelineStage("s2", make("s2")),
            PipelineStage("s3", make("s3")),
        ])
        t0 = time.perf_counter()
        list(pipeline.run(range(12)))
        elapsed = time.perf_counter() - t0
        assert active["max_concurrent"] >= 2  # stages truly overlapped
        assert elapsed < 12 * 3 * 0.02  # faster than sequential

    def test_error_propagates(self):
        def boom(x):
            if x == 3:
                raise ValueError("bad frame")
            return x

        pipeline = PerceptionPipeline([PipelineStage("s", boom)])
        with pytest.raises(ValueError, match="bad frame"):
            list(pipeline.run(range(5)))

    def test_device_assignment_round_robin(self):
        devices = jax.devices()
        assigned = assign_stage_devices(10, devices)
        assert assigned[0] == devices[0]
        assert assigned[8] == devices[0]  # wraps at 8 CPU devices

    def test_builder(self):
        pipeline = build_perception_pipeline({
            "inc": lambda x: x + 1,
            "dbl": lambda x: x * 2,
        })
        assert [s.name for s in pipeline.stages] == ["inc", "dbl"]
        assert list(pipeline.run([1, 2])) == [4, 6]


class TestCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path):
        mgr = CheckpointManager(tmp_path / "ckpt", max_to_keep=2)
        state = {
            "params": {"w": jnp.arange(8, dtype=jnp.float32)},
            "step": np.int64(100),
        }
        assert mgr.save(100, state)
        restored = mgr.restore()
        np.testing.assert_array_equal(
            np.asarray(restored["params"]["w"]), np.arange(8))
        mgr.close()

    def test_retention(self, tmp_path):
        mgr = CheckpointManager(tmp_path / "ckpt", max_to_keep=2)
        for step in (1, 2, 3):
            mgr.save(step, {"x": jnp.ones(2) * step})
        assert mgr.latest_step() == 3
        assert len(mgr.all_steps()) == 2  # oldest evicted
        mgr.close()

    def test_restore_missing_raises(self, tmp_path):
        mgr = CheckpointManager(tmp_path / "empty")
        with pytest.raises(FileNotFoundError):
            mgr.restore()
        mgr.close()
