"""Stage-parallel perception pipeline over multiple devices.

The reference lists "Multi-GPU Parallelization (pipeline parallelism:
SAM3, SigLIP, OCR on separate GPUs; async frame queues; 3-5x with 4
GPUs)" as unimplemented Future Work (`/root/reference/README.md:851-855`).
This is that feature, TPU-native: each perception stage is a jitted
program pinned to its own device (chip or mesh slice); frames stream
through bounded queues, so stage N processes frame i while stage N-1
works on frame i+1 — classic software pipelining with device-level
parallelism and backpressure.
"""

from __future__ import annotations

import logging
import queue
import threading
from dataclasses import dataclass, field
from typing import Any, Callable, Iterable, Iterator, Optional, Sequence

import jax

logger = logging.getLogger(__name__)

_STOP = object()


@dataclass
class PipelineStage:
    """One pipeline stage: a callable pinned to a device.

    ``fn(item) -> item`` receives the previous stage's output.  When
    ``device`` is set, array inputs are placed there before the call, so
    a jitted fn executes on that device.
    """

    name: str
    fn: Callable[[Any], Any]
    device: Optional[jax.Device] = None

    def run(self, item: Any) -> Any:
        if self.device is not None:
            item = jax.tree.map(
                lambda leaf: (
                    jax.device_put(leaf, self.device)
                    if isinstance(leaf, (jax.Array,)) else leaf
                ),
                item,
            )
        return self.fn(item)


@dataclass
class _Envelope:
    index: int
    payload: Any
    error: Optional[BaseException] = None


class PerceptionPipeline:
    """Runs items through stages with one worker thread per stage.

    >>> pipeline = PerceptionPipeline([
    ...     PipelineStage("segment", segment_fn, devices[0]),
    ...     PipelineStage("encode", encode_fn, devices[1]),
    ...     PipelineStage("ocr", ocr_fn, devices[2]),
    ... ])
    >>> for result in pipeline.run(frames):
    ...     ...
    """

    def __init__(self, stages: Sequence[PipelineStage], queue_depth: int = 4):
        if not stages:
            raise ValueError("need at least one stage")
        self.stages = list(stages)
        self.queue_depth = queue_depth
        self.stage_counts = {s.name: 0 for s in self.stages}

    def run(self, items: Iterable[Any]) -> Iterator[Any]:
        """Stream items through all stages; yields outputs in order."""
        queues: list[queue.Queue] = [
            queue.Queue(maxsize=self.queue_depth)
            for _ in range(len(self.stages) + 1)
        ]

        def worker(stage: PipelineStage, q_in: queue.Queue,
                   q_out: queue.Queue) -> None:
            while True:
                envelope = q_in.get()
                if envelope is _STOP:
                    q_out.put(_STOP)
                    return
                if envelope.error is None:
                    try:
                        envelope.payload = stage.run(envelope.payload)
                        self.stage_counts[stage.name] += 1
                    except BaseException as exc:  # propagate to consumer
                        envelope.error = exc
                q_out.put(envelope)

        threads = [
            threading.Thread(
                target=worker, args=(stage, queues[i], queues[i + 1]),
                daemon=True, name=f"pipeline-{stage.name}",
            )
            for i, stage in enumerate(self.stages)
        ]
        for t in threads:
            t.start()

        def feeder() -> None:
            for i, item in enumerate(items):
                queues[0].put(_Envelope(index=i, payload=item))
            queues[0].put(_STOP)

        feed_thread = threading.Thread(target=feeder, daemon=True,
                                       name="pipeline-feed")
        feed_thread.start()

        while True:
            envelope = queues[-1].get()
            if envelope is _STOP:
                break
            if envelope.error is not None:
                raise envelope.error
            yield envelope.payload
        for t in threads:
            t.join()
        feed_thread.join()


def assign_stage_devices(
    num_stages: int, devices: Optional[Sequence[jax.Device]] = None
) -> list[Optional[jax.Device]]:
    """Round-robin stages over the available devices (None = default)."""
    devs = list(devices if devices is not None else jax.devices())
    if not devs:
        return [None] * num_stages
    return [devs[i % len(devs)] for i in range(num_stages)]


def build_perception_pipeline(
    stage_fns: dict[str, Callable],
    devices: Optional[Sequence[jax.Device]] = None,
    queue_depth: int = 4,
) -> PerceptionPipeline:
    """Convenience constructor: {name: fn} → device-assigned pipeline."""
    assigned = assign_stage_devices(len(stage_fns), devices)
    stages = [
        PipelineStage(name, fn, device)
        for (name, fn), device in zip(stage_fns.items(), assigned)
    ]
    return PerceptionPipeline(stages, queue_depth=queue_depth)
