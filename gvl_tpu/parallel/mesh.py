"""Device-mesh construction sized to whatever topology is attached.

Axis convention used across the framework:

- ``data``  — batch dimension (data parallel; gradients all-reduce here)
- ``model`` — weight dimension (tensor parallel; activations all-gather /
  reduce-scatter here, riding ICI)

Presets *request* a shape (:class:`gvl_tpu.config.presets.MeshConfig`);
:func:`build_mesh` shrinks the request to fit the real device count so the
same config runs on one chip, a v5e-8, or an 8-device virtual CPU mesh.
"""

from __future__ import annotations

import logging
import math
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

logger = logging.getLogger(__name__)

DATA_AXIS = "data"
MODEL_AXIS = "model"


def local_device_count() -> int:
    return len(jax.devices())


def _fit_axes(requested_data: int, requested_model: int, n: int) -> tuple[int, int]:
    """Shrink a requested (data, model) shape onto ``n`` devices.

    Preference order: keep the model axis as close to the request as
    possible (TP needs contiguous fast links), then grow data with the
    remainder.  Both axes always divide ``n`` exactly.
    """
    model = math.gcd(requested_model, n)
    # prefer the largest divisor of n that is <= requested_model
    for cand in range(min(requested_model, n), 0, -1):
        if n % cand == 0:
            model = cand
            break
    data = n // model
    if (data, model) != (requested_data, requested_model):
        logger.info(
            "mesh request (%d, %d) fitted to (%d, %d) over %d device(s)",
            requested_data, requested_model, data, model, n,
        )
    return data, model


def build_mesh(
    data: int = 1,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
    strict: bool = False,
) -> Mesh:
    """Build a 2-D ``(data, model)`` mesh.

    Args:
        data / model: requested axis sizes.
        devices: devices to use (default: all local).
        strict: if True, fail rather than shrink when the request does not
            match the device count.
    """
    devs = list(devices if devices is not None else jax.devices())
    n = len(devs)
    if strict:
        if data * model != n:
            raise ValueError(
                f"mesh {data}x{model} needs {data * model} devices, have {n}"
            )
        d, m = data, model
    else:
        d, m = _fit_axes(data, model, n)
    grid = np.array(devs).reshape(d, m)
    return Mesh(grid, axis_names=(DATA_AXIS, MODEL_AXIS))


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize multi-host JAX (ICI within a slice, DCN across hosts).

    Safe to call unconditionally: a single-process run (no coordinator
    configured and no TPU pod environment) is a no-op returning False.
    On Cloud TPU pods all three arguments auto-detect from the metadata
    service, so ``init_distributed()`` alone suffices; elsewhere pass
    them or set ``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID``.  After initialization ``jax.devices()`` spans
    every host, and :func:`build_mesh` lays the (data, model) axes over
    the global device set — model axes should stay within a slice so TP
    collectives ride ICI, with the data axis crossing DCN.
    """
    import os

    coordinator_address = (coordinator_address
                           or os.environ.get("JAX_COORDINATOR_ADDRESS"))
    num_processes = num_processes if num_processes is not None else (
        int(os.environ["JAX_NUM_PROCESSES"])
        if "JAX_NUM_PROCESSES" in os.environ else None)
    process_id = process_id if process_id is not None else (
        int(os.environ["JAX_PROCESS_ID"])
        if "JAX_PROCESS_ID" in os.environ else None)
    on_pod = os.environ.get("TPU_WORKER_HOSTNAMES") or os.environ.get(
        "MEGASCALE_COORDINATOR_ADDRESS")
    if coordinator_address is None and not on_pod:
        logger.debug("single-process run; jax.distributed not initialized")
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    logger.info(
        "jax.distributed initialized: process %d/%d, %d global devices",
        jax.process_index(), jax.process_count(), len(jax.devices()))
    return True


class MeshManager:
    """Owns the framework's mesh and hands out shardings.

    One ``MeshManager`` per process; every pjit'd program in the pipeline
    uses its mesh so XLA lays collectives on the same axes.

    >>> mm = MeshManager.from_preset(load_preset("full"))
    >>> with mm.activate():
    ...     out = jax.jit(step, in_shardings=mm.data_sharding(2))(batch)
    """

    def __init__(self, mesh: Mesh):
        self.mesh = mesh

    @classmethod
    def from_preset(cls, config, devices=None) -> "MeshManager":
        mc = config.mesh
        return cls(build_mesh(mc.data_axis, mc.model_axis, devices=devices))

    @classmethod
    def single_device(cls) -> "MeshManager":
        return cls(build_mesh(1, 1, devices=jax.devices()[:1]))

    @property
    def data_size(self) -> int:
        return self.mesh.shape[DATA_AXIS]

    @property
    def model_size(self) -> int:
        return self.mesh.shape[MODEL_AXIS]

    @property
    def num_devices(self) -> int:
        return self.data_size * self.model_size

    def activate(self):
        """Context manager: make this the ambient mesh for `with_sharding_constraint`."""
        return self.mesh

    def data_sharding(self, ndim: int, batch_dim: int = 0):
        """NamedSharding splitting ``batch_dim`` over the data axis."""
        from gvl_tpu.parallel.sharding import named_sharding

        axes: list[Optional[str]] = [None] * ndim
        axes[batch_dim] = DATA_AXIS
        return named_sharding(self.mesh, *axes)

    def replicated_sharding(self):
        from gvl_tpu.parallel.sharding import named_sharding

        return named_sharding(self.mesh)

    def pad_batch(self, n: int) -> int:
        """Round a batch size up so it divides evenly over the data axis."""
        d = self.data_size
        return ((n + d - 1) // d) * d

    def describe(self) -> str:
        return (
            f"Mesh({self.data_size}x{self.model_size} = {self.num_devices} "
            f"{self.mesh.devices.flat[0].platform} device(s))"
        )
