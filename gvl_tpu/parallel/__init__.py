"""Distribution substrate: device meshes, sharding rules, collectives.

The reference has no distributed layer at all (SURVEY.md §2.4) — this
package is the TPU-native replacement: a :class:`MeshManager` that builds
``jax.sharding.Mesh`` objects sized to the attached topology, and a
rule-based partition-spec registry applied to parameter pytrees.
"""

from gvl_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    MeshManager,
    build_mesh,
    init_distributed,
    local_device_count,
)
from gvl_tpu.parallel.sharding import (
    ShardingRules,
    named_sharding,
    shard_pytree,
    spec_for_path,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "MeshManager",
    "build_mesh",
    "init_distributed",
    "local_device_count",
    "ShardingRules",
    "named_sharding",
    "shard_pytree",
    "spec_for_path",
]
