"""JAX/Flax model definitions for every family the framework ships."""

from gvl_tpu.models.projector import MultiModalProjector, ProjectorBank

__all__ = ["MultiModalProjector", "ProjectorBank"]
