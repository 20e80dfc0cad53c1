"""Parallelism: device meshes and sharding rules (dp x tp over ICI)."""

from .mesh import make_mesh, replicated, shard, single_chip_mesh
from .sharding import (
    apply_shardings,
    cache_sharding,
    llama_param_shardings,
    vision_param_shardings,
    vit_param_shardings,
)

__all__ = [
    "make_mesh",
    "single_chip_mesh",
    "replicated",
    "shard",
    "apply_shardings",
    "cache_sharding",
    "llama_param_shardings",
    "vision_param_shardings",
    "vit_param_shardings",
]
