"""Parallelism: device meshes and sharding rules (dp x tp over ICI).

Two execution styles:
  * auto-SPMD (sharding.py): NamedSharding placement + jit — XLA inserts the
    collectives; right for dense weights and the training step;
  * manual SPMD (spmd.py): shard_map around the decoder — required for REAL
    tensor parallelism of Pallas quantized kernels (no partitioning rule for
    custom calls), with explicit Megatron psums and k-sharded repacks.
"""

from .mesh import make_mesh, replicated, shard, single_chip_mesh
from .sharding import (
    apply_shardings,
    cache_sharding,
    llama_param_shardings,
    vision_param_shardings,
    vit_param_shardings,
)
from .spmd import (
    make_spmd_decode_loop,
    make_spmd_forward,
    place_llama_params,
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
    "place_llama_params",
    "make_spmd_forward",
    "make_spmd_decode_loop",
]
