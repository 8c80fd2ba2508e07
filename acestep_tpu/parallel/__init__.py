from .mesh import TopologyTier, make_mesh, tier_for
from .sharding import replicate, shard_batch, shard_params, spec_for_path

__all__ = [
    "TopologyTier",
    "make_mesh",
    "tier_for",
    "replicate",
    "shard_batch",
    "shard_params",
    "spec_for_path",
]
