from .mesh import make_mesh, chain_sharding
from .sharded import shard_chain_fn

__all__ = ["make_mesh", "chain_sharding", "shard_chain_fn"]
