from .mesh import make_mesh
from .sharding import shard_problems, run_views_sharded, exchange_src_depths

__all__ = ["make_mesh", "shard_problems", "run_views_sharded",
           "exchange_src_depths"]
