from .mesh import make_mesh
from .sharding import param_shardings, batch_shardings, PartitionRules

__all__ = ["make_mesh", "param_shardings", "batch_shardings", "PartitionRules"]
