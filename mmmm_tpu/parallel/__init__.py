from .mesh import make_mesh
from .sharding import param_shardings, batch_shardings, fsdp_shardings, PartitionRules
from .distributed import init_distributed, process_rank, global_batch
from .ring_attention import ring_segment_attention
from .pipeline import pipeline_layers, set_pipe_context, get_pipe_context

__all__ = [
    "make_mesh",
    "param_shardings",
    "batch_shardings",
    "fsdp_shardings",
    "PartitionRules",
    "init_distributed",
    "process_rank",
    "global_batch",
    "ring_segment_attention",
    "pipeline_layers",
    "set_pipe_context",
    "get_pipe_context",
]
