"""Multi-process (multi-host) wiring: initialization + global batch assembly.

The reference trains multi-node DDP through Lightning/torch.distributed
(``conf/phase-vg/fit.yaml:11-16``, ``mmmm/data/datamodule.py:104-111``). The
TPU-native equivalent is JAX multi-controller SPMD:

  - every process calls ``jax.distributed.initialize`` (here, with env-var
    fallbacks so launchers only need COORDINATOR_ADDRESS/NUM_PROCESSES/
    PROCESS_ID — on Cloud TPU pods all three auto-detect);
  - the device mesh spans *global* devices; each process feeds its local
    shard of the batch and ``jax.make_array_from_process_local_data``
    assembles the logically-global array;
  - the sampler takes ``rank = jax.process_index()`` so hosts read disjoint
    example streams (``data/sampling.py`` per-host sharding).

Single-process runs skip all of this: every helper is a no-op fallback, so
the same trainer code serves one chip and a pod.
"""
from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize the multi-process runtime. Returns True when multi-process.

    Resolution order: explicit args -> env (COORDINATOR_ADDRESS, NUM_PROCESSES,
    PROCESS_ID) -> cloud auto-detection (args all None). A single-process run
    (no coordinator anywhere) is a no-op returning False.
    """
    # probe initialization WITHOUT jax.process_count(): that would initialize
    # the XLA backend, after which jax.distributed.initialize refuses to run
    from jax._src import distributed as _dist

    if getattr(_dist.global_state, "client", None) is not None:
        return jax.process_count() > 1  # already initialized
    coordinator_address = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    env_np = os.environ.get("NUM_PROCESSES")
    env_pid = os.environ.get("PROCESS_ID")
    num_processes = num_processes if num_processes is not None else (
        int(env_np) if env_np else None
    )
    process_id = process_id if process_id is not None else (
        int(env_pid) if env_pid else None
    )
    if coordinator_address is None and num_processes is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_count() > 1


def process_rank() -> tuple[int, int]:
    """(rank, world_size) for the per-host sampler sharding."""
    return jax.process_index(), jax.process_count()


def global_batch(batch, mesh: Mesh):
    """Assemble process-local batch shards into global arrays.

    Each process passes its local slice (leading dim = global_batch /
    process_count); returns jax.Arrays sharded ``P("data", ...)`` over the
    mesh. Non-array leaves pass through. Single-process: a plain device_put
    with the same shardings (identical call-site semantics).
    """

    def place(leaf):
        if not hasattr(leaf, "ndim") or leaf.ndim == 0:
            return leaf
        spec = P("data", *([None] * (leaf.ndim - 1)))
        sharding = NamedSharding(mesh, spec)
        if jax.process_count() == 1:
            return jax.device_put(np.asarray(leaf), sharding)
        return jax.make_array_from_process_local_data(sharding, np.asarray(leaf))

    return jax.tree_util.tree_map(place, batch)
