"""Debug-mode distributed consistency checks (SURVEY §5.2).

The reference fights DDP desync manually (dummy zero-loss forwards,
``sync_dist`` toggles, "batch sizes equal across ranks" comments). SPMD
removes that hazard class by construction — every device runs one traced
program — but bugs can still creep in at the *host* boundary: per-process
batch shards with mismatched shapes, samplers drifting out of step, or
non-deterministic host preprocessing. These helpers catch that in debug runs.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map


def check_batch_uniform(batch, mesh: Mesh, axis: str = "data", world_size: int = 1) -> None:
    """Raise if any array leaf's batch dim does not shard evenly over the
    ``axis`` size (the silent-drop DDP failure). ``world_size`` scales a
    process-LOCAL leading dim up to the logical global batch."""
    n = mesh.shape[axis]
    for path, leaf in jax.tree_util.tree_flatten_with_path(batch)[0]:
        if not hasattr(leaf, "ndim") or leaf.ndim == 0:
            continue
        if (leaf.shape[0] * world_size) % n:
            name = "/".join(str(getattr(e, "key", e)) for e in path)
            raise ValueError(
                f"batch[{name}]: global leading dim {leaf.shape[0] * world_size} "
                f"not divisible by {axis}={n}; ranks would receive unequal shards"
            )


def assert_replicated_equal(tree, mesh: Mesh, axis: str = "data", atol: float = 0.0):
    """Verify logically-replicated values really are bitwise-close across the
    ``axis`` ranks (desync detector: optimizer state divergence, stray host
    randomness). Runs an all-gather per leaf — debug-mode cost only."""

    def check_leaf(x):
        if not hasattr(x, "ndim"):
            return
        spec = P(*([None] * x.ndim))

        def gather(v):
            return jax.lax.all_gather(v, axis)

        gathered = shard_map(
            gather, mesh=mesh, in_specs=spec, out_specs=P(axis, *([None] * x.ndim)),
            check_vma=False,
        )(x)
        g = np.asarray(jax.device_get(gathered), np.float32)
        ref = g[0]
        for r in range(1, g.shape[0]):
            if not np.allclose(g[r], ref, atol=atol, rtol=0):
                raise AssertionError(
                    f"replicated value diverges between rank 0 and rank {r}: "
                    f"max|Δ|={np.abs(g[r] - ref).max()}"
                )

    jax.tree_util.tree_map(check_leaf, tree)
