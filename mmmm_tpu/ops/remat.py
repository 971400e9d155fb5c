"""Rematerialization policies for the layer scans.

``remat=True`` recomputes everything (minimum memory); ``remat="dots"`` saves
matmul outputs and recomputes only elementwise ops — the usual best
memory/compute point on TPU, where recomputing matmuls costs real MXU time
but activations between them are cheap to rebuild.
"""
from __future__ import annotations

import jax


def remat_policy(remat):
    if remat == "dots":
        return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    return None  # full recompute
