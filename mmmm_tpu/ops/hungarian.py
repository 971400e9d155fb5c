"""Exact linear-sum assignment for small fixed-size cost matrices, in-jit.

The reference's DETR-style instance matcher calls SciPy's C implementation on
the host every step (``mmmm/models/segvol/modeling/sam.py:243``), forcing a
device->host sync. Here the query count is tiny and static (``num_instances=6``
per ``conf/phase-vg/model.yaml``), so the exact optimum is found by scoring all
N! permutations with one gather + reduction — fully jittable, vmappable, and
synchronization-free. N <= 8 keeps the table at most 40320 x 8.
"""
from __future__ import annotations

import functools
import itertools

import jax.numpy as jnp
import numpy as np

_MAX_N = 8


@functools.lru_cache(maxsize=None)
def _permutation_table(n: int) -> np.ndarray:
    if n > _MAX_N:
        raise ValueError(f"hungarian: n={n} exceeds exact-enumeration limit {_MAX_N}")
    return np.array(list(itertools.permutations(range(n))), dtype=np.int32)


def hungarian(cost: jnp.ndarray) -> jnp.ndarray:
    """Return ``col`` of shape (N,) minimizing ``sum_i cost[i, col[i]]``.

    ``cost`` must be a square (N, N) matrix with N <= 8. Equivalent to
    ``scipy.optimize.linear_sum_assignment(cost)[1]``.
    """
    n = cost.shape[-1]
    if cost.shape[-2] != n:
        raise ValueError(f"hungarian expects a square matrix, got {cost.shape}")
    perms = jnp.asarray(_permutation_table(n))  # (P, N)
    rows = jnp.arange(n)[None, :]
    totals = cost[rows, perms].sum(axis=-1)  # (P,)
    return perms[jnp.argmin(totals)]
