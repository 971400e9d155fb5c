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
from jax import lax

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


def lap_rectangular(cost: jnp.ndarray) -> jnp.ndarray:
    """Exact rectangular linear-sum assignment, fully in-jit.

    ``cost`` is (K, Q) with K <= Q (every row gets a distinct column).
    Returns ``col4row`` of shape (K,) int32 minimizing the summed cost —
    equivalent to ``scipy.optimize.linear_sum_assignment(cost)[1]``.

    Jonker-Volgenant shortest-augmenting-path: one Dijkstra pass per row over
    the reduced-cost graph, all in static-shape ``lax.while_loop``s (the DETR
    matcher regime: K = padded GT count ~ 8-32, Q = query count ~ 100-900,
    where the N! enumeration above is impossible). vmap over a batch works —
    loops mask out finished lanes.
    """
    k, q = cost.shape
    if k > q:
        raise ValueError(f"lap_rectangular expects K <= Q, got {cost.shape}")
    cost = cost.astype(jnp.float32)
    big = jnp.float32(jnp.finfo(jnp.float32).max)

    def solve_row(carry, cur_row):
        u, v, col4row, row4col = carry

        # --- Dijkstra from cur_row until an unassigned column is reached
        def dij_cond(s):
            _, _, _, _, sink, _ = s
            return sink < 0

        def dij_body(s):
            i, min_val, shortest, path, sink, state = s
            sr, sc = state  # scanned rows (K,) / cols (Q,) bool
            sr = sr.at[i].set(True)
            reduced = min_val + cost[i] - u[i] - v  # (Q,)
            better = (~sc) & (reduced < shortest)
            shortest = jnp.where(better, reduced, shortest)
            path = jnp.where(better, i, path)
            masked = jnp.where(sc, big, shortest)
            j = jnp.argmin(masked)
            min_val = masked[j]
            sc = sc.at[j].set(True)
            nxt = row4col[j]
            sink = jnp.where(nxt < 0, j, -1)
            return (jnp.maximum(nxt, 0), min_val, shortest, path, sink, (sr, sc))

        init = (
            cur_row,
            jnp.float32(0),
            jnp.full((q,), big),
            jnp.full((q,), -1, jnp.int32),
            jnp.int32(-1),
            (jnp.zeros((k,), bool), jnp.zeros((q,), bool)),
        )
        _, min_val, shortest, path, sink, (sr, sc) = lax.while_loop(
            dij_cond, dij_body, init
        )

        # --- dual updates (scipy _lsap semantics)
        u = u.at[cur_row].add(min_val)
        other = sr & (jnp.arange(k) != cur_row)
        u = u + jnp.where(other, min_val - shortest[jnp.clip(col4row, 0)], 0.0)
        v = v + jnp.where(sc, shortest - min_val, 0.0)

        # --- augment: walk predecessors back from the sink
        def aug_cond(s):
            _, _, _, done = s
            return ~done

        def aug_body(s):
            j, col4row, row4col, _ = s
            i = path[j]
            row4col = row4col.at[j].set(i)
            jnext = col4row[i]
            col4row = col4row.at[i].set(j)
            return (jnext, col4row, row4col, i == cur_row)

        _, col4row, row4col, _ = lax.while_loop(
            aug_cond, aug_body, (sink, col4row, row4col, False)
        )
        return (u, v, col4row, row4col), None

    carry0 = (
        jnp.zeros((k,)),
        jnp.zeros((q,)),
        jnp.full((k,), -1, jnp.int32),
        jnp.full((q,), -1, jnp.int32),
    )
    (u, v, col4row, row4col), _ = lax.scan(solve_row, carry0, jnp.arange(k, dtype=jnp.int32))
    return col4row
