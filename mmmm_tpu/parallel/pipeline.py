"""Pipeline parallelism: microbatched GPipe schedule over a ``pipe`` mesh axis.

The reference has no pipeline parallelism (SURVEY §2.7: PP absent; its
training is DDP-only). On TPU, PP is the scaling rung past tensor parallelism:
TP is efficient only within an ICI domain, while a pipeline's point-to-point
activation transfers tolerate the thin DCN links between slices. This module
adds PP the TPU-native way — no torch-style stage processes or NCCL
send/recv; one SPMD program under ``shard_map`` where

  - the stacked (L, ...) decoder-layer parameters shard their leading axis
    over ``pipe`` (each device holds L/S contiguous layers = its stage);
  - the batch splits into M microbatches; at tick t, stage s runs microbatch
    (t - s) — a GPipe schedule of M + S - 1 ticks with bubble fraction
    (S-1)/(M+S-1);
  - activations hop stage s -> s+1 via ``lax.ppermute`` (one neighbor ICI/DCN
    transfer per tick); the final stage's outputs are returned to every
    device with a masked ``psum`` so downstream ops (final norm, LM head,
    losses) stay replicated over ``pipe`` exactly as they are over ``seq``;
  - reverse-mode AD through scan + ppermute yields the backward pipeline
    automatically (transposed ppermute = reversed hops), with per-stage
    parameter gradients landing already sharded over ``pipe``.

Composition: ``pipe`` composes with ``data`` (batch) sharding — inside
``shard_map`` each device sees its local batch shard and its stage chunk.
Tensor parallelism inside a pipeline stage would need manual collectives in
the stage body (shard_map turns off the partitioner within), so pipe x model
meshes are rejected; pick TP (intra-slice) or PP (cross-slice) per axis.

Consumed by ``models/cogvlm/decoder.llm_forward`` when the trainer sets a
pipe context (``TrainerConfig.mesh_pipe``) — the same wiring pattern as ring
attention (``ops/attention.set_ring_context``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

# (mesh, axis, n_micro) set by the trainer; consulted by llm_forward. Same
# pragmatic global pattern as ops.attention._RING_CONTEXT.
_PIPE_CONTEXT: tuple | None = None


def set_pipe_context(mesh, axis: str = "pipe", n_micro: int = 4) -> None:
    """Enable pipelined ``llm_forward``: stage the stacked decoder layers over
    ``mesh[axis]`` with ``n_micro`` microbatches. ``mesh=None`` clears."""
    global _PIPE_CONTEXT
    if mesh is not None and "model" in mesh.axis_names and mesh.shape["model"] > 1:
        raise ValueError(
            "pipeline parallelism does not compose with tensor parallelism "
            "in one mesh (shard_map stages would need manual TP collectives); "
            "use model>1 XOR pipe>1"
        )
    _PIPE_CONTEXT = None if mesh is None else (mesh, axis, n_micro)


def get_pipe_context():
    return _PIPE_CONTEXT


def _batch_spec(mesh, ndim: int) -> P:
    lead = "data" if "data" in mesh.axis_names else None
    return P(lead, *([None] * (ndim - 1)))


def pipeline_layers(
    layer_fn,
    layers_params,
    x: jnp.ndarray,  # (B, S, C) activations
    side: dict,  # pytree of (B, ...) per-batch side inputs
    mesh,
    axis: str = "pipe",
    n_micro: int = 4,
) -> jnp.ndarray:
    """Apply a stack of L layers as an S-stage microbatched pipeline.

    ``layer_fn(h, layer_params, side_micro) -> h`` is one decoder layer over
    one microbatch; ``layers_params`` leaves are stacked (L, ...) with
    L % n_stages == 0. The local batch (B / data) must divide into
    ``n_micro`` microbatches. Returns activations after all L layers,
    replicated over ``axis``.
    """
    n_stages = mesh.shape[axis]

    def body(stage_params, x_loc, side_loc):
        s_idx = lax.axis_index(axis)
        b_loc = x_loc.shape[0]
        mb = b_loc // n_micro
        xm = x_loc.reshape(n_micro, mb, *x_loc.shape[1:])
        sidem = jax.tree.map(
            lambda a: a.reshape(n_micro, mb, *a.shape[1:]), side_loc
        )
        n_ticks = n_micro + n_stages - 1
        perm = [(i, i + 1) for i in range(n_stages - 1)]

        def stage(x_in, side_here):
            def one(h, lp):
                return layer_fn(h, lp, side_here), None

            h, _ = lax.scan(one, x_in, stage_params)
            return h

        def tick(carry, t):
            inp, outs = carry
            # stage 0 injects microbatch t (clamped during drain ticks);
            # stage s>0 consumes the activation that hopped in last tick
            x_in = jnp.where(s_idx == 0, xm[jnp.clip(t, 0, n_micro - 1)], inp)
            mb_here = jnp.clip(t - s_idx, 0, n_micro - 1)
            side_here = jax.tree.map(
                lambda a: lax.dynamic_index_in_dim(a, mb_here, 0, keepdims=False),
                sidem,
            )
            y = stage(x_in, side_here)
            out_idx = jnp.clip(t - (n_stages - 1), 0, n_micro - 1)
            take = (s_idx == n_stages - 1) & (t >= n_stages - 1)
            outs = outs.at[out_idx].set(jnp.where(take, y, outs[out_idx]))
            inp_next = lax.ppermute(y, axis, perm) if perm else y
            return (inp_next, outs), None

        init = (jnp.zeros_like(xm[0]), jnp.zeros_like(xm))
        (_, outs), _ = lax.scan(tick, init, jnp.arange(n_ticks))
        # replicate the last stage's collected outputs to every pipe rank so
        # downstream (norm/head/loss) stays SPMD-replicated over the axis
        outs = lax.psum(
            jnp.where(s_idx == n_stages - 1, outs, jnp.zeros_like(outs)), axis
        )
        return outs.reshape(b_loc, *x_loc.shape[1:])

    param_specs = jax.tree.map(
        lambda a: P(axis, *([None] * (a.ndim - 1))), layers_params
    )
    side_specs = jax.tree.map(lambda a: _batch_spec(mesh, a.ndim), side)
    return shard_map(
        body,
        mesh=mesh,
        in_specs=(param_specs, _batch_spec(mesh, x.ndim), side_specs),
        out_specs=_batch_spec(mesh, x.ndim),
        check_vma=False,
    )(layers_params, x, side)


def pipe_ready(layers_params, batch: int, seq_segments=None) -> bool:
    """Whether the current pipe context can take this call: stacked depth
    divisible by the stage count and local batch divisible by n_micro."""
    ctx = _PIPE_CONTEXT
    if ctx is None:
        return False
    mesh, axis, n_micro = ctx
    n_stages = mesh.shape[axis]
    if n_stages <= 1:
        return False
    depth = jax.tree.leaves(layers_params)[0].shape[0]
    data = mesh.shape.get("data", 1)
    return depth % n_stages == 0 and batch % (data * n_micro) == 0
