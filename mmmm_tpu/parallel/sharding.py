"""Parameter/batch sharding rules (megatron-style TP + batch DP).

The reference never tensor-parallelizes MMMM itself (NCCL TP exists only in
its offline vLLM jobs); on TPU the 17-B bf16 model does not fit one v5e chip,
so TP over the ``model`` mesh axis is first-class here:

  - column-parallel: qkv / mlp-up projections shard the output feature dim;
  - row-parallel: attention dense / mlp-down shard the input feature dim
    (XLA inserts the psum);
  - lm_head sharded over vocab; embeddings replicated (gather-free lookup);
  - SAM heads + vg_proj are small (<1 GB) and stay replicated;
  - the batch dim of every input array shards over ``data``.

Rules are regex -> PartitionSpec over flattened ``/``-joined paths, applied to
arbitrary pytrees (params, LoRA factors, optimizer states mirror params).
"""
from __future__ import annotations

import dataclasses
import re

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _flatten_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    paths = []
    for kp, leaf in flat:
        parts = []
        for entry in kp:
            if hasattr(entry, "key"):
                parts.append(str(entry.key))
            elif hasattr(entry, "idx"):
                parts.append(str(entry.idx))
        paths.append(("/".join(parts), leaf))
    return paths, treedef


# Stacked-layer weights carry a leading L axis, hence the leading None.
# LoRA factors ("<path>/a" and "<path>/b") inherit sensible TP specs: the "b"
# factor of a column-parallel weight shards its output dim, the "a" factor of
# a row-parallel weight shards its input dim.
DEFAULT_RULES: tuple[tuple[str, P], ...] = (
    # LLM dual-expert attention
    (r".*llm/layers/(vis|lang)_qkv$", P(None, None, "model")),
    (r".*llm/layers/(vis|lang)_qkv/a$", P(None, None, None)),
    (r".*llm/layers/(vis|lang)_qkv/b$", P(None, None, "model")),
    (r".*llm/layers/(vis|lang)_dense$", P(None, "model", None)),
    (r".*llm/layers/(vis|lang)_dense/a$", P(None, "model", None)),
    (r".*llm/layers/(vis|lang)_dense/b$", P(None, None, None)),
    # LLM dual-expert MLP
    (r".*llm/layers/(vis|lang)_mlp/(gate|up)$", P(None, None, "model")),
    (r".*llm/layers/(vis|lang)_mlp/(gate|up)/a$", P(None, None, None)),
    (r".*llm/layers/(vis|lang)_mlp/(gate|up)/b$", P(None, None, "model")),
    (r".*llm/layers/(vis|lang)_mlp/down$", P(None, "model", None)),
    (r".*llm/layers/(vis|lang)_mlp/down/a$", P(None, "model", None)),
    (r".*llm/layers/(vis|lang)_mlp/down/b$", P(None, None, None)),
    # W8A16 serving leaves ({"q", "s"} dicts from quantize_llm_for_serving):
    # the int8 tensor shards like its bf16 original; per-output-channel scales
    # (..., 1, out) follow column-parallel output dims and replicate for
    # row-parallel weights (their out dim is unsharded; _fit_spec drops the
    # size-1 contraction entry)
    (r".*llm/layers/(vis|lang)_qkv/(q|s)$", P(None, None, "model")),
    (r".*llm/layers/(vis|lang)_dense/q$", P(None, "model", None)),
    (r".*llm/layers/(vis|lang)_mlp/(gate|up)/(q|s)$", P(None, None, "model")),
    (r".*llm/layers/(vis|lang)_mlp/down/q$", P(None, "model", None)),
    # LM head over vocab
    (r".*llm/lm_head$", P(None, "model")),
    (r".*llm/lm_head/b$", P(None, "model")),
    (r".*llm/lm_head/(q|s)$", P(None, "model")),
    # ViT
    (r".*vision/layers/(qkv_w|fc1_w)$", P(None, None, "model")),
    (r".*vision/layers/(qkv_b|fc1_b)$", P(None, "model")),
    (r".*vision/layers/(qkv_w|fc1_w)/b$", P(None, None, "model")),
    (r".*vision/layers/(dense_w|fc2_w)$", P(None, "model", None)),
    (r".*vision/layers/(dense_w|fc2_w)/a$", P(None, "model", None)),
    (r".*vision/glu/(gate|h4h)$", P(None, "model")),
    (r".*vision/glu/(gate|h4h)/b$", P(None, "model")),
    (r".*vision/glu/4hh$", P("model", None)),
    (r".*vision/glu/4hh/a$", P("model", None)),
)


@dataclasses.dataclass(frozen=True)
class PartitionRules:
    rules: tuple[tuple[str, P], ...] = DEFAULT_RULES

    def spec_for(self, path: str, ndim: int) -> P:
        for pat, spec in self.rules:
            if re.match(pat, path):
                if len(spec) <= ndim:
                    return spec
        return P()  # replicate


def _fit_spec(spec: P, leaf, mesh: Mesh) -> P:
    """Drop (replicate) any spec axis whose dim does not divide the mesh axis
    (e.g. an odd vocab over ``model``) — correctness first, performance where
    shapes allow; megatron pads instead, we replicate the stragglers."""
    shape = getattr(leaf, "shape", ())
    out = list(spec) + [None] * (len(shape) - len(spec))
    for d, axis in enumerate(out):
        # drop indivisible dims AND size-1 mesh axes (a spec entry on a
        # trivial axis shards nothing but blocks ZeRO passes from using the dim)
        if axis is not None and (shape[d] % mesh.shape[axis] or mesh.shape[axis] == 1):
            out[d] = None
    while out and out[-1] is None:
        out.pop()
    return P(*out)


def _pipe_spec(spec: P, path: str, leaf, mesh: Mesh) -> P:
    """Stage the stacked LLM decoder layers over a ``pipe`` axis: their
    leading (L) dim is the pipeline-stage dim consumed by
    ``parallel.pipeline.pipeline_layers`` (shard_map in_specs P('pipe', ...)),
    so sharding it here makes the shard_map entry a no-op instead of a
    reshard."""
    if "pipe" not in mesh.axis_names or mesh.shape["pipe"] == 1:
        return spec
    ndim = getattr(leaf, "ndim", 0)
    shape = getattr(leaf, "shape", ())
    if (
        re.search(r"llm/layers/", "/" + path + "/")
        and ndim > 0
        and shape[0] % mesh.shape["pipe"] == 0
    ):
        out = list(spec) + [None] * (ndim - len(spec))
        if out[0] is None:
            out[0] = "pipe"
        return P(*out)
    return spec


def param_shardings(tree, mesh: Mesh, rules: PartitionRules = PartitionRules()):
    """NamedSharding pytree mirroring ``tree`` (params / LoRA / opt state)."""
    flat, treedef = _flatten_paths(tree)
    shardings = [
        NamedSharding(
            mesh,
            _pipe_spec(
                _fit_spec(rules.spec_for(path, getattr(leaf, "ndim", 0)), leaf, mesh),
                path, leaf, mesh,
            ),
        )
        for path, leaf in flat
    ]
    return jax.tree_util.tree_unflatten(treedef, shardings)


def fsdp_shardings(
    tree,
    mesh: Mesh,
    rules: PartitionRules = PartitionRules(),
    axis: str = "data",
    min_size: int = 1 << 16,
):
    """TP spec + ZeRO-3 sharding of each large leaf over the ``axis`` axis.

    The frozen 17-B base params otherwise replicate per data rank — the HBM
    ceiling (VERDICT r1). For every leaf at least ``min_size`` elements, the
    largest dimension that is (a) not already TP-sharded, (b) divisible by the
    axis size, and (c) not the stacked-layer leading dim (scan slices it every
    step) additionally shards over ``axis``; XLA all-gathers just-in-time per
    use, ZeRO-3 style. Small leaves keep the plain TP spec.
    """
    n = mesh.shape[axis]
    flat, treedef = _flatten_paths(tree)
    out = []
    for path, leaf in flat:
        ndim = getattr(leaf, "ndim", 0)
        base = _pipe_spec(_fit_spec(rules.spec_for(path, ndim), leaf, mesh), path, leaf, mesh)
        spec = list(base) + [None] * (ndim - len(base))
        size = getattr(leaf, "size", 0)
        if n > 1 and size >= min_size and ndim > 0:
            stacked = re.search(r"/layers/", "/" + path + "/") is not None
            cand = [
                d for d in range(ndim)
                if spec[d] is None
                and leaf.shape[d] % n == 0
                and not (stacked and d == 0)
            ]
            if cand:
                best = max(cand, key=lambda d: leaf.shape[d])
                spec[best] = axis
        # ZeRO over the pipe axis too: leaves NOT staged by the pipeline
        # (ViT, embeddings, SAM, lm_head) would otherwise replicate per
        # stage — at 17 B the fp32 ViT master alone is the HBM ceiling.
        # XLA all-gathers just-in-time per use, exactly like ZeRO over data.
        if (
            "pipe" in mesh.axis_names
            and mesh.shape["pipe"] > 1
            and "pipe" not in spec
            and size >= min_size
            and ndim > 0
        ):
            npipe = mesh.shape["pipe"]
            stacked = re.search(r"/layers/", "/" + path + "/") is not None
            cand = [
                d for d in range(ndim)
                if spec[d] is None
                and leaf.shape[d] % npipe == 0
                and not (stacked and d == 0)
            ]
            if cand:
                best = max(cand, key=lambda d: leaf.shape[d])
                spec[best] = "pipe"
        out.append(NamedSharding(mesh, P(*spec)))
    return jax.tree_util.tree_unflatten(treedef, out)


def bytes_per_device(tree, shardings) -> int:
    """Per-device bytes of ``tree`` (arrays or ShapeDtypeStructs) under the
    matching ``shardings`` pytree — the HBM-fit estimate for flagship configs."""
    total = 0
    for leaf, sh in zip(jax.tree_util.tree_leaves(tree), jax.tree_util.tree_leaves(
        shardings, is_leaf=lambda x: isinstance(x, NamedSharding)
    )):
        shape = getattr(leaf, "shape", ())
        nbytes = int(np.prod(shape, dtype=np.int64)) * jax.dtypes.canonicalize_dtype(leaf.dtype).itemsize
        factor = 1
        for d, axis in enumerate(tuple(sh.spec) + (None,) * (len(shape) - len(sh.spec))):
            if axis is not None:
                factor *= sh.mesh.shape[axis]
        total += nbytes // factor
    return total


def tp_serving_params(params, tp: int):
    """Shard serving weights for tensor-parallel inference over ``tp`` local
    devices (remaining devices form the ``data`` axis). Returns
    ``(sharded_params, attn_impl)`` — TP serving takes the XLA decode path
    (the Pallas decode kernel has no GSPMD partitioning rule; the XLA decode
    einsums partition over the sharded head dim automatically; token-identity
    is pinned by tests/test_tp_serving.py). Used by ``demo.py --tp`` and
    ``evaluate predict --tp``."""
    if tp <= 1:
        return params, "auto"
    from .mesh import make_mesh

    n = jax.device_count()
    if n % tp:
        raise ValueError(f"tp={tp} does not divide {n} devices")
    mesh = make_mesh(data=n // tp, model=tp)
    return jax.device_put(params, param_shardings(params, mesh)), "xla"


def batch_shardings(batch, mesh: Mesh):
    """Shard the leading (batch) dim of every array leaf over ``data``."""

    def spec(leaf):
        ndim = getattr(leaf, "ndim", 0)
        if ndim == 0:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))

    return jax.tree_util.tree_map(spec, batch)
