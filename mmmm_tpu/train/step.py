"""The pjit training step: LoRA-merged forward, grad, clip, AdamW update.

Replaces the Lightning/DDP training loop (``mmmm.py:296-352`` + luolib
trainer): a single pure function jitted over the (data, model) mesh. Parameter
partitioning follows ``parallel.sharding``; the optimizer state mirrors the
trainable tree's shardings automatically (ZeRO-style sharding of optimizer
state comes free once trainable params are sharded).

Precision policy (= ``MyPrecision``, ``mmmm.py:468-492``): master trainable
params are fp32; the CogVLM subtree is cast to bf16 for the forward, while
SAM / iSAM / vg_proj compute in fp32.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from ..models import MMMMModel
from ..peft import LoraConfig, lora_init, lora_merge, merge_trainable, split_trainable
from ..parallel.distributed import global_batch
from ..parallel.sharding import fsdp_shardings, param_shardings


@dataclasses.dataclass
class TrainState:
    step: jnp.ndarray
    trainable: dict  # {"lora": ..., "ft": ...}
    opt_state: Any

    def tree_flatten(self):
        return (self.step, self.trainable, self.opt_state), None

    @classmethod
    def tree_unflatten(cls, _, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    TrainState, TrainState.tree_flatten, TrainState.tree_unflatten
)


def _cast_vlm_bf16(params: dict) -> dict:
    out = dict(params)
    out["cogvlm"] = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params["cogvlm"]
    )
    return out


def init_train_state(
    key,
    model: MMMMModel,
    optimizer,
    lora_cfg: LoraConfig,
    dtype=jnp.float32,
    frozen_vlm_bf16: bool = False,
) -> tuple[TrainState, dict]:
    """Returns (state, frozen_params).

    ``frozen_vlm_bf16`` stores the frozen CogVLM base directly in bf16:
    the precision policy computes the VLM in bf16 anyway (``MyPrecision``,
    ``mmmm.py:468-492``), so a frozen fp32 master is pure HBM (half the
    base-model bytes + an in-graph cast copy per step). fp32 masters remain
    for everything trainable and for frozen SAM subtrees (fp32-policy)."""
    params = model.init(key, dtype)
    lora = lora_init(jax.random.fold_in(key, 1), params, lora_cfg)
    ft, frozen = split_trainable(params)
    if frozen_vlm_bf16 and "cogvlm" in frozen:
        frozen = dict(frozen)
        frozen["cogvlm"] = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            frozen["cogvlm"],
        )
    trainable = {"lora": lora, "ft": ft}
    opt_state = optimizer.init(trainable)
    return TrainState(jnp.zeros((), jnp.int32), trainable, opt_state), frozen


def effective_params(
    trainable: dict, frozen: dict, lora_cfg: LoraConfig, bf16_vlm: bool, dropout_rng=None
) -> dict:
    base = merge_trainable(trainable["ft"], frozen)
    if bf16_vlm:
        base = _cast_vlm_bf16(base)
    return lora_merge(base, trainable["lora"], lora_cfg, dropout_rng=dropout_rng)


def make_step_fn(
    model: MMMMModel,
    optimizer,
    lora_cfg: LoraConfig,
    *,
    vg_mode: str = "none",
    bf16_vlm: bool = False,
    attn_impl: str = "auto",
    remat: bool = True,
    dropout_seed: int | None = 0,
    vis_span: tuple[int, int] | str | None = None,
) -> Callable:
    """The pure (unjitted) step_fn(state, frozen, batch) -> (state, logs).

    ``vis_span="auto"`` enables static single-expert routing over the image
    span (exact for batches from ``input_builder.prepare_vlm_inputs``, which
    always places vision-typed tokens at [1, 1+n_img)); without it every
    token pays BOTH experts' matmuls — ~2x the executed expert FLOPs."""

    use_dropout = dropout_seed is not None and lora_cfg.dropout > 0.0

    def step_fn(state: TrainState, frozen: dict, batch: dict):
        # fresh LoRA-dropout mask per step, deterministic in (seed, step)
        drng = (
            jax.random.fold_in(jax.random.PRNGKey(dropout_seed), state.step)
            if use_dropout
            else None
        )

        def loss_fn(trainable):
            params = effective_params(trainable, frozen, lora_cfg, bf16_vlm, dropout_rng=drng)
            return model.training_step(
                params, batch, vg_mode=vg_mode, attn_impl=attn_impl, remat=remat,
                vis_span=vis_span,
            )

        (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.trainable)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.trainable)
        trainable = optax.apply_updates(state.trainable, updates)
        logs = dict(logs)
        logs["grad_norm"] = optax.global_norm(grads)
        new_state = TrainState(state.step + 1, trainable, opt_state)
        return new_state, logs

    return step_fn


def split_batch(batch):
    arrays = {
        k: v
        for k, v in batch.items()
        if k not in ("patch_size", "pool_size") and hasattr(v, "ndim")
    }
    return arrays, batch.get("patch_size"), batch.get("pool_size")


def make_train_step(
    model: MMMMModel,
    optimizer,
    lora_cfg: LoraConfig,
    *,
    vg_mode: str = "none",
    bf16_vlm: bool = False,
    attn_impl: str = "auto",
    remat: bool = True,
    mesh=None,
    frozen_example: dict | None = None,
    state_example: TrainState | None = None,
    batch_example: dict | None = None,
    donate: bool = True,
    dropout_seed: int | None = 0,
    vis_span: tuple[int, int] | str | None = None,
) -> Callable:
    """Build the jitted step(state, frozen, batch) -> (state, logs).

    With ``mesh`` provided, in/out shardings pin params to the TP layout and
    the batch to the data axis; otherwise plain jit.
    """

    step_fn = make_step_fn(
        model, optimizer, lora_cfg, vg_mode=vg_mode, bf16_vlm=bf16_vlm,
        attn_impl=attn_impl, remat=remat, dropout_seed=dropout_seed,
        vis_span=vis_span,
    )

    @partial(jax.jit, static_argnums=(3, 4), donate_argnums=(0,) if donate else ())
    def jit_step(state, frozen, batch_arrays, patch_size, pool_size):
        batch = dict(batch_arrays)
        if patch_size is not None:
            batch["patch_size"] = patch_size
            batch["pool_size"] = pool_size
        return step_fn(state, frozen, batch)

    if mesh is None:
        def run(state, frozen, batch):
            arrays, patch, pool = split_batch(batch)
            return jit_step(state, frozen, arrays, patch, pool)
        return run

    # sharded path: place inputs explicitly, let jit reuse their shardings.
    # Frozen base params get FSDP (ZeRO-3) over the data axis on top of TP —
    # they are the HBM ceiling when replicated per data rank; XLA all-gathers
    # them just-in-time per use. The batch is assembled from process-local
    # shards (multi-host) or device_put (single host) by ``global_batch``.
    #
    # Multi-controller note: ``jax.device_put`` cannot send a process-local
    # array to a sharding spanning other hosts ("cross host device
    # transfers"); since every process holds the same full value (identical
    # init / restore), each builds the global array from its own copy via
    # ``make_array_from_callback``. Outputs of the jitted step are already
    # global and pass through untouched; frozen placement is cached.
    def _place(tree, shardings):
        def one(x, s):
            if isinstance(x, jax.Array) and not x.is_fully_addressable:
                return x  # already a global array from a previous step
            if jax.process_count() == 1:
                return jax.device_put(x, s)
            import numpy as np

            xnp = np.asarray(x)
            return jax.make_array_from_callback(
                xnp.shape, s, lambda idx: np.asarray(xnp[idx])
            )

        return jax.tree_util.tree_map(one, tree, shardings)

    placed_frozen = {}

    def run_sharded(state, frozen, batch):
        arrays, patch, pool = split_batch(batch)
        # trainable masters + optimizer moments FSDP-shard over data on top
        # of TP (ZeRO-1/2/3): at 17 B the replicated fp32 ft tree + 2 adam
        # moments are ~6.7 GiB/device otherwise — the HBM margin
        state = _place(
            state,
            TrainState(
                param_shardings(state.step, mesh),
                fsdp_shardings(state.trainable, mesh),
                fsdp_shardings(state.opt_state, mesh),
            ),
        )
        if placed_frozen.get("id") != id(frozen):
            placed_frozen["id"] = id(frozen)
            placed_frozen["tree"] = _place(frozen, fsdp_shardings(frozen, mesh))
        frozen = placed_frozen["tree"]
        arrays = global_batch(arrays, mesh)
        return jit_step(state, frozen, arrays, patch, pool)

    return run_sharded


def abstract_train_state(model: MMMMModel, optimizer, lora_cfg: LoraConfig):
    """(state, frozen) as ShapeDtypeStructs — no arrays materialized.

    Lets flagship-sized (17 B) configs be sharded/lowered on any host."""
    return jax.eval_shape(
        lambda: init_train_state(jax.random.PRNGKey(0), model, optimizer, lora_cfg)
    )


def lower_train_step(
    model: MMMMModel,
    optimizer,
    lora_cfg: LoraConfig,
    mesh,
    batch: dict,  # array leaves may be ShapeDtypeStructs
    *,
    vg_mode: str = "none",
    bf16_vlm: bool = True,
    attn_impl: str = "xla",
    remat: bool = True,
    vis_span: tuple[int, int] | str | None = None,
):
    """AOT-lower the sharded train step at abstract shapes (no execution).

    Returns (lowered, state_sds, frozen_sds) where the ShapeDtypeStruct trees
    carry the real TP/FSDP NamedShardings — the 17-B-under-TP lowering
    regression (``bench.py`` flagship claim) runs this on a virtual CPU mesh.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    step_fn = make_step_fn(
        model, optimizer, lora_cfg, vg_mode=vg_mode, bf16_vlm=bf16_vlm,
        attn_impl=attn_impl, remat=remat, vis_span=vis_span,
    )

    @partial(jax.jit, static_argnums=(3, 4))
    def jit_step(state, frozen, batch_arrays, patch_size, pool_size):
        b = dict(batch_arrays)
        if patch_size is not None:
            b["patch_size"] = patch_size
            b["pool_size"] = pool_size
        return step_fn(state, frozen, b)

    state_a, frozen_a = abstract_train_state(model, optimizer, lora_cfg)

    def with_sharding(tree, shardings):
        return jax.tree_util.tree_map(
            lambda leaf, s: jax.ShapeDtypeStruct(leaf.shape, leaf.dtype, sharding=s),
            tree, shardings,
        )

    state_sds = TrainState(
        with_sharding(state_a.step, param_shardings(state_a.step, mesh)),
        with_sharding(state_a.trainable, fsdp_shardings(state_a.trainable, mesh)),
        with_sharding(state_a.opt_state, fsdp_shardings(state_a.opt_state, mesh)),
    )
    frozen_sds = with_sharding(frozen_a, fsdp_shardings(frozen_a, mesh))
    arrays, patch, pool = split_batch(batch)
    arrays_sds = {
        k: jax.ShapeDtypeStruct(
            v.shape, v.dtype,
            sharding=NamedSharding(mesh, P("data", *([None] * (v.ndim - 1)))),
        )
        for k, v in arrays.items()
    }
    lowered = jit_step.lower(state_sds, frozen_sds, arrays_sds, patch, pool)
    return lowered, state_sds, frozen_sds
