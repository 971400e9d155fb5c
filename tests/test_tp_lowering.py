"""17-B-under-TP lowering regression (VERDICT r2 weak #4).

AOT-lowers the REAL sharded train step and the serving prefill forward at
``CogVLMConfig.cogvlm17b()`` shapes on an 8-virtual-device (data=2, model=4)
CPU mesh — ShapeDtypeStructs only, no arrays materialized — and checks the
per-device parameter HBM estimate fits a v5e chip (16 GB).

Ref parity: the reference never TPs MMMM (SURVEY §2.7); the 17-B bf16 model
does not fit one v5e chip, so TP+FSDP sharding must keep lowering as the
model evolves.
"""
import jax
import numpy as np
import pytest

from mmmm_tpu.models import MMMMConfig, MMMMModel
from mmmm_tpu.models.cogvlm import CogVLMConfig
from mmmm_tpu.models.segvol import SamConfig
from mmmm_tpu.parallel import make_mesh
from mmmm_tpu.parallel.sharding import bytes_per_device, fsdp_shardings, param_shardings
from mmmm_tpu.peft import LoraConfig
from mmmm_tpu.train import OptimizerConfig, make_optimizer
from mmmm_tpu.train.step import abstract_train_state, lower_train_step

V5E_HBM = 16 * 1024**3


def _flagship():
    return MMMMConfig(vlm=CogVLMConfig.cogvlm17b(), sam=SamConfig())


def _mesh():
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(data=2, model=4)


def _sds(shape, dtype, mesh, spec_first="data"):
    from jax.sharding import NamedSharding, PartitionSpec as P

    return jax.ShapeDtypeStruct(
        shape, dtype,
        sharding=NamedSharding(mesh, P(spec_first, *([None] * (len(shape) - 1)))),
    )


def _train_batch_sds(cfg, mesh, b=8, s=1024):
    # phase-vg-like shapes: 144 vision tokens (z=1 X-ray at stride 32),
    # max_seq_len 1024 (BASELINE.md)
    img = (b, 3, 16, 384, 384)
    i32, f32 = np.int32, np.float32
    return {
        "input_ids": _sds((b, s), i32, mesh),
        "token_type_ids": _sds((b, s), i32, mesh),
        "position_ids": _sds((b, s), i32, mesh),
        "attention_mask": _sds((b, s), i32, mesh),
        "labels": _sds((b, s), i32, mesh),
        "weight": _sds((b, s), f32, mesh),
        "image": _sds(img, f32, mesh),
        "patch_size": (16, 16, 16),
        "pool_size": (1, 2, 2),
        "grounding_image": _sds(img, f32, mesh),
        "vg_positions": _sds((b, 4), i32, mesh),
        "vg_valid": _sds((b, 4), bool, mesh),
        "masks": _sds((b, 4, 16, 384, 384), bool, mesh),
    }


@pytest.mark.slow
def test_17b_train_step_lowers_under_tp_and_fits_v5e():
    mesh = _mesh()
    cfg = _flagship()
    model = MMMMModel(cfg)
    opt = make_optimizer(OptimizerConfig(lr=5e-5, warmup_steps=2000, max_steps=40000))
    lcfg = LoraConfig(r=64, alpha=8)

    lowered, state_sds, frozen_sds = lower_train_step(
        model, opt, lcfg, mesh, _train_batch_sds(cfg, mesh),
        vg_mode="semantic", bf16_vlm=True, attn_impl="xla", remat=True,
    )
    text = lowered.as_text()
    assert "stablehlo" in text or "module" in text  # lowered artifact exists

    # per-device parameter HBM: frozen (fp32 master, FSDP+TP) + trainable +
    # optimizer (2 adam moments mirror trainable shardings)
    state_a, frozen_a = abstract_train_state(model, opt, lcfg)
    frozen_b = bytes_per_device(frozen_a, fsdp_shardings(frozen_a, mesh))
    train_b = bytes_per_device(state_a.trainable, fsdp_shardings(state_a.trainable, mesh))
    opt_b = bytes_per_device(state_a.opt_state, fsdp_shardings(state_a.opt_state, mesh))
    total = frozen_b + train_b + opt_b
    n_params = sum(
        int(np.prod(l.shape, dtype=np.int64))
        for l in jax.tree_util.tree_leaves(frozen_a)
    ) + sum(
        int(np.prod(l.shape, dtype=np.int64))
        for l in jax.tree_util.tree_leaves(state_a.trainable["ft"])
    )
    print(
        f"17B TP lowering: params={n_params/1e9:.2f}B, per-device bytes: "
        f"frozen={frozen_b/2**30:.2f}GiB train={train_b/2**30:.2f}GiB "
        f"opt={opt_b/2**30:.2f}GiB total={total/2**30:.2f}GiB"
    )
    assert n_params > 10e9  # it really is the flagship
    # params fit with >= 4 GiB headroom for activations/workspace
    assert total < V5E_HBM - 4 * 1024**3, f"{total/2**30:.2f} GiB"


@pytest.mark.slow
def test_17b_serving_forward_lowers_under_tp():
    """Serving prefill (bf16 weights, 256 eval vision tokens) lowers with the
    TP rules; bf16 TP params fit a single v5e chip with headroom."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = _mesh()
    cfg = _flagship()
    model = MMMMModel(cfg)

    params_a = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), jnp.bfloat16))
    shardings = param_shardings(params_a, mesh)
    params_sds = jax.tree_util.tree_map(
        lambda l, s: jax.ShapeDtypeStruct(l.shape, l.dtype, sharding=s),
        params_a, shardings,
    )
    b, s = 2, 1024  # batch divides the data axis
    batch_sds = {
        "input_ids": _sds((b, s), np.int32, mesh),
        "token_type_ids": _sds((b, s), np.int32, mesh),
        "position_ids": _sds((b, s), np.int32, mesh),
        "attention_mask": _sds((b, s), np.int32, mesh),
        "image": _sds((b, 3, 32, 512, 512), np.float32, mesh),
    }

    def fwd(params, batch):
        return model.vlm_forward(
            params, dict(batch, patch_size=(16, 16, 16), pool_size=(2, 2, 2)),
            attn_impl="xla", return_logits=True,
        )

    lowered = jax.jit(fwd).lower(params_sds, batch_sds)
    assert lowered is not None
    pb = bytes_per_device(params_a, shardings)
    print(f"17B serving bf16 TP=4: params/device = {pb/2**30:.2f} GiB")
    assert pb < V5E_HBM - 6 * 1024**3


@pytest.mark.slow
def test_17b_train_step_lowers_under_pp_and_fits_v5e():
    """17 B staged over a pipeline: (pipe=4, data=2) mesh, decoder stack
    sharded over pipe (8 layers/stage), GPipe schedule in llm_forward. The
    cross-slice (DCN) scaling story for flagship training — per-device param
    bytes must still fit v5e."""
    from mmmm_tpu.parallel import set_pipe_context

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(data=2, model=1, pipe=4)
    cfg = _flagship()
    assert cfg.vlm.num_hidden_layers % 4 == 0
    model = MMMMModel(cfg)
    opt = make_optimizer(OptimizerConfig(lr=5e-5, warmup_steps=2000, max_steps=40000))
    lcfg = LoraConfig(r=64, alpha=8)
    set_pipe_context(mesh, "pipe", n_micro=2)
    try:
        lowered, state_sds, frozen_sds = lower_train_step(
            model, opt, lcfg, mesh, _train_batch_sds(cfg, mesh),
            vg_mode="semantic", bf16_vlm=True, attn_impl="xla", remat=True,
        )
    finally:
        set_pipe_context(None)
    assert lowered is not None
    state_a, frozen_a = abstract_train_state(model, opt, lcfg)
    per_dev = (
        bytes_per_device(frozen_a, fsdp_shardings(frozen_a, mesh))
        + bytes_per_device(state_a.trainable, fsdp_shardings(state_a.trainable, mesh))
        + bytes_per_device(state_a.opt_state, fsdp_shardings(state_a.opt_state, mesh))
    )
    # pipe stages the 14 GiB of stacked decoder weights 4-way; the per-device
    # param state must leave headroom for activations on a 16 GiB chip
    assert per_dev < 12 * 1024**3, f"{per_dev / 2**30:.2f} GiB/device"
