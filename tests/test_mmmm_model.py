"""MMMM top-level training-step tests for all three grounding modes."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmmm_tpu.models import MMMMConfig, MMMMModel


@pytest.fixture(scope="module")
def model_and_params():
    cfg = MMMMConfig.tiny()
    model = MMMMModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def _vlm_batch(cfg, b=2, s=32, n_vis=10):
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(4, cfg.vlm.vocab_size, size=(b, s)), jnp.int32)
    tt = jnp.zeros((b, s), jnp.int32).at[:, 1 : 1 + n_vis].set(1)
    pos = jnp.broadcast_to(jnp.arange(s), (b, s))
    seg = jnp.ones((b, s), jnp.int32)
    labels = jnp.full((b, s), -100, jnp.int32).at[:, 16:].set(7)
    weight = jnp.ones((b, s), jnp.float32)
    return {
        "input_ids": ids,
        "token_type_ids": tt,
        "position_ids": pos,
        "attention_mask": seg,
        "labels": labels,
        "weight": weight,
        "image": jnp.ones((b, 3, 4, 16, 16), jnp.float32),
        "patch_size": (2, 4, 4),
        "pool_size": (1, 2, 2),
    }


def test_training_step_vlm_only(model_and_params):
    model, params = model_and_params
    batch = _vlm_batch(model.cfg)
    loss, log = model.training_step(params, batch, vg_mode="none", attn_impl="xla")
    assert np.isfinite(float(loss))
    assert "lm_loss" in log


def test_training_step_semantic(model_and_params):
    model, params = model_and_params
    b, n = 2, 3
    batch = _vlm_batch(model.cfg)
    batch.update(
        grounding_image=jnp.ones((b, 3, 4, 16, 16), jnp.float32),
        vg_positions=jnp.asarray([[5, 9, 0], [7, 0, 0]], jnp.int32),
        vg_valid=jnp.asarray([[True, True, False], [True, False, False]]),
        masks=jnp.asarray(np.random.default_rng(1).uniform(size=(b, n, 4, 16, 16)) > 0.8),
    )
    loss, log = model.training_step(params, batch, vg_mode="semantic", attn_impl="xla")
    assert np.isfinite(float(loss))
    assert "vg/dice" in log

    # gradients flow to sam + vg_proj + vlm
    def loss_fn(p):
        return model.training_step(p, batch, vg_mode="semantic", attn_impl="xla")[0]

    grads = jax.grad(loss_fn)(params)
    gnorm = lambda t: float(
        jnp.sqrt(sum(jnp.sum(x**2) for x in jax.tree.leaves(t)))
    )
    assert gnorm(grads["sam"]) > 0
    assert gnorm(grads["vg_proj"]) > 0
    assert gnorm(grads["cogvlm"]) > 0
    assert np.isfinite(gnorm(grads))


def test_training_step_instance_boxes(model_and_params):
    model, params = model_and_params
    b, n, lmax = 2, 3, 6
    rng = np.random.default_rng(2)
    batch = _vlm_batch(model.cfg)
    batch.update(
        grounding_image=jnp.ones((b, 3, 4, 16, 16), jnp.float32),
        vg_positions=jnp.asarray([[5, 9, 0], [7, 0, 0]], jnp.int32),
        vg_valid=jnp.asarray([[True, True, False], [True, False, False]]),
        boxes_label=jnp.asarray(rng.uniform(0.2, 0.8, size=(b, lmax, 6)), jnp.float32),
        index_offsets=jnp.asarray(
            [[[0, 2], [2, 3], [0, 0]], [[0, 1], [0, 0], [0, 0]]], jnp.int32
        ),
    )
    loss, log = model.training_step(params, batch, vg_mode="instance", attn_impl="xla")
    assert np.isfinite(float(loss))
    assert "vg/instance-box-l1" in log

    def loss_fn(p):
        return model.training_step(p, batch, vg_mode="instance", attn_impl="xla")[0]

    grads = jax.grad(loss_fn)(params)
    isam_leaves = jax.tree.leaves(grads["isam"])
    assert all(np.isfinite(np.asarray(g)).all() for g in isam_leaves)
    assert float(sum(jnp.sum(jnp.abs(g)) for g in isam_leaves)) > 0


def test_training_step_instance_with_masks(model_and_params):
    """CT-RATE grg path: instance mode with pseudo-mask labels (matching on
    downsampled masks, full-res mask loss)."""
    model, params = model_and_params
    b, n, lmax = 2, 3, 6
    rng = np.random.default_rng(3)
    batch = _vlm_batch(model.cfg)
    batch.update(
        grounding_image=jnp.ones((b, 3, 4, 16, 16), jnp.float32),
        vg_positions=jnp.asarray([[5, 9, 0], [7, 0, 0]], jnp.int32),
        vg_valid=jnp.asarray([[True, True, False], [True, False, False]]),
        boxes_label=jnp.asarray(rng.uniform(0.2, 0.8, size=(b, lmax, 6)), jnp.float32),
        index_offsets=jnp.asarray(
            [[[0, 2], [2, 3], [0, 0]], [[0, 1], [0, 0], [0, 0]]], jnp.int32
        ),
        masks_label=jnp.asarray(rng.uniform(size=(b, lmax, 4, 16, 16)) > 0.8),
    )
    loss, log = model.training_step(params, batch, vg_mode="instance", attn_impl="xla")
    assert np.isfinite(float(loss))
    assert "vg/instance-mask-pos" in log

    grads = jax.grad(
        lambda p: model.training_step(p, batch, vg_mode="instance", attn_impl="xla")[0]
    )(params)
    gn = float(
        jnp.sqrt(sum(jnp.sum(g**2) for g in jax.tree.leaves(grads["isam"])))
    )
    assert gn > 0 and np.isfinite(gn)
