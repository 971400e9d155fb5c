"""Training-step tests: LoRA wiring, loss decrease, sharded multi-device step."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmmm_tpu.models import MMMMConfig, MMMMModel
from mmmm_tpu.parallel import make_mesh
from mmmm_tpu.peft import LoraConfig, default_lora_targets, lora_init, lora_merge
from mmmm_tpu.train import OptimizerConfig, init_train_state, make_optimizer, make_train_step


def _batch(cfg, b=2, s=24, n_vis=6):
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(4, cfg.vlm.vocab_size, size=(b, s)), jnp.int32)
    tt = jnp.zeros((b, s), jnp.int32).at[:, 1 : 1 + n_vis].set(1)
    return {
        "input_ids": ids,
        "token_type_ids": tt,
        "position_ids": jnp.broadcast_to(jnp.arange(s), (b, s)),
        "attention_mask": jnp.ones((b, s), jnp.int32),
        "labels": jnp.full((b, s), -100, jnp.int32).at[:, 12:].set(7),
        "weight": jnp.ones((b, s), jnp.float32),
        "image": jnp.ones((b, 3, 4, 16, 16), jnp.float32),
        "patch_size": (4, 4, 4),
        "pool_size": (1, 1, 1),
    }


def test_lora_targets_and_zero_init_identity():
    cfg = MMMMConfig.tiny()
    model = MMMMModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    targets = default_lora_targets(params)
    assert any("vis_qkv" in t for t in targets)
    assert any("vision/glu" in t for t in targets)
    assert not any("sam" in t.split("/")[0] for t in targets)
    lcfg = LoraConfig(r=4)
    lora = lora_init(jax.random.PRNGKey(1), params, lcfg, targets)
    merged = lora_merge(params, lora, lcfg)
    # B zero-init -> merge is identity
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(merged)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_train_step_loss_decreases():
    cfg = MMMMConfig.tiny()
    model = MMMMModel(cfg)
    opt = make_optimizer(OptimizerConfig(lr=1e-2, warmup_steps=1, max_steps=100))
    lcfg = LoraConfig(r=4)
    state, frozen = init_train_state(jax.random.PRNGKey(0), model, opt, lcfg)
    step = make_train_step(model, opt, lcfg, vg_mode="none", attn_impl="xla", remat=False)
    batch = _batch(cfg)
    losses = []
    for _ in range(5):
        state, logs = step(state, frozen, batch)
        losses.append(float(logs["lm_loss"]))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 5


def test_train_step_sharded_matches_single():
    """dp=2 x tp=4 sharded step == unsharded step (same seed, same batch)."""
    cfg = MMMMConfig.tiny()
    model = MMMMModel(cfg)
    opt = make_optimizer(OptimizerConfig(lr=1e-3, warmup_steps=1, max_steps=100))
    lcfg = LoraConfig(r=4)
    batch = _batch(cfg)

    state1, frozen1 = init_train_state(jax.random.PRNGKey(0), model, opt, lcfg)
    step1 = make_train_step(model, opt, lcfg, vg_mode="none", attn_impl="xla", remat=False, donate=False)
    state1, logs1 = step1(state1, frozen1, batch)

    mesh = make_mesh(data=2, model=4)
    state2, frozen2 = init_train_state(jax.random.PRNGKey(0), model, opt, lcfg)
    step2 = make_train_step(
        model, opt, lcfg, vg_mode="none", attn_impl="xla", remat=False, mesh=mesh, donate=False
    )
    state2, logs2 = step2(state2, frozen2, batch)
    np.testing.assert_allclose(float(logs1["lm_loss"]), float(logs2["lm_loss"]), rtol=1e-4)
    # updated trainable params agree
    l1 = jax.tree.leaves(state1.trainable)
    l2 = jax.tree.leaves(state2.trainable)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_train_step_semantic_vg():
    cfg = MMMMConfig.tiny()
    model = MMMMModel(cfg)
    opt = make_optimizer(OptimizerConfig(lr=1e-3, warmup_steps=1, max_steps=100))
    lcfg = LoraConfig(r=4)
    state, frozen = init_train_state(jax.random.PRNGKey(0), model, opt, lcfg)
    step = make_train_step(model, opt, lcfg, vg_mode="semantic", attn_impl="xla", remat=False)
    b, n = 2, 3
    batch = _batch(cfg)
    batch.update(
        grounding_image=jnp.ones((b, 3, 4, 16, 16), jnp.float32),
        vg_positions=jnp.asarray([[5, 9, 0], [7, 0, 0]], jnp.int32),
        vg_valid=jnp.asarray([[True, True, False], [True, False, False]]),
        masks=jnp.asarray(np.random.default_rng(1).uniform(size=(b, n, 4, 16, 16)) > 0.8),
    )
    state, logs = step(state, frozen, batch)
    assert np.isfinite(float(logs["loss"]))
    assert float(logs["grad_norm"]) > 0


def test_train_step_expert_span_matches_dual():
    """Static expert-span routing (vis_span="auto") == the dual masked path
    on a layout-consistent batch (vision-typed tokens exactly [1, 1+n_vis)
    with n_vis = the ViT's spliced width — the input_builder guarantee).
    This is the train-side twin of test_vis_span_fast_path_matches_masked:
    the r4 train gauge paid both experts' matmuls for every token."""
    cfg = MMMMConfig.tiny()
    model = MMMMModel(cfg)
    # (4, 16, 16) @ patch (4,4,4), pool (1,1,1) -> 16 patches + boi/eoi = 18
    batch = _batch(cfg, s=32, n_vis=18)
    params = model.init(jax.random.PRNGKey(0))
    loss_dual, logs_dual = model.training_step(
        params, batch, vg_mode="none", attn_impl="xla"
    )
    loss_span, logs_span = model.training_step(
        params, batch, vg_mode="none", attn_impl="xla", vis_span="auto"
    )
    np.testing.assert_allclose(
        float(loss_span), float(loss_dual), rtol=2e-5
    )
    # text-only batch: "auto" must fall back to the dual path (no image)
    tbatch = {k: v for k, v in _batch(cfg, s=16, n_vis=0).items()
              if k not in ("image", "patch_size", "pool_size")}
    loss_t, _ = model.training_step(
        params, tbatch, vg_mode="none", attn_impl="xla", vis_span="auto",
    )
    assert np.isfinite(float(loss_t))


def test_lora_dropout_train_vs_eval():
    """Dropout perturbs the merged weights during training (fresh mask per rng)
    and is absent at eval (no rng) — recipe parity with conf/lora.yaml (p=.05)."""
    cfg = MMMMConfig.tiny()
    model = MMMMModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    lcfg = LoraConfig(r=4, dropout=0.5)
    lora = lora_init(jax.random.PRNGKey(1), params, lcfg)
    # make B nonzero so the delta (and thus the mask) is observable
    lora = jax.tree.map(lambda x: jnp.ones_like(x), lora)

    eval_merged = lora_merge(params, lora, lcfg)
    eval_merged2 = lora_merge(params, lora, lcfg)
    train_a = lora_merge(params, lora, lcfg, dropout_rng=jax.random.PRNGKey(10))
    train_b = lora_merge(params, lora, lcfg, dropout_rng=jax.random.PRNGKey(11))

    flat_e = jax.tree.leaves(eval_merged)
    for x, y in zip(flat_e, jax.tree.leaves(eval_merged2)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def l1_diff(t1, t2):
        return sum(
            float(jnp.abs(a - b).sum()) for a, b in zip(jax.tree.leaves(t1), jax.tree.leaves(t2))
        )

    assert l1_diff(train_a, eval_merged) > 0  # dropout active under a train rng
    assert l1_diff(train_a, train_b) > 0  # fresh mask per rng
    # unbiased: surviving rows scaled by 1/(1-p); with all-ones factors the
    # mean delta over many draws approaches the eval delta
    draws = [
        lora_merge(params, lora, lcfg, dropout_rng=jax.random.PRNGKey(100 + i))
        for i in range(64)
    ]
    ev = np.asarray(eval_merged["cogvlm"]["llm"]["lm_head"], np.float64)
    mean = np.mean(
        [np.asarray(d["cogvlm"]["llm"]["lm_head"], np.float64) for d in draws], axis=0
    )
    base = np.asarray(params["cogvlm"]["llm"]["lm_head"], np.float64)
    # global mean (per-row means are too noisy at 64 draws): rel sd ~1%
    np.testing.assert_allclose((mean - base).mean(), (ev - base).mean(), rtol=0.1)
