"""Pipeline parallelism: GPipe microbatch schedule over a ``pipe`` mesh axis.

Beyond-reference scaling feature (SURVEY §2.7: the reference has no PP);
correctness gate: pipelined llm_forward and the full pipelined train step must
match their unpipelined single-program equivalents on a virtual CPU mesh.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmmm_tpu.parallel import make_mesh, set_pipe_context
from mmmm_tpu.parallel.pipeline import pipeline_layers


@pytest.fixture(autouse=True)
def _clear_ctx():
    yield
    set_pipe_context(None)


def _toy_layers(key, n_layers=4, c=16):
    k1, k2 = jax.random.split(key)
    return {
        "w": jax.random.normal(k1, (n_layers, c, c), jnp.float32) * 0.1,
        "b": jax.random.normal(k2, (n_layers, c), jnp.float32) * 0.1,
    }


def _toy_layer_fn(h, lp, side):
    return jnp.tanh(h @ lp["w"] + lp["b"]) * side["gate"][:, :, None]


def _scan_ref(layers, x, side):
    def body(h, lp):
        return _toy_layer_fn(h, lp, side), None

    return jax.lax.scan(body, x, layers)[0]


def test_pipeline_layers_matches_scan():
    mesh = make_mesh(data=2, pipe=4)
    key = jax.random.PRNGKey(0)
    layers = _toy_layers(key, n_layers=8)
    b, s, c = 8, 6, 16
    x = jax.random.normal(jax.random.fold_in(key, 1), (b, s, c), jnp.float32)
    side = {"gate": jnp.ones((b, s), jnp.float32).at[:, -1].set(0.5)}
    ref = _scan_ref(layers, x, side)
    got = jax.jit(
        lambda l, xx, sd: pipeline_layers(
            _toy_layer_fn, l, xx, sd, mesh, "pipe", n_micro=4
        )
    )(layers, x, side)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_pipeline_layers_grads_match():
    """Reverse-mode through scan+ppermute = the backward pipeline; parameter
    and input grads must equal the unpipelined scan's."""
    mesh = make_mesh(data=1, pipe=4)
    key = jax.random.PRNGKey(2)
    layers = _toy_layers(key, n_layers=4)
    b, s, c = 4, 5, 16
    x = jax.random.normal(jax.random.fold_in(key, 3), (b, s, c), jnp.float32)
    side = {"gate": jnp.ones((b, s), jnp.float32)}

    def loss_pipe(l, xx):
        out = pipeline_layers(_toy_layer_fn, l, xx, side, mesh, "pipe", n_micro=2)
        return jnp.sum(out**2)

    def loss_ref(l, xx):
        return jnp.sum(_scan_ref(l, xx, side) ** 2)

    gp = jax.jit(jax.grad(loss_pipe, argnums=(0, 1)))(layers, x)
    gr = jax.grad(loss_ref, argnums=(0, 1))(layers, x)
    for a, b_ in zip(jax.tree.leaves(gp), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)


def test_llm_forward_pipelined_matches_local():
    """The wired path: llm_forward under a pipe context == plain llm_forward."""
    from mmmm_tpu.models.cogvlm import CogVLMConfig
    from mmmm_tpu.models.cogvlm.decoder import init_llm_params, llm_forward

    cfg = CogVLMConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=4, num_attention_heads=4,
    )
    params = init_llm_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    b, s = 8, 10
    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.normal(size=(b, s, 32)), jnp.float32)
    tt = jnp.zeros((b, s), jnp.int32).at[:, 1:4].set(1)
    pos = jnp.broadcast_to(jnp.arange(s), (b, s)).astype(jnp.int32)
    seg = jnp.ones((b, s), jnp.int32)

    ref = llm_forward(params, cfg, emb, tt, pos, seg, attn_impl="xla")
    mesh = make_mesh(data=2, pipe=4)
    set_pipe_context(mesh, "pipe", n_micro=2)
    got = jax.jit(
        lambda p, e: llm_forward(p, cfg, e, tt, pos, seg, attn_impl="xla")
    )(params, emb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_pipelined_train_step_matches_single():
    """Full MMMM train step on a (data=2, pipe=4) mesh == single-device step:
    same loss and same updated-parameter values after one step."""
    from mmmm_tpu.models import MMMMConfig, MMMMModel
    from mmmm_tpu.peft import LoraConfig
    from mmmm_tpu.train import OptimizerConfig, make_optimizer
    from mmmm_tpu.train.step import init_train_state, make_train_step

    cfg = MMMMConfig.tiny()
    if cfg.vlm.num_hidden_layers % 4:
        cfg = dataclasses.replace(
            cfg,
            vlm=dataclasses.replace(cfg.vlm, num_hidden_layers=4),
        )
    model = MMMMModel(cfg)
    opt = make_optimizer(OptimizerConfig(lr=1e-3, warmup_steps=1, max_steps=10))
    lcfg = LoraConfig(r=4, alpha=8, dropout=0.0)
    state, frozen = init_train_state(jax.random.PRNGKey(0), model, opt, lcfg)

    b, s, nv = 8, 24, 6
    rng = np.random.default_rng(1)
    batch = {
        "input_ids": jnp.asarray(rng.integers(4, 100, size=(b, s)), jnp.int32),
        "token_type_ids": jnp.zeros((b, s), jnp.int32).at[:, 1 : 1 + nv].set(1),
        "position_ids": jnp.broadcast_to(jnp.arange(s), (b, s)).astype(jnp.int32),
        "attention_mask": jnp.ones((b, s), jnp.int32),
        "labels": jnp.full((b, s), -100, jnp.int32).at[:, nv + 2 :].set(7),
        "weight": jnp.ones((b, s), jnp.float32),
        "image": jnp.ones((b, 3, 4, 16, 16), jnp.float32),
        "patch_size": (4, 4, 4),
        "pool_size": (1, 1, 1),
    }

    step_single = make_train_step(
        model, opt, lcfg, vg_mode="none", attn_impl="xla", remat=False,
        donate=False, dropout_seed=None,
    )
    _, logs_ref = step_single(state, frozen, dict(batch))

    mesh = make_mesh(data=2, pipe=4)
    set_pipe_context(mesh, "pipe", n_micro=2)
    step_pipe = make_train_step(
        model, opt, lcfg, vg_mode="none", attn_impl="xla", remat=False,
        mesh=mesh, donate=False, dropout_seed=None,
    )
    _, logs_pipe = step_pipe(state, frozen, dict(batch))

    np.testing.assert_allclose(
        float(logs_pipe["lm_loss"]), float(logs_ref["lm_loss"]), rtol=2e-5
    )
