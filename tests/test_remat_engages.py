"""Prove the remat knob engages (VERDICT r4 weak #3).

The r4 train gauge measured remat=attn vs remat=full within 0.1% of each
other (839.3 vs 838.3 ms) and flagged "either the remat knob isn't engaging
or the step is bottlenecked somewhere remat can't touch". The mundane
explanation: the two policies differ ONLY in whether the per-layer attention
context is saved — attention is ~8% of layer matmul FLOPs at S=1024, and the
flash bwd reads the saved context instead of re-running the fwd kernel, so
attn-vs-full is a small-percent FLOP delta. The comparison that shows remat
cost is none-vs-{attn,full}, and remat=none OOMs on-chip at the gauge size.

These tests pin the mechanism at tiny scale via the compiled program's own
accounting: recompute FLOPs must rise none -> attn -> full, and live
activation memory must fall.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmmm_tpu.models import MMMMConfig, MMMMModel
from mmmm_tpu.peft import LoraConfig
from mmmm_tpu.train import (
    OptimizerConfig,
    init_train_state,
    make_optimizer,
)
from mmmm_tpu.train.step import make_step_fn, split_batch


def _compiled(remat, b=2, s=192, n_vis=6):
    cfg = MMMMConfig.tiny()
    model = MMMMModel(cfg)
    opt = make_optimizer(OptimizerConfig(lr=1e-3, warmup_steps=1, max_steps=10))
    lcfg = LoraConfig(r=4)
    state, frozen = init_train_state(jax.random.PRNGKey(0), model, opt, lcfg)
    rng = np.random.default_rng(0)
    batch = {
        "input_ids": jnp.asarray(rng.integers(4, cfg.vlm.vocab_size, (b, s)), jnp.int32),
        "token_type_ids": jnp.zeros((b, s), jnp.int32).at[:, 1 : 1 + n_vis].set(1),
        "position_ids": jnp.broadcast_to(jnp.arange(s), (b, s)),
        "attention_mask": jnp.ones((b, s), jnp.int32),
        "labels": jnp.full((b, s), -100, jnp.int32).at[:, 12:].set(7),
        "weight": jnp.ones((b, s), jnp.float32),
        "image": jnp.ones((b, 3, 4, 16, 16), jnp.float32),
        "patch_size": (4, 4, 4),
        "pool_size": (1, 1, 1),
    }
    step_fn = make_step_fn(model, opt, lcfg, vg_mode="none", remat=remat,
                           attn_impl="xla")
    arrays, patch, pool = split_batch(batch)

    def fn(state, frozen, arrays):
        full = dict(arrays, patch_size=patch, pool_size=pool)
        return step_fn(state, frozen, full)

    return jax.jit(fn).lower(state, frozen, arrays).compile()


@pytest.fixture(scope="module")
def compiled_by_policy():
    return {name: _compiled(remat)
            for name, remat in [("none", False), ("attn", "attn"), ("full", True)]}


def test_remat_adds_recompute_flops(compiled_by_policy):
    flops = {k: c.cost_analysis()["flops"] for k, c in compiled_by_policy.items()}
    # full recompute re-runs the whole layer fwd in bwd; attn saves the
    # attention context so it recomputes slightly less; none recomputes nothing
    assert flops["none"] < flops["attn"] <= flops["full"], flops
    # the none->full gap is a real recompute term, not numerical noise (at
    # tiny scale the un-remat'd lm_head/CE/ViT dominate total FLOPs, so the
    # relative gap is a few percent; measured {none 894M, attn 961M, full
    # 970M} — attn-vs-full differ by ~1%, which is exactly the r4 on-chip
    # observation the gauge flagged as a possible no-op)
    assert flops["full"] > 1.05 * flops["none"], flops


def test_remat_reduces_live_activation_memory(compiled_by_policy):
    mem = {}
    for k, c in compiled_by_policy.items():
        try:
            mem[k] = c.memory_analysis().temp_size_in_bytes
        except Exception:  # noqa: BLE001 — not all backends expose it
            pytest.skip("memory_analysis unavailable on this backend")
    assert mem["none"] > mem["attn"] >= mem["full"], mem
