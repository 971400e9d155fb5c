"""Tensor-parallel SERVING: the full generate loop under a (data, model) mesh.

Round-3 scaling rung (ROADMAP): single-chip serving is weight-read-bound, so
the next throughput step is TP over chips — every decode step reads 1/TP of
the weights per device. These tests pin (a) token-identity of the sharded
generate loop vs the replicated one (bf16 and W8A16), and (b) that the 17 B
flagship's FULL generate program (prefill + decode scan + KV caches) lowers
under the TP rules with per-device weight bytes fitting a v5e.

TP serving uses ``attn_impl="xla"`` — the Pallas decode kernel has no GSPMD
partitioning rule; the XLA decode einsums partition over the head dim
automatically. (Reference never TP-serves MMMM; its vLLM TP applies only to
offline Llama jobs — scripts/data/vl/llama3_process.py.)
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmmm_tpu.models import MMMMConfig, MMMMModel
from mmmm_tpu.models.generate import greedy_generate
from mmmm_tpu.parallel import make_mesh
from mmmm_tpu.parallel.sharding import batch_shardings, bytes_per_device, param_shardings


def _tiny_batch(cfg, b=2, s=24, n_vis=10):
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(4, cfg.vlm.vocab_size, size=(b, s)), jnp.int32)
    tt = jnp.zeros((b, s), jnp.int32).at[:, 1 : 1 + n_vis].set(1)
    pos = jnp.broadcast_to(jnp.arange(s), (b, s)).astype(jnp.int32)
    prompt_len = jnp.asarray([s, s - 3], jnp.int32)
    img = jnp.asarray(rng.normal(size=(b, 3, 4, 16, 16)), jnp.float32)
    return ids, tt, pos, prompt_len, img


def _gen(params, cfg, batch, max_new=12):
    ids, tt, pos, plen, img = batch
    res = greedy_generate(
        params["cogvlm"], cfg.vlm, ids, tt, pos, plen,
        max_new_tokens=max_new, eos_token_id=2, bop_token_id=9, eop_token_id=10,
        image=img, patch_size=(2, 4, 4), pool_size=(1, 2, 2), attn_impl="xla",
    )
    return res.tokens, res.num_generated, res.hidden


def _shard(params, batch, mesh):
    sp = jax.device_put(params, param_shardings(params, mesh))
    sb = tuple(
        jax.device_put(x, s)
        for x, s in zip(batch, jax.tree.leaves(batch_shardings(list(batch), mesh)))
    )
    return sp, sb


def test_tp_generate_matches_replicated():
    cfg = MMMMConfig.tiny()
    params = MMMMModel(cfg).init(jax.random.PRNGKey(0))
    batch = _tiny_batch(cfg)
    fn = jax.jit(functools.partial(_gen, cfg=cfg))

    tok_ref, n_ref, hid_ref = fn(params, batch=batch)
    mesh = make_mesh(data=2, model=4)
    sp, sb = _shard(params, batch, mesh)
    tok_tp, n_tp, hid_tp = fn(sp, batch=sb)

    np.testing.assert_array_equal(np.asarray(tok_tp), np.asarray(tok_ref))
    np.testing.assert_array_equal(np.asarray(n_tp), np.asarray(n_ref))
    np.testing.assert_allclose(
        np.asarray(hid_tp, np.float32), np.asarray(hid_ref, np.float32), atol=2e-4
    )


def test_tp_generate_quantized_matches_replicated():
    """W8A16 serving weights ({"q","s"} leaves) shard under the quant TP rules;
    sharded == replicated on the quantized path (both sides quantized — int8
    itself legitimately changes tokens vs bf16)."""
    from mmmm_tpu.ops.quant import quantize_llm_for_serving

    cfg = MMMMConfig.tiny()
    params = MMMMModel(cfg).init(jax.random.PRNGKey(0))
    params = dict(params)
    params["cogvlm"] = quantize_llm_for_serving(
        dict(params["cogvlm"]), release_originals=False
    )
    batch = _tiny_batch(cfg)
    fn = jax.jit(functools.partial(_gen, cfg=cfg))

    tok_ref, n_ref, _ = fn(params, batch=batch)
    mesh = make_mesh(data=2, model=4)
    # quantized qkv/gate/up tensors + scales must actually shard (not fall to
    # replicate): the whole point of TP serving is 1/TP weight reads/device
    sh = param_shardings(params, mesh)
    qkv_spec = sh["cogvlm"]["llm"]["layers"]["lang_qkv"]["q"].spec
    assert "model" in qkv_spec, qkv_spec
    s_spec = sh["cogvlm"]["llm"]["layers"]["lang_qkv"]["s"].spec
    assert "model" in s_spec, s_spec
    head_spec = sh["cogvlm"]["llm"]["lm_head"]["q"].spec
    assert "model" in head_spec, head_spec

    sp, sb = _shard(params, batch, mesh)
    tok_tp, n_tp, _ = fn(sp, batch=sb)
    np.testing.assert_array_equal(np.asarray(tok_tp), np.asarray(tok_ref))
    np.testing.assert_array_equal(np.asarray(n_tp), np.asarray(n_ref))


@pytest.mark.slow
def test_17b_full_generate_lowers_under_tp():
    """The FULL flagship generate program — multimodal prefill + decode scan +
    (B, H, Smax, D) caches — AOT-lowers at 17 B under (data=2, model=4); int8
    serving weights/device fit a v5e with headroom. This is the program TP
    serving actually runs (the round-2 lowering test covered prefill only)."""
    from mmmm_tpu.models.cogvlm import CogVLMConfig
    from mmmm_tpu.models.segvol import SamConfig
    from mmmm_tpu.ops.quant import quantize_int8

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(data=2, model=4)
    cfg = MMMMConfig(vlm=CogVLMConfig.cogvlm17b(), sam=SamConfig())
    model = MMMMModel(cfg)

    params_a = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), jnp.bfloat16))

    # abstract W8A16 transform: expert weights + lm_head as {"q","s"} structs
    def q_abs(w):
        return {
            "q": jax.ShapeDtypeStruct(w.shape, jnp.int8),
            "s": jax.ShapeDtypeStruct((*w.shape[:-2], 1, w.shape[-1]), jnp.float32),
        }

    llm = dict(params_a["cogvlm"]["llm"])
    layers = dict(llm["layers"])
    for k in ("vis_qkv", "lang_qkv", "vis_dense", "lang_dense"):
        layers[k] = q_abs(layers[k])
    for mk in ("vis_mlp", "lang_mlp"):
        mlp = dict(layers[mk])
        for k in ("gate", "up", "down"):
            mlp[k] = q_abs(mlp[k])
        layers[mk] = mlp
    llm["layers"] = layers
    llm["lm_head"] = q_abs(llm["lm_head"])
    params_a = dict(params_a)
    params_a["cogvlm"] = dict(params_a["cogvlm"], llm=llm)

    shardings = param_shardings(params_a, mesh)
    params_sds = jax.tree_util.tree_map(
        lambda l, s: jax.ShapeDtypeStruct(l.shape, l.dtype, sharding=s),
        params_a, shardings,
    )
    b, s = 8, 256
    from jax.sharding import NamedSharding, PartitionSpec as P

    def sds(shape, dt):
        return jax.ShapeDtypeStruct(shape, dt, sharding=NamedSharding(
            mesh, P("data", *([None] * (len(shape) - 1)))
        ))

    batch_sds = (
        sds((b, s), np.int32), sds((b, s), np.int32), sds((b, s), np.int32),
        sds((b,), np.int32), sds((b, 3, 32, 384, 384), np.float32),
    )

    def gen(params, ids, tt, pos, plen, img):
        res = greedy_generate(
            params["cogvlm"], cfg.vlm, ids, tt, pos, plen,
            max_new_tokens=8, eos_token_id=2, bop_token_id=32001,
            eop_token_id=32002, image=img, patch_size=(16, 16, 16),
            pool_size=(2, 2, 2), attn_impl="xla",
        )
        return res.tokens, res.num_generated

    lowered = jax.jit(gen).lower(params_sds, *batch_sds)
    assert lowered is not None
    pb = bytes_per_device(params_a, shardings)
    print(f"17B W8A16 serving TP=4: params/device = {pb/2**30:.2f} GiB")
    # int8 experts + bf16 everything-else over TP=4 must leave cache headroom
    assert pb < 10 * 1024**3, f"{pb/2**30:.2f} GiB"
