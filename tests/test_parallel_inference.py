"""Tensor-parallel inference: sharded forward == replicated forward."""
import jax
import jax.numpy as jnp
import numpy as np

from mmmm_tpu.models import MMMMConfig, MMMMModel
from mmmm_tpu.models.cogvlm import cogvlm_forward
from mmmm_tpu.parallel import make_mesh
from mmmm_tpu.parallel.sharding import batch_shardings, param_shardings


def test_tp_sharded_forward_matches_replicated():
    cfg = MMMMConfig.tiny()
    params = MMMMModel(cfg).init(jax.random.PRNGKey(0))["cogvlm"]
    b, s, n_vis = 2, 24, 10
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(4, cfg.vlm.vocab_size, size=(b, s)), jnp.int32)
    tt = jnp.zeros((b, s), jnp.int32).at[:, 1 : 1 + n_vis].set(1)
    pos = jnp.broadcast_to(jnp.arange(s), (b, s))
    seg = jnp.ones((b, s), jnp.int32)
    img = jnp.asarray(rng.normal(size=(b, 3, 4, 16, 16)), jnp.float32)

    def fwd(params, ids, tt, pos, seg, img):
        _, logits = cogvlm_forward(
            params, cfg.vlm, ids, tt, pos, seg, img, (2, 4, 4), (1, 2, 2), attn_impl="xla"
        )
        return logits

    ref = jax.jit(fwd)(params, ids, tt, pos, seg, img)

    mesh = make_mesh(data=2, model=4)
    sharded_params = jax.device_put(params, param_shardings(params, mesh))
    batch = (ids, tt, pos, seg, img)
    sharded_batch = tuple(
        jax.device_put(x, s) for x, s in zip(batch, jax.tree.leaves(batch_shardings(list(batch), mesh)))
    )
    got = jax.jit(fwd)(sharded_params, *sharded_batch)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)
