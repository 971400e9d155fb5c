"""Stage-0 SAM alignment tests: patch pipeline + training step."""
import jax
import jax.numpy as jnp
import numpy as np

from test_data_pipeline import _make_seg_case

from mmmm_tpu.data.align import AlignPatchTransform, AlignTransConf, collate_align
from mmmm_tpu.data.local import get_local_data_list
from mmmm_tpu.models.align import AlignConfig, align_training_step
from mmmm_tpu.models.segvol import SamConfig, init_sam_params


def test_align_patch_transform(tmp_path):
    root = tmp_path / "SegSet"
    for i in range(2):
        _make_seg_case(root, f"case{i}", rng=np.random.default_rng(i))
    conf = AlignTransConf(patch_shape=(4, 32, 32), patch_size_z=2, max_classes=3, num_neg=1)
    c2i = {"liver": 0, "nodule": 1, "spleen": 2, "pleural effusion": 3}
    tf = AlignPatchTransform(conf, c2i, seed=0)
    items = get_local_data_list(root)
    fg_seen = False
    for _ in range(6):
        dp = tf(items[0])
        assert dp["image"].shape == (3, 4, 32, 32)
        assert dp["masks"].shape == (3, 4, 32, 32)
        assert dp["class_valid"].any()
        if dp["masks"].any():
            fg_seen = True
    assert fg_seen, "fg forcing never produced a foreground patch"


def test_align_training_step_and_grad(tmp_path):
    root = tmp_path / "SegSet"
    for i in range(2):
        _make_seg_case(root, f"case{i}", rng=np.random.default_rng(i))
    conf = AlignTransConf(patch_shape=(4, 16, 16), patch_size_z=2, max_classes=3, num_neg=1)
    c2i = {"liver": 0, "nodule": 1, "spleen": 2, "pleural effusion": 3}
    tf = AlignPatchTransform(conf, c2i, seed=1)
    items = get_local_data_list(root)
    batch = collate_align([tf(items[0]), tf(items[1])])
    batch = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v) for k, v in batch.items()}
    # adapt ViT patch to the tiny config
    batch["patch_size"] = (2, 4, 4)

    acfg = AlignConfig(sam=SamConfig.tiny())
    params = init_sam_params(jax.random.PRNGKey(0), acfg.sam)
    embeds = jnp.asarray(np.random.default_rng(0).normal(size=(4, acfg.sam.embed_dim)), jnp.float32)

    loss, log = align_training_step(params, acfg, embeds, batch, attn_impl="xla")
    assert np.isfinite(float(loss))
    assert "dice-pos" in log

    grads = jax.grad(
        lambda p: align_training_step(p, acfg, embeds, batch, attn_impl="xla")[0]
    )(params)
    gn = float(jnp.sqrt(sum(jnp.sum(g**2) for g in jax.tree.leaves(grads))))
    assert gn > 0 and np.isfinite(gn)
