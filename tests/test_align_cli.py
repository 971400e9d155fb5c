"""Align-sam CLI smoke test + imported-checkpoint-runs test."""
import json
import sys
from pathlib import Path

import jax
import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent / "scripts"))

from test_data_pipeline import _make_seg_case


def test_align_sam_cli(tmp_path):
    ds = tmp_path / "SegSet"
    for i in range(2):
        _make_seg_case(ds, f"case{i}", rng=np.random.default_rng(i))
    cfg = tmp_path / "fit.yaml"
    cfg.write_text(f"""
sam:
  embed_dim: 32
  encoder_num_layers: 2
  encoder_num_heads: 4
  patch_size: [4, 4, 4]
  pos_embed_shape: [2, 4, 4]
  num_instances: 3
  decoder_mlp_dim: 64
align:
  patch_shape: [4, 16, 16]
  patch_size_z: 2
  max_classes: 3
  num_neg: 1
vit_patch_size: [2, 4, 4]
optimizer: {{lr: 1.0e-3, warmup_steps: 1, max_steps: 3}}
trainer: {{max_steps: 3, batch_size: 2, log_every: 1, out_dir: {tmp_path}/run}}
data:
  datasets:
    - {{dir: {ds}}}
""")
    import align_sam

    align_sam.main(["-c", str(cfg)])
    metrics = [json.loads(l) for l in (tmp_path / "run/metrics.jsonl").read_text().splitlines()]
    assert metrics[-1]["step"] == 3
    assert np.isfinite(metrics[-1]["loss"])
    assert (tmp_path / "run/sam_aligned.npz").exists()


def test_imported_cogvlm_checkpoint_runs_forward():
    """Importer output feeds cogvlm_forward directly (layout correctness)."""
    import jax.numpy as jnp

    from test_import_torch import _fake_cogvlm_sd

    from mmmm_tpu.models.cogvlm import CogVLMConfig, cogvlm_forward
    from mmmm_tpu.train.import_torch import import_cogvlm

    cfg = CogVLMConfig.tiny(vocab_size=100)
    tree = import_cogvlm(_fake_cogvlm_sd(cfg, base_vocab=92), cfg)
    tree = jax.tree.map(jnp.asarray, tree)
    b, s, n_vis = 1, 20, 10
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(4, 100, size=(b, s)), jnp.int32)
    tt = jnp.zeros((b, s), jnp.int32).at[:, 1 : 1 + n_vis].set(1)
    pos = jnp.broadcast_to(jnp.arange(s), (b, s))
    seg = jnp.ones((b, s), jnp.int32)
    img = jnp.ones((b, 3, 4, 16, 16), jnp.float32)
    hidden, logits = cogvlm_forward(
        tree, cfg, ids, tt, pos, seg, img, (2, 4, 4), (1, 2, 2), attn_impl="xla"
    )
    assert logits.shape == (b, s, 100)
    assert np.isfinite(np.asarray(logits)).all()
