"""Self-labeling pipeline test: SAM pseudo-masks -> GRGTransform-consumable files."""
import json
import sys
from pathlib import Path

import jax
import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent / "scripts" / "data"))


def test_self_label_end_to_end(tmp_path):
    import self_label

    from mmmm_tpu.models.segvol import SamConfig, init_sam_params
    from mmmm_tpu.train.checkpoint import save_adapter
    from mmmm_tpu.utils import save_pt_zst

    # tiny aligned-SAM params + embeddings on disk
    cfg = SamConfig.tiny()
    params = init_sam_params(jax.random.PRNGKey(0), cfg)
    save_adapter(tmp_path / "sam.npz", jax.device_get(params))
    rng = np.random.default_rng(0)
    np.savez(
        tmp_path / "embeds.npz",
        **{"liver": rng.normal(size=(cfg.embed_dim,)), "nodule": rng.normal(size=(cfg.embed_dim,))},
    )

    # a vg dataset with one tagged volume
    vg = tmp_path / "CT-demo"
    vg.mkdir()
    vol = rng.integers(0, 255, size=(1, 8, 32, 32), dtype=np.uint8)
    save_pt_zst(vol, vg / "case0.pt.zst")
    report = "The liver is normal. A nodule is seen."
    (vg / "train.json").write_text(json.dumps([{
        "key": "case0",
        "image": ["case0.pt.zst"],
        "ref_report": report,
        "tags": [
            {"start": 4, "end": 9, "target": "liver"},
            {"start": 23, "end": 29, "target": "nodule"},
        ],
    }]))

    (tmp_path / "sam.yaml").write_text(
        "embed_dim: 32\nencoder_num_layers: 2\nencoder_num_heads: 4\n"
        "patch_size: [4, 4, 4]\npos_embed_shape: [2, 4, 4]\nnum_instances: 3\n"
        "decoder_mlp_dim: 64\n"
    )
    self_label.main([
        "--vg-dir", str(vg), "--sam", str(tmp_path / "sam.npz"),
        "--embeddings", str(tmp_path / "embeds.npz"),
        "--sam-config", str(tmp_path / "sam.yaml"),
        "--patch-size", "2", "4", "4", "--grid", "2", "4", "4",
    ])
    assert (vg / "case0_seg.pt.zst").exists()
    assert json.loads((vg / "case0_seg.json").read_text()) == ["liver", "nodule"]

    from mmmm_tpu.utils import load_pt_zst

    masks = load_pt_zst(vg / "case0_seg.pt.zst")
    assert masks.shape == (2, 8, 32, 32) and masks.dtype == bool

    # the produced files feed GRGTransform directly
    from mmmm_tpu.data import MMMMTokenizer
    from mmmm_tpu.data.grg import GRGTransConf, GRGTransform, get_grg_data_list
    from mmmm_tpu.data.local import DatasetConf

    conf = DatasetConf(
        base_vit_patch_size_z=4, vit_patch_size_xy=4, pool_size_xy=1, base_pool_size_z=1,
        max_seq_len=768, max_targets=4,
    )
    conf.grg_trans = GRGTransConf(max_tokens=64, max_tokens_z=4, grounding_prob=1.0)
    tf = GRGTransform(conf, MMMMTokenizer.byte_fallback(), seed=0)
    dp = tf(get_grg_data_list(vg)[0])
    assert dp["masks"] is not None and dp["masks"].shape[0] == 2
