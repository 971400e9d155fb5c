"""HF PEFT adapter export/import round trip."""
import jax
import numpy as np

from mmmm_tpu.models import MMMMConfig, MMMMModel
from mmmm_tpu.peft import LoraConfig, lora_init
from mmmm_tpu.train.peft_export import export_peft_adapter, import_peft_adapter


def test_peft_roundtrip(tmp_path):
    cfg = MMMMConfig.tiny()
    model = MMMMModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    lcfg = LoraConfig(r=4, alpha=8, use_rslora=True)
    lora = lora_init(jax.random.PRNGKey(1), params, lcfg)
    # make B nonzero so the roundtrip is meaningful
    lora = jax.tree.map(lambda x: x + 0.01, lora)

    export_peft_adapter(tmp_path / "adapter", lora, lcfg)
    assert (tmp_path / "adapter/adapter_model.safetensors").exists()
    assert (tmp_path / "adapter/adapter_config.json").exists()

    back, cfg2 = import_peft_adapter(
        tmp_path / "adapter",
        num_layers=cfg.vlm.num_hidden_layers,
        num_vision_layers=cfg.vlm.vision.num_hidden_layers,
    )
    assert cfg2.r == 4 and cfg2.alpha == 8 and cfg2.use_rslora

    def flat(t, prefix=""):
        out = {}
        for k, v in t.items():
            p = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict) and not ("a" in v and "b" in v):
                out.update(flat(v, p))
            else:
                out[p] = v
        return out

    ours = flat(lora["cogvlm"], "cogvlm")
    theirs = flat(back)
    # every mapped factor survives byte-exact
    for path, ab in theirs.items():
        np.testing.assert_allclose(np.asarray(ours[path]["a"]), ab["a"], atol=1e-7)
        np.testing.assert_allclose(np.asarray(ours[path]["b"]), ab["b"], atol=1e-7)
    assert len(theirs) > 10
