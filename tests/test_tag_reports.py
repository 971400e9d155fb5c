"""End-to-end VG tagging driver (weak #7): reports -> tag_reports.py ->
vg json -> GRGTransform, incl. the REAL llm_batch generator in the loop."""
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent / "scripts" / "data"))

from tag_reports import tag_dataset  # noqa: E402


def _dataset(tmp_path):
    d = tmp_path / "MIMIC-CXR"
    d.mkdir()
    items = [
        {"key": "s1", "image": ["s1.jpg"], "plane": ["PA"],
         "processed_report": "There is a nodule in the left lung."},
        {"key": "s2", "image": ["s2.jpg"], "plane": ["PA"],
         "processed_report": "Cardiomegaly is present."},
    ]
    (d / "train.json").write_text(json.dumps(items))
    return d


def test_taxonomy_path_feeds_grg(tmp_path):
    src = _dataset(tmp_path)
    out = tmp_path / "vg"
    path = tag_dataset(src, "train", out)
    items = json.loads(path.read_text())
    assert all(i["tagger"] == "taxonomy" for i in items)
    tags = {t["target"] for i in items for t in i["tags"]}
    assert {"lung nodule", "left lung", "cardiomegaly"} <= tags
    # offsets round-trip against ref_report (the grg contract)
    for i in items:
        for t in i["tags"]:
            assert i["ref_report"][t["start"]:t["end"]]


def test_llm_path_valid_markdown_accepted(tmp_path):
    src = _dataset(tmp_path)

    def fake_llm(prompts):
        out = []
        for p in prompts:
            report = p.rsplit("Report: ", 1)[1].rsplit("\nAnnotated:", 1)[0]
            out.append(report.replace("nodule", "[nodule](lung nodule)")
                             .replace("Cardiomegaly", "[Cardiomegaly](cardiomegaly)"))
        return out

    path = tag_dataset(src, "train", tmp_path / "vg", fake_llm)
    items = json.loads(path.read_text())
    assert all(i["tagger"] == "llm" for i in items)
    assert items[0]["tags"][0]["target"] == "lung nodule"
    assert items[1]["tags"][0]["target"] == "cardiomegaly"


def test_llm_batch_generator_in_the_loop_with_fallback(tmp_path):
    """The REAL models.llm_batch generator drives the two-pass tagger; the
    random tiny LM emits garbage, the round-trip validator rejects it, and
    every report falls back to the taxonomy tagger — the full production
    wiring minus only the trained checkpoint."""
    import jax

    from mmmm_tpu.data.tokenizer import MMMMTokenizer
    from mmmm_tpu.models.cogvlm import CogVLMConfig
    from mmmm_tpu.models.cogvlm.decoder import init_llm_params
    from mmmm_tpu.models.llm_batch import make_text_generator

    src = _dataset(tmp_path)
    tok = MMMMTokenizer.byte_fallback()
    cfg = CogVLMConfig.tiny(vocab_size=tok.vocab_size)
    params = {"llm": init_llm_params(jax.random.PRNGKey(0), cfg)}
    gen = make_text_generator(params, cfg, tok, max_new_tokens=8, attn_impl="xla")
    path = tag_dataset(src, "train", tmp_path / "vg", gen)
    items = json.loads(path.read_text())
    assert len(items) == 2
    # fallback still produced usable taxonomy tags
    assert any(t["target"] == "lung nodule" for t in items[0]["tags"])


def test_vg_json_consumed_by_grg_transform(tmp_path):
    from PIL import Image

    from mmmm_tpu.data import MMMMTokenizer
    from mmmm_tpu.data.grg import GRGTransConf, GRGTransform, get_grg_data_list
    from mmmm_tpu.data.local import DatasetConf

    src = _dataset(tmp_path)
    out = tmp_path / "vg"
    tag_dataset(src, "train", out)
    # attach images + boxes for the tagged targets
    items = json.loads((out / "train.json").read_text())
    rng = np.random.default_rng(0)
    for i in items:
        Image.fromarray(rng.integers(0, 255, (64, 64), np.uint8).copy(), "L").save(
            out / i["image"][0]
        )
        (out / f"{i['key']}_box.json").write_text(json.dumps(
            {t["target"]: [[5.0, 5.0, 30.0, 30.0]] for t in i["tags"]}
        ))
    conf = DatasetConf(
        base_vit_patch_size_z=4, vit_patch_size_xy=4, pool_size_xy=1,
        base_pool_size_z=1, max_seq_len=768, max_targets=4, max_instances=8,
    )
    conf.grg_trans = GRGTransConf(max_tokens=64, max_tokens_z=4, grounding_prob=1.0)
    tf = GRGTransform(conf, MMMMTokenizer.byte_fallback(), seed=0)
    dps = [tf(item) for item in get_grg_data_list(out)]
    assert any(dp["grounding"] and dp["instance"] for dp in dps)
