"""Baseline finetuning harnesses (instructblip / llavanext) on tiny
random-init HF models — the reference's per-baseline finetune datamodules
(``scripts/finetune/cli.py:11-64``) re-done HF-native."""
import json
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent / "scripts" / "finetune"))

from baselines import (  # noqa: E402
    CE_IGNORE_INDEX,
    finetune_torch_model,
    instructblip_example,
    iter_vqa_items,
    llavanext_example,
)


def _word_tokenizer():
    from tokenizers import Tokenizer, models as tkm, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    tok = Tokenizer(tkm.WordLevel(
        {**{f"tok{i}": i for i in range(289)}, "[UNK]": 289}, unk_token="[UNK]"
    ))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    htok = PreTrainedTokenizerFast(
        tokenizer_object=tok, unk_token="[UNK]", pad_token="[UNK]",
        bos_token="tok0", eos_token="tok1",
    )
    htok.add_tokens(["<image>"], special_tokens=True)
    return htok


@pytest.fixture(scope="module")
def tiny_instructblip():
    from transformers import (
        BlipImageProcessor,
        InstructBlipConfig,
        InstructBlipForConditionalGeneration,
        InstructBlipProcessor,
    )

    htok = _word_tokenizer()
    img_id = htok.convert_tokens_to_ids("<image>")
    cfg = InstructBlipConfig(
        vision_config=dict(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                           num_attention_heads=4, image_size=32, patch_size=16),
        qformer_config=dict(hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
                            intermediate_size=64, encoder_hidden_size=32, vocab_size=300),
        text_config=dict(model_type="opt", hidden_size=32, ffn_dim=64, num_hidden_layers=2,
                         num_attention_heads=4, vocab_size=300,
                         max_position_embeddings=128, word_embed_proj_dim=32),
        num_query_tokens=4, image_token_index=img_id,
    )
    model = InstructBlipForConditionalGeneration(cfg)
    proc = InstructBlipProcessor(
        image_processor=BlipImageProcessor(size={"height": 32, "width": 32}),
        tokenizer=htok, qformer_tokenizer=htok, num_query_tokens=4,
    )
    return model, proc


@pytest.fixture(scope="module")
def tiny_llavanext():
    from transformers import (
        LlavaNextConfig,
        LlavaNextForConditionalGeneration,
        LlavaNextImageProcessor,
        LlavaNextProcessor,
    )

    htok = _word_tokenizer()
    img_id = htok.convert_tokens_to_ids("<image>")
    pin = [[32, 32], [32, 64], [64, 32]]
    cfg = LlavaNextConfig(
        vision_config=dict(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                           num_attention_heads=4, image_size=32, patch_size=16, vocab_size=10),
        text_config=dict(model_type="llama", hidden_size=32, intermediate_size=64,
                         num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
                         vocab_size=300, max_position_embeddings=512),
        image_token_index=img_id, image_grid_pinpoints=pin,
        vision_feature_select_strategy="default",
    )
    model = LlavaNextForConditionalGeneration(cfg)
    proc = LlavaNextProcessor(
        image_processor=LlavaNextImageProcessor(
            size={"shortest_edge": 32}, crop_size={"height": 32, "width": 32},
            image_grid_pinpoints=pin,
        ),
        tokenizer=htok, patch_size=16, vision_feature_select_strategy="default",
        image_token="<image>", num_additional_image_tokens=1,
    )
    return model, proc


def _image():
    from PIL import Image

    return Image.fromarray(np.zeros((40, 48, 3), np.uint8))


def test_instructblip_example_masks_prompt(tiny_instructblip):
    _, proc = tiny_instructblip
    inputs = instructblip_example(proc, _image(), "tok3 tok4 ?", "tok5 tok6")
    labels = inputs["labels"][0].numpy()
    n_ans = len(proc.tokenizer("tok5 tok6", add_special_tokens=False)["input_ids"])
    assert (labels[:-n_ans] == CE_IGNORE_INDEX).all()
    assert (labels[-n_ans:] != CE_IGNORE_INDEX).all()
    assert "qformer_input_ids" in inputs


def test_llavanext_example_masks_prompt_and_image(tiny_llavanext):
    _, proc = tiny_llavanext
    inputs = llavanext_example(proc, _image(), "tok3 ?", "tok7")
    labels = inputs["labels"][0].numpy()
    ids = inputs["input_ids"][0].numpy()
    img_id = proc.tokenizer.convert_tokens_to_ids("<image>")
    assert (ids == img_id).sum() > 1  # placeholder expanded
    assert (labels[ids == img_id] == CE_IGNORE_INDEX).all()
    assert labels[-1] != CE_IGNORE_INDEX


@pytest.mark.parametrize("which", ["instructblip", "llavanext"])
def test_finetune_loop_loss_decreases(which, tiny_instructblip, tiny_llavanext, tmp_path):
    model, proc = tiny_instructblip if which == "instructblip" else tiny_llavanext
    builder = instructblip_example if which == "instructblip" else llavanext_example
    examples = [(_image(), "tok3 tok4 ?", "tok5 tok6")] * 4
    losses = finetune_torch_model(
        model, proc, examples, builder,
        steps=24, lr=5e-3, grad_accum=2, log_every=4, train_all=False,
    )
    assert losses[-1] < losses[0], losses
    # vision tower stayed frozen
    vt = [p for n, p in model.named_parameters() if "vision" in n and p.requires_grad]
    assert not vt


def test_iter_vqa_items_contract(tmp_path):
    items = [
        {"key": "a", "image": ["img.png"],
         "vqa": [{"question": "q1", "answer": "a1"}, {"question": "q2", "answer": "a2"}]},
        {"key": "b", "image": ["img2.png"], "processed_report": "All clear."},
    ]
    (tmp_path / "train.json").write_text(json.dumps(items))
    got = list(iter_vqa_items(tmp_path))
    assert len(got) == 3
    assert got[2][2] == "All clear."


def test_iter_report_items_contract(tmp_path):
    """The _rg finetune contract (ref _rg/_base.py): reference prompt verbatim,
    the processed report as the supervised answer, vqa-only items skipped."""
    from baselines import RG_PROMPT, iter_report_items

    items = [
        {"key": "a", "image": ["img.png"],
         "vqa": [{"question": "q1", "answer": "a1"}]},
        {"key": "b", "image": ["img2.png"], "processed_report": "All clear."},
        {"key": "c", "image": ["img3.png"], "findings": "Nodule in RUL."},
    ]
    (tmp_path / "train.json").write_text(json.dumps(items))
    got = list(iter_report_items(tmp_path))
    assert [(g[1], g[2]) for g in got] == [
        (RG_PROMPT, "All clear."), (RG_PROMPT, "Nodule in RUL."),
    ]
    assert RG_PROMPT == "Please write a radiology report for me:"


def test_finetune_report_task_smoke(tiny_instructblip):
    """Report-gen finetune (the _rg path) trains through the same loop."""
    from baselines import RG_PROMPT

    model, proc = tiny_instructblip
    examples = [(_image(), RG_PROMPT, "tok5 tok6 tok5")] * 4
    losses = finetune_torch_model(
        model, proc, examples, instructblip_example,
        steps=16, lr=5e-3, grad_accum=2, log_every=4, train_all=False,
    )
    assert losses[-1] < losses[0], losses


# -- the round-5 additions: cogvlm / llavamed / m3d builders ------------------

def _shim(extra_tokens=(), **kw):
    from baselines import SimpleVLProcessor

    htok = _word_tokenizer()
    if extra_tokens:
        htok.add_tokens(list(extra_tokens), special_tokens=True)
    return SimpleVLProcessor(htok, (32, 32), **kw)


def test_pack_qa_pairs_reference_label_scheme():
    """Multi-pair packing must match _vqa/_base.py:30-60 exactly: prompts
    CE-ignored, answers supervised, the 2nd+ pair's first prompt slot
    supervises eos, bos bookends both tensors."""
    from baselines import pack_qa_pairs

    proc = _shim()
    tok = proc.tokenizer
    ids, labels = pack_qa_pairs(tok, [("tok3", "tok5 tok6"), ("tok4", "tok7")])
    ids, labels = ids[0].tolist(), labels[0].tolist()
    assert ids[0] == tok.bos_token_id and ids[-1] == tok.eos_token_id
    assert labels[0] == tok.bos_token_id and labels[-1] == tok.eos_token_id
    p1 = tok.encode("Question: tok3 Answer:", add_special_tokens=False)
    a1 = tok.encode("tok5 tok6", add_special_tokens=False)
    p2 = tok.encode("Question: tok4 Answer:", add_special_tokens=False)
    a2 = tok.encode("tok7", add_special_tokens=False)
    assert ids[1:] == p1 + a1 + p2 + a2 + [tok.eos_token_id]
    expect = ([CE_IGNORE_INDEX] * len(p1) + a1
              + [tok.eos_token_id] + [CE_IGNORE_INDEX] * (len(p2) - 1) + a2)
    assert labels[1:-1] == expect


def test_cogvlm_example_vision_span_expansion():
    """cogvlm builder reproduces _vqa/cogvlm.py:44-66: a 1226-slot vision
    span at position 1, text ids re-scattered around it, labels ignored on
    the span, images (B, 1, C, H, W)."""
    from baselines import cogvlm_example

    nvis = 7  # tiny stand-in for 35*35+2
    proc = _shim(num_vision_tokens=nvis)
    out = cogvlm_example(proc, _image(), "tok3 ?", "tok5")
    tt = out["token_type_ids"][0]
    assert tt[1 : 1 + nvis].eq(1).all() and tt[0] == 0 and tt[1 + nvis :].eq(0).all()
    # text ids survive the expansion in order
    import torch

    from baselines import pack_qa_pairs

    ids_flat, labels_flat = pack_qa_pairs(proc.tokenizer, [("tok3 ?", "tok5")])
    assert torch.equal(out["input_ids"][0][tt == 0], ids_flat[0])
    assert torch.equal(out["labels"][0][tt == 0], labels_flat[0])
    assert (out["labels"][0][tt == 1] == CE_IGNORE_INDEX).all()
    assert out["images"].shape == (1, 1, 3, 32, 32)


def test_llavamed_example_image_sentinel_and_masking():
    from baselines import LLAVA_IMAGE_TOKEN_INDEX, llavamed_example

    proc = _shim(extra_tokens=("<image>",))
    out = llavamed_example(proc, _image(), "tok3 ?", "tok5")
    ids = out["input_ids"][0]
    assert (ids == LLAVA_IMAGE_TOKEN_INDEX).sum() == 1
    # the whole first prompt (image token included) is CE-masked
    sent = (ids == LLAVA_IMAGE_TOKEN_INDEX).nonzero()[0, 0]
    assert out["labels"][0][sent] == CE_IGNORE_INDEX
    assert out["images"].shape == (1, 3, 32, 32)


def test_m3d_example_patch_prefix_and_volume():
    import torch

    from baselines import m3d_example

    proc = _shim(extra_tokens=("<im_patch>",), proj_out_num=5)
    out = m3d_example(proc, _image(), "tok3 ?", "tok5")
    pid = proc.tokenizer.convert_tokens_to_ids("<im_patch>")
    assert (out["input_ids"][0] == pid).sum() == 5
    assert (out["labels"][0][out["input_ids"][0] == pid] == CE_IGNORE_INDEX).all()
    assert out["images"].shape == (1, 1, 32, 32, 32)
    assert out["images"].dtype == torch.bfloat16
    # constant-depth volume: every depth slice equals the X-ray
    assert torch.equal(out["images"][0, 0, 0], out["images"][0, 0, 17])


def test_finetune_loop_with_reference_signature_model():
    """The three new baselines' models take (input_ids, images, labels, ...)
    rather than HF pixel_values; drive the shared loop through a tiny module
    with that exact signature to pin the integration."""
    import torch
    import torch.nn as nn

    from baselines import finetune_torch_model, m3d_example

    proc = _shim(extra_tokens=("<im_patch>",), proj_out_num=3)
    vocab = len(proc.tokenizer)

    class TinyRefModel(nn.Module):
        def __init__(self):
            super().__init__()
            self.vision_tower = nn.Linear(32 * 32, 8)  # must stay frozen
            self.embed = nn.Embedding(vocab, 16)
            self.lm_head = nn.Linear(16, vocab)

        def forward(self, input_ids, images, attention_mask, labels):
            x = self.embed(input_ids.clamp(min=0))
            logits = self.lm_head(x)
            loss = nn.functional.cross_entropy(
                logits[:, :-1].flatten(0, 1), labels[:, 1:].flatten(),
                ignore_index=CE_IGNORE_INDEX,
            )
            return type("O", (), {"loss": loss})()

    model = TinyRefModel()
    losses = finetune_torch_model(
        model, proc, [(_image(), "tok3 ?", "tok5 tok6")] * 4, m3d_example,
        steps=16, lr=5e-2, grad_accum=2, log_every=4,
        freeze_pred="by_vision_substring",
    )
    assert losses[-1] < losses[0], losses
    assert not model.vision_tower.weight.requires_grad
    assert model.lm_head.weight.requires_grad
