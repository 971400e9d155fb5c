#!/usr/bin/env python
"""Baseline VQA/report finetuning harnesses (HF torch models).

Equivalent of the reference's per-baseline finetune datamodules
(``/root/reference/scripts/finetune/cli.py:11-64``, ``_vqa/_base.py``): each
baseline gets a transform that builds supervised (inputs, labels) through its
OWN processor/prompt format, and a small torch training loop drives it over a
processed VL dataset (the same ``{split}.json`` contract the MMMM datamodule
reads). Implemented: instructblip, llavanext (HF-native); the reference's
RadFM/R2GenGPT vendored architectures remain predict-hooks in
``scripts/evaluate/baselines.py``.

Supervision follows the reference's scheme (``_vqa/_base.py:30-60``): the
prompt tokens are CE-ignored, the answer tokens are supervised. By default
only the language-model tail finetunes (vision towers frozen) so the loop is
CPU-feasible; ``--train-all`` unfreezes everything.

    python scripts/finetune/baselines.py --model instructblip \
        --checkpoint <hf dir> --processor <hf dir> \
        --dataset-dir <processed/VQA-RAD> --out runs/ft-iblip
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

CE_IGNORE_INDEX = -100


# -- per-model supervised-example builders -----------------------------------

def _mask_prompt(inputs, processor, answer: str):
    """CE-mask everything except the answer suffix (the processor may prepend
    image placeholder tokens, so a prompt-length prefix count is unreliable —
    the answer token count from the end is)."""
    n_answer = len(processor.tokenizer(answer, add_special_tokens=False)["input_ids"])
    labels = inputs["input_ids"].clone()
    labels[:, : labels.shape[1] - n_answer] = CE_IGNORE_INDEX
    inputs["labels"] = labels
    return inputs


def instructblip_example(processor, image, question: str, answer: str):
    """InstructBLIP: 'Question: {q} Answer: {a}', prompt CE-masked, qformer
    sees the instruction only (ref ``scripts/finetune/_vqa`` prompt format)."""
    prompt = f"Question: {question} Answer: "
    inputs = processor(images=image, text=prompt + answer, return_tensors="pt")
    inputs = _mask_prompt(inputs, processor, answer)
    q_inputs = processor.qformer_tokenizer(prompt, return_tensors="pt")
    inputs["qformer_input_ids"] = q_inputs["input_ids"]
    inputs["qformer_attention_mask"] = q_inputs["attention_mask"]
    return inputs


def llavanext_example(processor, image, question: str, answer: str):
    """LLaVA-NeXT: '[INST] <image> q [/INST] a', prompt + image placeholders
    CE-masked (llava-v1.6 conversation format)."""
    prompt = f"[INST] <image>\n{question} [/INST] "
    inputs = processor(images=image, text=prompt + answer, return_tensors="pt")
    return _mask_prompt(inputs, processor, answer)


EXAMPLE_BUILDERS = {
    "instructblip": instructblip_example,
    "llavanext": llavanext_example,
}


def _freeze_for_finetune(model, train_all: bool):
    """Vision towers frozen; language model trains (reference finetunes the
    LM with PEFT — without the peft lib we finetune the LM weights directly)."""
    if train_all:
        return
    for name, p in model.named_parameters():
        p.requires_grad = "language_model" in name or "lm_head" in name or "text_model" in name


def iter_vqa_items(dataset_dir: Path, split: str = "train"):
    """Yield (image_path, question, answer) from the processed VL contract."""
    from mmmm_tpu.data.defs import Split
    from mmmm_tpu.data.vl import get_vl_data_list

    for item in get_vl_data_list(Path(dataset_dir), Split(split)):
        image = item["image"][0]
        if item.get("vqa"):
            for qa in item["vqa"]:
                yield image, qa["question"], qa["answer"]
        elif item.get("processed_report") or item.get("findings"):
            report = item.get("processed_report") or item["findings"]
            yield image, "Please write a radiology report for this image.", report


# the reference's report-generation finetune prompt, verbatim
# (/root/reference/scripts/finetune/_rg/_base.py:35)
RG_PROMPT = "Please write a radiology report for me:"


def iter_report_items(dataset_dir: Path, split: str = "train"):
    """Yield (image_path, RG_PROMPT, report) per the reference ``_rg/_base.py``
    contract: prompt CE-masked, the processed report supervised."""
    from mmmm_tpu.data.defs import Split
    from mmmm_tpu.data.vl import get_vl_data_list

    for item in get_vl_data_list(Path(dataset_dir), Split(split)):
        report = item.get("processed_report") or item.get("findings")
        if report and item.get("image"):
            yield item["image"][0], RG_PROMPT, report


def finetune_torch_model(
    model,
    processor,
    examples,  # iterable of (image_path_or_PIL, question, answer)
    example_builder,
    *,
    steps: int = 100,
    lr: float = 2e-5,
    grad_accum: int = 4,
    log_every: int = 10,
    train_all: bool = False,
) -> list[float]:
    """The shared training loop; returns per-log-step mean losses."""
    import torch

    _freeze_for_finetune(model, train_all)
    params = [p for p in model.parameters() if p.requires_grad]
    assert params, "nothing trainable after freezing"
    opt = torch.optim.AdamW(params, lr=lr, weight_decay=0.01)
    model.train()
    losses, window = [], []
    pool = list(examples)
    step = 0
    while step < steps:
        for image, q, a in pool:
            if step >= steps:
                break
            if isinstance(image, (str, Path)):
                from PIL import Image

                image = Image.open(image).convert("RGB")
            inputs = example_builder(processor, image, q, a)
            out = model(**inputs)
            (out.loss / grad_accum).backward()
            window.append(float(out.loss.detach()))
            step += 1
            if step % grad_accum == 0:
                torch.nn.utils.clip_grad_norm_(params, 1.0)
                opt.step()
                opt.zero_grad()
            if step % log_every == 0:
                losses.append(sum(window) / len(window))
                print(json.dumps({"step": step, "loss": losses[-1]}), flush=True)
                window = []
    return losses


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=sorted(EXAMPLE_BUILDERS), required=True)
    ap.add_argument("--checkpoint", required=True, help="local HF model dir")
    ap.add_argument("--processor", help="local HF processor dir (default: checkpoint)")
    ap.add_argument("--dataset-dir", required=True)
    ap.add_argument("--task", choices=["vqa", "report"], default="vqa")
    ap.add_argument("--split", default="train")
    ap.add_argument("--out", required=True)
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--lr", type=float, default=2e-5)
    ap.add_argument("--grad-accum", type=int, default=8)
    ap.add_argument("--train-all", action="store_true")
    args = ap.parse_args(argv)

    if args.model == "instructblip":
        from transformers import InstructBlipForConditionalGeneration, InstructBlipProcessor

        model = InstructBlipForConditionalGeneration.from_pretrained(
            args.checkpoint, local_files_only=True, low_cpu_mem_usage=True
        )
        processor = InstructBlipProcessor.from_pretrained(
            args.processor or args.checkpoint, local_files_only=True
        )
    else:
        from transformers import LlavaNextForConditionalGeneration, LlavaNextProcessor

        model = LlavaNextForConditionalGeneration.from_pretrained(
            args.checkpoint, local_files_only=True, low_cpu_mem_usage=True
        )
        processor = LlavaNextProcessor.from_pretrained(
            args.processor or args.checkpoint, local_files_only=True
        )

    iterate = iter_report_items if args.task == "report" else iter_vqa_items
    losses = finetune_torch_model(
        model, processor, iterate(Path(args.dataset_dir), args.split),
        EXAMPLE_BUILDERS[args.model], steps=args.steps, lr=args.lr,
        grad_accum=args.grad_accum, train_all=args.train_all,
    )
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    model.save_pretrained(out)
    processor.save_pretrained(out)
    (out / "finetune_losses.json").write_text(json.dumps(losses))
    print(f"saved finetuned {args.model} to {out}")


if __name__ == "__main__":
    main()
