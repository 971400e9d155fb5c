"""CLI + config system + trainer smoke tests (tiny model, synthetic data)."""
import json
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent / "scripts"))

from test_data_pipeline import _make_box_case, _make_seg_case  # noqa: E402

from mmmm_tpu.config import apply_overrides, build, load_yaml  # noqa: E402


def test_config_include_and_interpolation(tmp_path):
    (tmp_path / "base.yaml").write_text("a: 1\nnested:\n  x: 2\n")
    (tmp_path / "main.yaml").write_text(
        "_include: [base.yaml]\nnested:\n  y: ${trainer.steps}\ntrainer:\n  steps: 7\nsub: sub.yaml\n"
    )
    (tmp_path / "sub.yaml").write_text("k: 3\n")
    cfg = load_yaml(tmp_path / "main.yaml")
    assert cfg["a"] == 1
    assert cfg["nested"] == {"x": 2, "y": 7}
    assert cfg["sub"] == {"k": 3}
    cfg = apply_overrides(cfg, ["nested.x=9", "trainer.steps=11"])
    assert cfg["nested"]["x"] == 9


def test_build_dataclass_coercion():
    from mmmm_tpu.models.cogvlm import CogVLMConfig

    cfg = build(CogVLMConfig, {"hidden_size": 32, "vision": {"patch_size": [4, 4, 4]}})
    assert cfg.hidden_size == 32
    assert cfg.vision.patch_size == (4, 4, 4)
    with pytest.raises(KeyError):
        build(CogVLMConfig, {"not_a_field": 1})


def test_phase_configs_load():
    root = Path(__file__).parent.parent
    for phase in (
        "phase-vg", "phase-vlm", "phase-grg", "phase-vg+vlm", "phase-1-hr",
        "tiny",
    ):
        cfg = load_yaml(root / "conf" / phase / "fit.yaml")
        assert cfg["optimizer"]["max_steps"] == cfg["trainer"]["max_steps"]
        assert "model" in cfg and "vlm" in cfg["model"]


def test_auxiliary_configs_build():
    """Every shipped config coerces through the real dataclass builders
    (align-isam, finetune, model-hr): a YAML key that drifted from the
    schema fails here, not at deployment."""
    from mmmm_tpu.config import build
    from mmmm_tpu.models import MMMMConfig
    from mmmm_tpu.models.align import AlignConfig
    from mmmm_tpu.models.segvol import SamConfig
    from mmmm_tpu.peft import LoraConfig
    from mmmm_tpu.train import OptimizerConfig
    from mmmm_tpu.train.trainer import TrainerConfig

    root = Path(__file__).parent.parent / "conf"
    hr = load_yaml(root / "model-hr.yaml")
    mcfg = build(MMMMConfig, hr)
    assert mcfg.vlm.vision.pos_embed_shape == (8, 32, 32)

    isam = load_yaml(root / "align-isam" / "fit.yaml")
    build(SamConfig, isam["sam"])
    build(AlignConfig, {"sam": isam["sam"], "instance": True})
    build(OptimizerConfig, isam["optimizer"])
    build(TrainerConfig, isam["trainer"])

    for name in ("mmmm-vqa.yaml", "mmmm-report.yaml"):
        ft = load_yaml(root / "finetune" / name)
        assert "vlm" in ft["model"]
        build(LoraConfig, ft["lora"])
        build(OptimizerConfig, ft["optimizer"])
        build(TrainerConfig, ft["trainer"])


def test_cli_fit_end_to_end(tmp_path):
    """Full fit run: config -> model -> synthetic data -> 4 train steps -> ckpt + adapter."""
    ds_root = tmp_path / "SegSet"
    for i in range(4):
        _make_seg_case(ds_root, f"case{i}", rng=np.random.default_rng(i))
    box_root = tmp_path / "BoxSet"
    for i in range(2):
        _make_box_case(box_root, f"case{i}")

    import cli

    out_dir = tmp_path / "run"
    cli.main([
        "fit",
        "-c", str(Path(__file__).parent.parent / "conf/tiny/fit.yaml"),
        "--no-resume",
        f"trainer.out_dir={out_dir}",
        f"data.datasets=[{{name: SegSet, type: local, dir: {ds_root}}}, {{name: BoxSet, type: local, dir: {box_root}}}]",
    ])
    metrics = [json.loads(l) for l in (out_dir / "metrics.jsonl").read_text().splitlines()]
    assert metrics and metrics[-1]["step"] == 4
    assert np.isfinite(metrics[-1]["lm_loss"])
    assert (out_dir / "adapter.npz").exists()
    # checkpoint written at step 4 (ckpt_every=4)
    assert any((out_dir / "ckpt").iterdir())

    # resume path restores the step counter
    cli.main([
        "fit",
        "-c", str(Path(__file__).parent.parent / "conf/tiny/fit.yaml"),
        f"trainer.out_dir={out_dir}",
        "trainer.max_steps=5",
        f"data.datasets=[{{name: SegSet, type: local, dir: {ds_root}}}]",
    ])
    metrics = [json.loads(l) for l in (out_dir / "metrics.jsonl").read_text().splitlines()]
    assert metrics[-1]["step"] == 5


def test_override_before_interpolation(tmp_path):
    """CLI overrides must land before ${...} interpolation resolves
    (regression: overriding trainer.max_steps left the LR schedule stale)."""
    from mmmm_tpu.config import resolve_interpolations

    (tmp_path / "f.yaml").write_text(
        "optimizer:\n  max_steps: ${trainer.max_steps}\ntrainer:\n  max_steps: 4\n"
    )
    cfg = load_yaml(tmp_path / "f.yaml", resolve=False)
    cfg = apply_overrides(cfg, ["trainer.max_steps=150"])
    cfg = resolve_interpolations(cfg)
    assert cfg["optimizer"]["max_steps"] == 150


def test_preemption_checkpoint(tmp_path):
    """A preemption signal saves a resumable checkpoint at the next step
    boundary and stops the run (SURVEY §5.3; the reference has none)."""
    import os
    import signal
    import threading

    ds_root = tmp_path / "SegSet"
    for i in range(4):
        _make_seg_case(ds_root, f"case{i}", rng=np.random.default_rng(i))

    import cli

    out_dir = tmp_path / "run"
    # fire SIGTERM only once the first step has logged (the handler installs
    # at fit() entry; firing during model build would kill the process); the
    # trainer must convert it into a boundary checkpoint, not die mid-step
    stop = threading.Event()

    def fire_after_first_step():
        metrics = out_dir / "metrics.jsonl"
        while not stop.is_set():
            if metrics.exists() and metrics.read_text().strip():
                os.kill(os.getpid(), signal.SIGTERM)
                return
            stop.wait(1.0)

    watcher = threading.Thread(target=fire_after_first_step, daemon=True)
    watcher.start()
    try:
        cli.main([
            "fit",
            "-c", str(Path(__file__).parent.parent / "conf/tiny/fit.yaml"),
            "--no-resume",
            f"trainer.out_dir={out_dir}",
            "trainer.max_steps=500",
            "trainer.ckpt_every=1000",
            "trainer.log_every=1",
            f"data.datasets=[{{name: SegSet, type: local, dir: {ds_root}}}]",
        ])
    finally:
        stop.set()
    # the run stopped early with a checkpoint on disk
    steps = [int(p.name) for p in (out_dir / "ckpt").iterdir() if p.name.isdigit()]
    assert steps, "no preemption checkpoint written"
    assert max(steps) < 500
