"""Step checkpointing + adapter export.

Replaces Lightning ``ModelCheckpoint`` + PEFT adapter saving
(``conf/phase-vg/fit.yaml:17-24``, ``mmmm.py:140-155``): orbax saves the full
train state (trainable params + optimizer state + step) every N steps with
retention, and the LoRA/finetune trees export separately as the
adapter-equivalent artifact (the unit of model state, as in the reference
where released checkpoints are PEFT adapters).
"""
from __future__ import annotations

from pathlib import Path

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str | Path, save_every: int, keep: int | None = None):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.save_every = save_every
        options = ocp.CheckpointManagerOptions(
            save_interval_steps=save_every,
            max_to_keep=keep,
        )
        self.manager = ocp.CheckpointManager(self.directory, options=options)

    def maybe_save(self, step: int, state) -> bool:
        saved = self.manager.save(step, args=ocp.args.StandardSave(state))
        return bool(saved)

    def latest_step(self) -> int | None:
        return self.manager.latest_step()

    def restore(self, state_like):
        step = self.manager.latest_step()
        if step is None:
            return None, None
        restored = self.manager.restore(step, args=ocp.args.StandardRestore(state_like))
        return step, restored

    def wait(self):
        self.manager.wait_until_finished()


def save_adapter(path: str | Path, trainable: dict) -> None:
    """Flat-npz export of the trainable (LoRA + finetuned) tree."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    flat = {}

    def walk(tree, prefix=""):
        for k, v in tree.items():
            p = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                walk(v, p)
            else:
                flat[p] = np.asarray(v)

    walk(trainable)
    np.savez_compressed(path, **flat)


def load_adapter(path: str | Path) -> dict:
    data = np.load(path)
    tree: dict = {}
    for key in data.files:
        cur = tree
        parts = key.split("/")
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = data[key]
    return tree
