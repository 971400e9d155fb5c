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

    def force_save(self, step: int, state) -> None:
        """Unconditional save (preemption path), ignoring the step interval.

        No-op when the step is already on disk (orbax's interval policy saves
        the first step it sees, which would otherwise collide here)."""
        if step in self.manager.all_steps():
            return
        self.manager.save(step, args=ocp.args.StandardSave(state), force=True)

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


def save_params(path: str | Path, tree) -> None:
    """Flat-npz save of an arbitrary dict/list tree of arrays (list indices
    become ``idx:N`` key segments). Non-array leaves are JSON-encoded."""
    import json

    path = Path(path)
    if path.suffix != ".npz":
        path = path / "params.npz"
    path.parent.mkdir(parents=True, exist_ok=True)
    flat = {}

    def walk(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{prefix}/{k}" if prefix else str(k))
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                walk(v, f"{prefix}/idx:{i}" if prefix else f"idx:{i}")
        elif hasattr(node, "shape"):
            flat[prefix] = np.asarray(node)
        else:
            flat[prefix + "\x00json"] = np.frombuffer(
                json.dumps(node).encode(), dtype=np.uint8
            )

    walk(tree, "")
    np.savez_compressed(path, **flat)


def load_params(path: str | Path):
    """Inverse of ``save_params``."""
    import json

    path = Path(path)
    if path.suffix != ".npz":
        path = path / "params.npz"
    data = np.load(path)
    tree: dict = {}
    for key in data.files:
        is_json = key.endswith("\x00json")
        parts = (key[: -len("\x00json")] if is_json else key).split("/")
        cur = tree
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = json.loads(bytes(data[key]).decode()) if is_json else data[key]

    def listify(node):
        if not isinstance(node, dict):
            return node
        node = {k: listify(v) for k, v in node.items()}
        if node and all(k.startswith("idx:") for k in node):
            return [node[f"idx:{i}"] for i in range(len(node))]
        return node

    return listify(tree)
