"""Device-mesh construction for the (data, model) SPMD layout.

Replaces the reference's torch.distributed/NCCL process-group setup
(``conf/phase-vg/fit.yaml:11-16``): one ``jax.sharding.Mesh`` whose ``data``
axis carries batch parallelism (the reference's DDP) and whose ``model`` axis
carries megatron-style tensor parallelism over ICI. Collectives are emitted by
XLA from sharding annotations; there is no hand-written communication.
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(
    data: int | None = None, model: int = 1, seq: int = 1, devices=None
) -> Mesh:
    """Build a (data, model[, seq]) mesh. ``data=None`` uses all remaining
    devices. ``seq>1`` adds a sequence-parallel axis (innermost, so ring
    attention's ppermute rides neighboring ICI links)."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        if n % (model * seq):
            raise ValueError(f"{n} devices not divisible by model={model} x seq={seq}")
        data = n // (model * seq)
    if data * model * seq != n:
        devices = devices[: data * model * seq]
    if seq > 1:
        arr = np.asarray(devices).reshape(data, model, seq)
        return Mesh(arr, ("data", "model", "seq"))
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))
