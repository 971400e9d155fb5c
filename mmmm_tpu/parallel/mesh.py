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
    data: int | None = None,
    model: int = 1,
    seq: int = 1,
    pipe: int = 1,
    devices=None,
) -> Mesh:
    """Build a (pipe,) (data, model[, seq]) mesh. ``data=None`` uses all
    remaining devices. ``seq>1`` adds a sequence-parallel axis (innermost, so
    ring attention's ppermute rides neighboring ICI links); ``pipe>1`` adds a
    pipeline-stage axis (outermost: stage hops are the only traffic crossing
    it, so it belongs on the slowest links — DCN between slices)."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        if n % (model * seq * pipe):
            raise ValueError(
                f"{n} devices not divisible by model={model} x seq={seq} x pipe={pipe}"
            )
        data = n // (model * seq * pipe)
    if data * model * seq * pipe != n:
        devices = devices[: data * model * seq * pipe]
    shape = [pipe] if pipe > 1 else []
    names = ["pipe"] if pipe > 1 else []
    shape += [data, model]
    names += ["data", "model"]
    if seq > 1:
        shape.append(seq)
        names.append("seq")
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, tuple(names))
