"""Multi-process (multi-host) training equivalence.

2 processes x 4 virtual CPU devices each == 8-device single process: the same
sharded train step must produce identical losses when the global batch is
assembled from per-process shards via ``jax.make_array_from_process_local_data``
(ref parity: multi-node DDP, ``conf/phase-vg/fit.yaml:11-16``).
"""
import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

_WORKER = r"""
import json, os, sys
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

num_procs = int(sys.argv[1])
proc_id = int(sys.argv[2])
coord = sys.argv[3]
out_path = sys.argv[4]
if num_procs > 1:
    from mmmm_tpu.parallel.distributed import init_distributed

    assert init_distributed(coord, num_procs, proc_id)

from mmmm_tpu.parallel import make_mesh
from mmmm_tpu.parallel.distributed import global_batch, process_rank
from mmmm_tpu.parallel.sharding import fsdp_shardings, param_shardings

assert jax.device_count() == 8, jax.device_count()
mesh = make_mesh(data=2, model=4)

# tiny "model": frozen big weight (FSDP-sharded) + trainable vector
rank, world = process_rank()
rng = np.random.default_rng(0)  # same on every process
frozen = {"llm": {"layers": {"lang_mlp": {"up": rng.normal(size=(2, 256, 512)).astype(np.float32)}}}}
trainable = {"w": np.full((256,), 0.5, np.float32)}

GLOBAL_BATCH = 8
local = GLOBAL_BATCH // world
# per-process disjoint slice of the same deterministic global batch
full_x = np.arange(GLOBAL_BATCH * 256, dtype=np.float32).reshape(GLOBAL_BATCH, 256) / 1e4
x_local = full_x[rank * local:(rank + 1) * local]

frozen = jax.device_put(frozen, fsdp_shardings(frozen, mesh, min_size=1))
trainable = jax.device_put(trainable, param_shardings(trainable, mesh))
batch = global_batch({"x": x_local}, mesh)

@jax.jit
def loss_fn(trainable, frozen, batch):
    w = frozen["llm"]["layers"]["lang_mlp"]["up"]
    h = jnp.einsum("bi,lio->blo", batch["x"] * trainable["w"], w)
    return jnp.mean(h ** 2)

losses = []
for step in range(3):
    loss, grads = jax.value_and_grad(loss_fn)(trainable, frozen, batch)
    trainable = jax.tree.map(lambda p, g: p - 0.1 * g, trainable, grads)
    losses.append(float(loss))
if proc_id == 0:
    with open(out_path, "w") as f:
        json.dump(losses, f)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _env(n_local_devices):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    flags = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if not f.startswith("--xla_force_host_platform_device_count")
    )
    env["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={n_local_devices}"
    ).strip()
    env["PYTHONPATH"] = str(Path(__file__).parent.parent)
    return env


@pytest.mark.slow
def test_two_process_losses_match_single_process(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)

    # single-process reference: 8 local devices, world=1
    ref_out = tmp_path / "ref.json"
    r = subprocess.run(
        [sys.executable, str(script), "1", "0", "-", str(ref_out)],
        env=_env(8), capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    ref = json.loads(ref_out.read_text())

    # 2 processes x 4 devices
    coord = f"localhost:{_free_port()}"
    mp_out = tmp_path / "mp.json"
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), "2", str(i), coord, str(mp_out)],
            env=_env(4), stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    errs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        if p.returncode != 0:
            errs.append(err[-2000:])
    assert not errs, errs
    got = json.loads(mp_out.read_text())
    np.testing.assert_allclose(got, ref, rtol=1e-6)
