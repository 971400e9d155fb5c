"""The training loop: stream -> buckets -> per-mode jitted steps -> logs/ckpts.

Replaces the Lightning trainer + luolib wrappers (``scripts/cli.py`` +
``conf/phase-*/fit.yaml``): a plain loop around pure jitted step functions.
One step function exists per grounding mode; XLA specializes each to the
bucket shapes it sees (bounded by the data layer's grid/sequence
quantization). Logging writes JSONL metrics; checkpoints are orbax step
snapshots with optional resume; the adapter (trainable tree) exports at the
end, mirroring the reference where PEFT adapters are the unit of model state.
"""
from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path

import jax
import numpy as np

from ..data.batching import BucketBatcher
from ..data.dataset import MultiDataset
from ..models import MMMMModel
from ..parallel import make_mesh
from ..peft import LoraConfig
from .checkpoint import CheckpointManager, save_adapter
from .optim import OptimizerConfig, make_optimizer
from .step import TrainState, init_train_state, make_train_step


@dataclasses.dataclass(kw_only=True)
class TrainerConfig:
    max_steps: int = 1000
    log_every: int = 50
    ckpt_every: int = 2000
    out_dir: str = "runs/default"
    seed: int = 42
    batch_size: int = 8
    mesh_model: int = 1  # tensor-parallel degree
    mesh_data: int | None = None  # data-parallel degree; None = auto
    bf16_vlm: bool = True
    remat: bool = True
    attn_impl: str = "auto"
    keep_ckpts: int | None = None
    # jax.profiler trace window [start, end) in steps; traces land in
    # <out_dir>/profile for xprof/tensorboard (SURVEY aux #1: the reference has
    # no tracing at all; here it is first-class)
    profile_start: int | None = None
    profile_steps: int = 3


class Trainer:
    def __init__(
        self,
        model: MMMMModel,
        dataset: MultiDataset,
        opt_cfg: OptimizerConfig,
        lora_cfg: LoraConfig,
        cfg: TrainerConfig,
    ):
        self.model = model
        self.dataset = dataset
        self.opt_cfg = opt_cfg
        self.lora_cfg = lora_cfg
        self.cfg = cfg
        self.optimizer = make_optimizer(opt_cfg)
        self.out_dir = Path(cfg.out_dir)
        self.out_dir.mkdir(parents=True, exist_ok=True)
        # multi-process (multi-host) runtime: no-op single-process, otherwise
        # the mesh below spans global devices and the sampler shards per host
        from ..parallel.distributed import init_distributed

        init_distributed()
        self.mesh = None
        n_dev = len(jax.devices())
        if cfg.mesh_model > 1 or cfg.mesh_data is not None or n_dev > 1:
            import math

            data = cfg.mesh_data
            if data is None:
                # largest data axis that divides both the batch and the devices
                avail = n_dev // cfg.mesh_model
                data = math.gcd(cfg.batch_size, avail) or 1
            self.mesh = make_mesh(data=data, model=cfg.mesh_model)
        self.steps = {
            mode: make_train_step(
                model,
                self.optimizer,
                lora_cfg,
                vg_mode=mode,
                bf16_vlm=cfg.bf16_vlm,
                attn_impl=cfg.attn_impl,
                remat=cfg.remat,
                mesh=self.mesh,
            )
            for mode in ("none", "semantic", "instance")
        }
        self._log_file = (self.out_dir / "metrics.jsonl").open("a")

    def _log(self, step: int, logs: dict):
        rec = {"step": step, **{k: float(v) for k, v in logs.items()}}
        self._log_file.write(json.dumps(rec) + "\n")
        self._log_file.flush()
        print(json.dumps(rec), flush=True)

    def fit(self, resume: bool = True) -> TrainState:
        cfg = self.cfg
        state, frozen = init_train_state(
            jax.random.PRNGKey(cfg.seed), self.model, self.optimizer, self.lora_cfg
        )
        ckpt = CheckpointManager(self.out_dir / "ckpt", cfg.ckpt_every, cfg.keep_ckpts)
        start_step = 0
        if resume:
            step, restored = ckpt.restore({"trainable": state.trainable, "opt_state": state.opt_state})
            if step is not None:
                state = TrainState(
                    state.step * 0 + step, restored["trainable"], restored["opt_state"]
                )
                start_step = step
                print(f"resumed from step {step}", flush=True)

        batcher = BucketBatcher(
            cfg.batch_size,
            eop_token_id=self.dataset.transforms[next(iter(self.dataset.transforms))].tokenizer.eop_token_id,
            max_targets=self.dataset.conf.max_targets,
            max_instances=self.dataset.conf.max_instances,
            max_seq_len=self.dataset.conf.max_seq_len,
        )
        # stream enough samples for the remaining steps (some batches flush partial)
        remaining = cfg.max_steps - start_step
        from ..parallel.distributed import process_rank

        rank, world = process_rank()
        stream = self.dataset.stream(
            remaining * cfg.batch_size * 2, seed=cfg.seed + start_step,
            rank=rank, world_size=world,
        )

        # preemption safety (SURVEY §5.3; the reference has none): SIGTERM /
        # SIGINT request a checkpoint at the next step boundary instead of
        # killing mid-step, so spot/preemptible runs resume exactly
        import signal

        preempted = {"flag": False}

        def _on_signal(signum, frame):
            preempted["flag"] = True
            print(f"signal {signum}: checkpointing at next step boundary", flush=True)

        old_handlers = {}
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                old_handlers[sig] = signal.signal(sig, _on_signal)
            except ValueError:  # non-main thread (tests)
                pass

        step_i = start_step
        t0 = time.time()
        profiling = False
        for batch in batcher(stream):
            if step_i >= cfg.max_steps:
                break
            if preempted["flag"]:
                ckpt.force_save(
                    step_i,
                    {"trainable": jax.device_get(state.trainable),
                     "opt_state": jax.device_get(state.opt_state)},
                )
                ckpt.wait()
                print(f"preemption checkpoint saved at step {step_i}", flush=True)
                break
            if cfg.profile_start is not None and step_i == cfg.profile_start:
                jax.profiler.start_trace(str(self.out_dir / "profile"))
                profiling = True
            mode = batch.pop("vg_mode")
            batch.pop("src", None)
            state, logs = self.steps[mode](state, frozen, batch)
            step_i += 1
            if profiling and step_i >= cfg.profile_start + cfg.profile_steps:
                jax.tree.map(lambda x: x.block_until_ready(), logs)
                jax.profiler.stop_trace()
                profiling = False
            if step_i % cfg.log_every == 0 or step_i == cfg.max_steps:
                logs = jax.device_get(logs)
                dt = time.time() - t0
                self._log(step_i, {**logs, "steps_per_sec": cfg.log_every / max(dt, 1e-9)})
                t0 = time.time()
            ckpt.maybe_save(step_i, {"trainable": jax.device_get(state.trainable), "opt_state": jax.device_get(state.opt_state)})
        ckpt.wait()
        for sig, h in old_handlers.items():
            signal.signal(sig, h)
        save_adapter(self.out_dir / "adapter.npz", jax.device_get(state.trainable))
        return state
