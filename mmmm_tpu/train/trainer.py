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
    mesh_seq: int = 1  # sequence-parallel (ring attention) degree
    mesh_pipe: int = 1  # pipeline-parallel degree (stages over the layer stack)
    pipe_micro: int = 4  # microbatches per pipeline step (bubble = (S-1)/(M+S-1))
    mesh_data: int | None = None  # data-parallel degree; None = auto
    bf16_vlm: bool = True
    # store the frozen CogVLM base directly in bf16 (the compute dtype under
    # bf16_vlm): halves base-model HBM + removes the per-step cast copy
    frozen_vlm_bf16: bool = True
    remat: bool = True
    # "xla" A/B'd the causal train sites at the recipe shape (1.4b B8
    # S1024): 596.3 ms/step vs 658.4 with the flash kernel ("auto") —
    # XLA's fused attention beats the streaming kernel at fwd+bwd training
    # shapes, and the multichip lowering/dryrun paths already validate
    # attn_impl="xla". Serving keeps its own dispatch (dense/flash),
    # measured separately.
    attn_impl: str = "xla"
    # static single-expert routing over the image span: "auto" is exact for
    # batches built by input_builder.prepare_vlm_inputs (vision-typed tokens
    # are always [1, 1+n_img)) and halves the expert matmul FLOPs that the
    # dual dense path pays twice. The trainer's batches all come from that
    # builder, so "auto" is the default; set None for data that violates the
    # single-image layout.
    vis_span: tuple[int, int] | str | None = "auto"
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
        if (
            cfg.mesh_model > 1 or cfg.mesh_seq > 1 or cfg.mesh_pipe > 1
            or cfg.mesh_data is not None or n_dev > 1
        ):
            import math

            data = cfg.mesh_data
            if data is None:
                # largest data axis that divides both the batch and the devices
                avail = n_dev // (cfg.mesh_model * cfg.mesh_seq * cfg.mesh_pipe)
                data = math.gcd(cfg.batch_size, avail) or 1
            self.mesh = make_mesh(
                data=data, model=cfg.mesh_model, seq=cfg.mesh_seq, pipe=cfg.mesh_pipe
            )
        if cfg.mesh_pipe > 1:
            # pipeline-parallel training: stage the decoder stack over the
            # pipe axis (COMPONENTS §2.7 PP row)
            from ..parallel.pipeline import set_pipe_context

            set_pipe_context(self.mesh, "pipe", cfg.pipe_micro)
        if cfg.mesh_seq > 1:
            # sequence-parallel training: route every self-attention through
            # the ring kernel (COMPONENTS §2.7 SP row)
            from ..ops.attention import set_ring_context

            if cfg.attn_impl not in ("ring",):
                cfg.attn_impl = "ring"
            set_ring_context(self.mesh, "seq", "data")
        self.steps = {
            mode: make_train_step(
                model,
                self.optimizer,
                lora_cfg,
                vg_mode=mode,
                bf16_vlm=cfg.bf16_vlm,
                attn_impl=cfg.attn_impl,
                remat=cfg.remat,
                vis_span=cfg.vis_span,
                mesh=self.mesh,
            )
            for mode in ("none", "semantic", "instance")
        }
        # metrics stream: process 0 only (losses are identical across ranks by
        # SPMD construction; concurrent appends would interleave)
        self._log_file = (
            (self.out_dir / "metrics.jsonl").open("a") if jax.process_index() == 0 else None
        )

    def _log(self, step: int, logs: dict):
        if self._log_file is None:
            return
        rec = {"step": step, **{k: float(v) for k, v in logs.items()}}
        self._log_file.write(json.dumps(rec) + "\n")
        self._log_file.flush()
        print(json.dumps(rec), flush=True)

    def fit(self, resume: bool = True) -> TrainState:
        cfg = self.cfg
        state, frozen = init_train_state(
            jax.random.PRNGKey(cfg.seed), self.model, self.optimizer, self.lora_cfg,
            frozen_vlm_bf16=cfg.frozen_vlm_bf16 and cfg.bf16_vlm,
        )

        def _save_tree(s):
            # pass jax.Arrays straight to orbax: it copies device->host before
            # returning and coordinates multi-process global arrays (device_get
            # would fail on non-addressable TP shards under multi-controller)
            if jax.process_count() > 1:
                return {"trainable": s.trainable, "opt_state": s.opt_state}
            return {
                "trainable": jax.device_get(s.trainable),
                "opt_state": jax.device_get(s.opt_state),
            }
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
        # Host-invariant schedule: every process plans the SAME global stream
        # (metadata only, no pixel IO) so all ranks execute the same bucket
        # (shape, mode) sequence; each materializes its 1/world slice per
        # batch. Stream enough samples for the remaining steps (some batches
        # flush partial).
        remaining = cfg.max_steps - start_step
        from ..data.batching import scheduled_batches
        from ..parallel.distributed import process_rank

        rank, world = process_rank()
        batch_stream = scheduled_batches(
            self.dataset, batcher, remaining * cfg.batch_size * 2,
            seed=cfg.seed + start_step, rank=rank, world_size=world,
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

        # MMMM_DEBUG: host-boundary consistency checks (SURVEY §5.2) — batch
        # shard uniformity every step, replicated-state equality periodically
        import os

        debug = bool(os.environ.get("MMMM_DEBUG"))

        step_i = start_step
        t0 = time.time()
        profiling = False
        for batch in batch_stream:
            if step_i >= cfg.max_steps:
                break
            if preempted["flag"]:
                ckpt.force_save(step_i, _save_tree(state))
                ckpt.wait()
                print(f"preemption checkpoint saved at step {step_i}", flush=True)
                break
            if cfg.profile_start is not None and step_i == cfg.profile_start:
                jax.profiler.start_trace(str(self.out_dir / "profile"))
                profiling = True
            mode = batch.pop("vg_mode")
            batch.pop("src", None)
            if debug and self.mesh is not None:
                from ..parallel.debug import check_batch_uniform

                check_batch_uniform(
                    {k: v for k, v in batch.items() if k not in ("patch_size", "pool_size")},
                    self.mesh, world_size=world,
                )
            state, logs = self.steps[mode](state, frozen, batch)
            step_i += 1
            if debug and self.mesh is not None and step_i % cfg.log_every == 0:
                from ..parallel.debug import assert_replicated_equal

                assert_replicated_equal({"step": state.step}, self.mesh)
            if profiling and step_i >= cfg.profile_start + cfg.profile_steps:
                jax.tree.map(lambda x: x.block_until_ready(), logs)
                jax.profiler.stop_trace()
                profiling = False
            if step_i % cfg.log_every == 0 or step_i == cfg.max_steps:
                logs = jax.device_get(logs)
                dt = time.time() - t0
                self._log(step_i, {**logs, "steps_per_sec": cfg.log_every / max(dt, 1e-9)})
                t0 = time.time()
            ckpt.maybe_save(step_i, _save_tree(state))
        ckpt.wait()
        for sig, h in old_handlers.items():
            signal.signal(sig, h)
        # adapter export: gather TP-sharded trainable leaves to host (every
        # process gets the full tree; only process 0 writes)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            trainable_host = multihost_utils.process_allgather(state.trainable, tiled=True)
        else:
            trainable_host = jax.device_get(state.trainable)
        if jax.process_index() == 0:
            save_adapter(self.out_dir / "adapter.npz", trainable_host)
        return state
