"""Generic training loop: one engine for all five reference trainers.

Epoch structure mirrors the reference (train → validate → checkpoint
best/last, SURVEY.md §3.1/§3.2): per-epoch sampler reshuffle replaces
DistributedSampler.set_epoch; validation aggregates host-side (the
all_reduce SUM of [loss, count] at train_gating_network.py:153-156 is
implicit — eval batches are global); process-0 checkpointing + metrics.
Device work stays inside two jitted functions (train_step / eval_step).
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import numpy as np

from automoe_tpu.ckpt.checkpoint import CheckpointManager
from automoe_tpu.parallel.mesh import shard_batch
from automoe_tpu.train.state import TrainState, make_optimizer
from automoe_tpu.train.step import (
    _DEFAULT_BATCH as _DEF_BATCH,
    make_eval_step,
    make_scan_train_step,
    make_train_step,
)
from automoe_tpu.train.workloads import Workload
from automoe_tpu.utils.metrics import MetricsLogger
from automoe_tpu.utils.profiling import StepTimer


def _allreduce_val_sums(sums: Dict[str, float], n: int):
    """Exact cross-process sum of per-metric sums and the batch count —
    the TPU-side equivalent of the reference's dist.all_reduce of
    [val_loss_sum, count] (train_gating_network.py:153-156). Every process
    then derives the SAME averages, so the is-best decision can't diverge
    across hosts. No-op in single-process runs."""
    if jax.process_count() == 1:
        return sums, n
    from jax.experimental import multihost_utils

    keys = sorted(sums)
    local = np.asarray([sums[k] for k in keys] + [float(n)], np.float64)
    gathered = multihost_utils.process_allgather(local)  # [P, K+1]
    total = np.asarray(gathered).sum(axis=0)
    return {k: float(v) for k, v in zip(keys, total[:-1])}, float(total[-1])


@dataclass
class TrainConfig:
    epochs: int = 1
    learning_rate: float = 2e-4
    weight_decay: float = 1e-4
    grad_clip: float = 1.0
    optimizer: str = "adamw"  # 'adamw' (every reference trainer) | 'sgd'
    # LR schedule cadence — mirrors the reference trainer families
    # (train/state.py::make_optimizer): 'cosine' per optimizer step
    # (BDD/nuScenes/CARLA experts), 'constant' (the policy trainer has
    # no scheduler), 'cosine_per_epoch' (the gating trainer steps a
    # T_max=epochs*len cosine once per epoch — near-constant)
    schedule: str = "cosine"
    seed: int = 0
    run_name: str = "run"
    ckpt_root: str = "checkpoints"
    runs_root: str = "runs"
    save_freq: int = 0
    # keep only the newest K periodic epoch_N checkpoints (0 = all)
    keep_epochs: int = 0
    # overlap checkpoint disk writes with training (the device→host
    # snapshot stays synchronous); fit() waits for the tail write
    async_ckpt: bool = False
    resume: Optional[str] = None  # 'model' | 'full'
    resume_from: str = "last"
    log_every: int = 50
    # steps allowed in flight before the host waits on the oldest one.
    # 0 = fetch the loss every step (a host round trip per step — ~30-45 ms
    # on tunneled runtimes); N>0 pipelines N steps so H2D + host loop
    # overlap device compute while HBM holds at most N live input batches.
    max_inflight: int = 2
    # K>1 = lax.scan K optimizer steps per dispatch (one H2D of a stacked
    # [K,B,...] batch group, one metrics fetch) — amortizes the per-step
    # host cost the reference pays every step. Inputs for K steps live in
    # HBM at once; leftover batches at epoch end run single-step.
    steps_per_call: int = 1
    # capture a jax.profiler trace (TensorBoard/Perfetto-viewable) of the
    # FIRST trained epoch into this directory; includes compile time.
    profile_dir: Optional[str] = None
    # N>0 writes a mid-epoch 'step' checkpoint every N optimizer steps;
    # resume with resume='full', resume_from='step' to continue from the
    # exact batch (the loader's per-epoch shuffle is deterministic).
    save_every_steps: int = 0
    # K>1 = accumulate gradients over K loader microbatches and apply
    # their average as ONE optimizer step (effective batch K×loader
    # batch, only one microbatch of activations live at a time — the
    # memory lever that composes with --remat). BN normalizes each
    # microbatch by its own stats (torch grad-accum semantics,
    # train/step.py::make_grad_accum_train_step). Exclusive with
    # steps_per_call > 1 and spatial; leftover tail batches run as
    # plain single steps.
    grad_accum: int = 1
    # spatial partitioning: shard the image HEIGHT axis over the mesh's
    # 'model' axis (parallel/sp.py) — for frames too large for one
    # chip's HBM at a useful batch. Needs a mesh with model > 1 and H
    # divisible by it; exclusive with steps_per_call > 1.
    spatial: bool = False
    # tensor parallelism: shard wide kernels (last dim >= tp_min_dim,
    # divisible by the 'model' axis) over 'model' (parallel/tp.py).
    # 0 = off. Exclusive with spatial (both consume the 'model' axis).
    tp_min_dim: int = 0
    # pipeline parallelism: M>0 declares the workload's model runs its
    # stacked-block trunk through parallel/pp.py with M microbatches
    # (the workload factory must have been built with pipeline_mesh /
    # pipeline_microbatches=M — e.g. policy_workload(trunk_depth=...)),
    # and places the [L]-stacked trunk params + optimizer moments per
    # stage (pp.pp_shard_state). Exclusive with spatial/tp_min_dim (all
    # consume 'model'); composes with DP and steps_per_call.
    pp_microbatches: int = 0
    # d>0 keeps an exponential moving average of params (ema = d*ema +
    # (1-d)*params per optimizer step, fused into the train step). The
    # EMA weights are validated each epoch ('val_ema' metrics), drive the
    # best-checkpoint decision, land in every checkpoint ('ema_params'),
    # and deploy via load_variables(prefer_ema=True) / automoe-serve
    # --ema. Typical: 0.999. The reference has no counterpart.
    ema_decay: float = 0.0
    extra: Dict[str, Any] = field(default_factory=dict)


class Trainer:
    def __init__(
        self,
        workload: Workload,
        train_loader,
        val_loader,
        config: TrainConfig,
        mesh=None,
    ):
        self.wl = workload
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.cfg = config
        self.mesh = mesh

        rng = jax.random.key(config.seed)
        variables = workload.init_variables(rng)
        # cosine-schedule length counts OPTIMIZER steps (what optax's
        # schedule sees): with --grad-accum K, K loader batches advance
        # the optimizer once — without the division the run would end
        # ~1/K of the way through the decay. The len%K tail batches each
        # run as a FULL optimizer step (_train_epoch_grouped's tail), so
        # they count too: undercounting would clamp the cosine at
        # alpha=0 → lr 0 for the back of every epoch.
        batches_per_epoch = max(1, len(train_loader))
        if config.grad_accum > 1:
            k = config.grad_accum
            batches_per_epoch = max(
                1, batches_per_epoch // k + batches_per_epoch % k
            )
        total_steps = config.epochs * batches_per_epoch
        mask = (
            workload.trainable_mask_fn(variables["params"])
            if workload.trainable_mask_fn
            else None
        )
        tx = make_optimizer(
            learning_rate=config.learning_rate,
            weight_decay=config.weight_decay,
            total_steps=total_steps,
            grad_clip=config.grad_clip,
            trainable_mask=mask,
            optimizer=config.optimizer,
            schedule=config.schedule,
            steps_per_epoch=batches_per_epoch,
        )
        self.state = TrainState.create(
            params=variables["params"],
            tx=tx,
            batch_stats=variables.get("batch_stats", {}),
            ema_decay=config.ema_decay,
        )
        if config.spatial:
            if mesh is None or dict(mesh.shape).get("model", 1) < 2:
                raise ValueError(
                    "spatial partitioning needs a mesh with a 'model' "
                    "axis > 1 (got "
                    f"{None if mesh is None else dict(mesh.shape)})"
                )
            if config.steps_per_call > 1:
                raise ValueError(
                    "spatial partitioning and steps_per_call > 1 are "
                    "exclusive (stacked [K,B,...] batches keep P('data'))"
                )
            if config.tp_min_dim > 0:
                raise ValueError(
                    "spatial and tensor parallelism are exclusive (both "
                    "consume the 'model' mesh axis)"
                )
        state_sh = None
        if config.tp_min_dim > 0:
            if mesh is None or dict(mesh.shape).get("model", 1) < 2:
                raise ValueError(
                    "tensor parallelism (tp_min_dim > 0) needs a mesh "
                    "with a 'model' axis > 1 (got "
                    f"{None if mesh is None else dict(mesh.shape)})"
                )
            from automoe_tpu.parallel.tp import shard_state

            self.state, state_sh = shard_state(
                self.state, mesh, min_dim=config.tp_min_dim
            )
        if config.pp_microbatches > 0:
            if mesh is None or dict(mesh.shape).get("model", 1) < 2:
                raise ValueError(
                    "pipeline parallelism (pp_microbatches > 0) needs a "
                    "mesh with a 'model' axis > 1 (got "
                    f"{None if mesh is None else dict(mesh.shape)})"
                )
            if config.tp_min_dim > 0 or config.spatial:
                raise ValueError(
                    "pp_microbatches is exclusive with tp_min_dim/spatial "
                    "(all consume the 'model' mesh axis)"
                )
            from automoe_tpu.parallel.pp import pp_shard_state

            self.state, state_sh = pp_shard_state(self.state, mesh)
        # batch_shardings=None → jit infers the batch layout from the
        # committed input sharding (the spatial P('data','model') images
        # _place() produces) instead of resharding to P('data').
        # with_spatial_gather re-gathers small-H activations to P('data')
        # inside the traced model — required for backward correctness on
        # this XLA (parallel/sp.py docstring) and for halo efficiency.
        batch_sh = None if config.spatial else _DEF_BATCH
        loss_fn = workload.loss_fn
        if config.spatial:
            from automoe_tpu.parallel.sp import with_spatial_gather

            loss_fn = with_spatial_gather(loss_fn, mesh)
        self.train_step = make_train_step(
            loss_fn, mesh=mesh, batch_shardings=batch_sh,
            state_sharding=state_sh,
        )
        self.scan_train_step = (
            make_scan_train_step(
                loss_fn, mesh=mesh, state_sharding=state_sh
            )
            if config.steps_per_call > 1
            else None
        )
        if config.steps_per_call > 1:
            # device-resident loaders in index_mode skip the per-group
            # gather: this step slices batches out of the flat epoch
            # inside the jitted program (train/step.py). Built eagerly
            # (jit traces lazily, so this costs nothing unless used).
            from automoe_tpu.train.step import make_indexed_scan_train_step

            self.indexed_scan_train_step = make_indexed_scan_train_step(
                loss_fn, k=config.steps_per_call, mesh=mesh,
                state_sharding=state_sh,
            )
        else:
            self.indexed_scan_train_step = None
        if config.grad_accum > 1:
            if config.steps_per_call > 1:
                raise ValueError(
                    "grad_accum > 1 and steps_per_call > 1 are exclusive "
                    "(both group loader batches into one dispatch)"
                )
            if config.spatial:
                raise ValueError(
                    "grad_accum > 1 and spatial are exclusive (stacked "
                    "[K,B,...] microbatch groups keep P('data'))"
                )
            from automoe_tpu.train.step import make_grad_accum_train_step

            self.accum_train_step = make_grad_accum_train_step(
                loss_fn, mesh=mesh, state_sharding=state_sh
            )
        else:
            self.accum_train_step = None
        self.eval_step = make_eval_step(
            loss_fn, mesh=mesh, batch_shardings=batch_sh,
            state_sharding=state_sh,
        )
        self.metrics_step = (
            jax.jit(
                lambda state, batch: workload.metrics_fn(
                    state.params, state.batch_stats, batch
                )
            )
            if workload.metrics_fn is not None
            else None
        )
        self.ckpt = CheckpointManager(
            config.ckpt_root, workload.name, config.run_name,
            save_freq=config.save_freq, async_save=config.async_ckpt,
            keep=config.keep_epochs,
        )
        self.logger = MetricsLogger(f"{config.runs_root}/{workload.name}_{config.run_name}")
        self._install_loader_transfer()
        self.rng = jax.random.key(config.seed + 1)
        self.timer = StepTimer()
        self.start_epoch = 0
        self.start_batch = 0  # batches of start_epoch already consumed
        self.resumed = False  # True only if a checkpoint actually loaded
        if config.resume:
            restored = self.ckpt.restore(
                self.state, which=config.resume_from, mode=config.resume
            )
            if config.resume_from == "step":
                self.state, epoch, batch_index = restored
                if config.resume == "full":
                    self.start_epoch = epoch
                    self.start_batch = batch_index
            else:
                self.state, epoch = restored
                self.start_epoch = epoch + 1 if config.resume == "full" else 0
            self.resumed = self.ckpt.last_restore_loaded
        # host-side optimizer-step counter: reading int(state.step) in the
        # loop would block on the just-dispatched step and defeat the
        # bounded-async pipeline (one sync here, none per step)
        self._host_step = int(self.state.step)

    def _install_loader_transfer(self):
        """Move the host→device transfer into the DataLoader's producer
        thread (device_put_fn) so H2D overlaps the previous device step.
        Only applies to our DataLoader; torch-style iterables keep the
        in-loop transfer via _device_batch."""
        if (
            self.mesh is None
            or self.cfg.steps_per_call > 1
            or self.cfg.grad_accum > 1
        ):
            # scan-steps / grad-accum modes stack K host batches into one
            # [K,B,...] transfer themselves — per-batch loader-thread H2D
            # would get in the way (device arrays can't be np.stack'd
            # host-side).
            return
        place = self._place

        def put(batch):
            batch = {k: v for k, v in batch.items() if not isinstance(v, list)}
            return place(batch)

        for dl in (self.train_loader, self.val_loader):
            if (
                dl is not None
                and hasattr(dl, "device_put_fn")
                and dl.device_put_fn is None
            ):
                dl.device_put_fn = put

    def _place(self, batch: Dict[str, np.ndarray]):
        """Mesh placement for one host batch: spatial (images height-
        sharded over 'model') when cfg.spatial, else P('data')."""
        if self.cfg.spatial:
            from automoe_tpu.parallel.sp import shard_batch_spatial

            return shard_batch_spatial(batch, self.mesh)
        return shard_batch(batch, self.mesh)

    def _device_batch(self, batch: Dict[str, np.ndarray]):
        batch = {
            k: v for k, v in batch.items()
            if not isinstance(v, list) and k != "_real_count"
        }
        if any(isinstance(v, jax.Array) for v in batch.values()):
            return batch  # already transferred by the loader thread
        if self.mesh is not None:
            return self._place(batch)
        return batch

    def _train_epoch_grouped(
        self, epoch: int, k: int, dispatch, steps_per_group: int
    ) -> float:
        """Shared epoch driver for the two batch-grouping modes: group K
        host batches, stack them [K,B,...], and hand them to `dispatch`
        in one jitted call — `steps_per_group` optimizer steps each
        (steps_per_call mode: a lax.scan of K steps, steps_per_group=K;
        grad_accum mode: ONE step from the averaged gradients,
        steps_per_group=1). The tail group (fewer than K batches) falls
        back to single-step dispatches."""
        from automoe_tpu.parallel.mesh import shard_stacked_batch

        # device-resident loaders (data/device_resident.py) yield
        # PRE-STACKED [K,B,...] mesh-sharded jax.Array groups — no host
        # stacking, no per-step H2D; each loop iteration consumes K
        # batches of bookkeeping. Detected by the loader's declared
        # group_size matching this mode's K.
        pre_grouped = (
            k > 1 and getattr(self.train_loader, "group_size", 1) == k
        )
        consumed0, skip_in_loop = self._set_epoch_with_skip(epoch)
        total, n = 0.0, 0
        t0 = time.time()
        group: list = []
        pending: list = []

        def flush_pending(limit: int):
            nonlocal total, n
            while len(pending) > limit:
                loss = np.asarray(pending.pop(0))
                total += float(loss.sum())
                n += int(loss.size)

        last_i = -1
        for i, batch in enumerate(self.train_loader):
            if i < skip_in_loop:
                continue
            last_i = i
            if pre_grouped:
                stacked = batch  # already [K,B,...], already mesh-placed
            else:
                if any(isinstance(v, jax.Array) for v in batch.values()):
                    raise ValueError(
                        "batch-grouping modes (steps_per_call/grad_accum "
                        "> 1) stack host batches themselves — don't "
                        "configure the DataLoader with a device_put_fn "
                        "here (the Trainer skips installing its own)."
                    )
                group.append(
                    {kk: v for kk, v in batch.items()
                     if not isinstance(v, list) and kk != "_real_count"}
                )
                if len(group) < k:
                    continue
                # stack over the INTERSECTION of keys: stack_batch drops
                # keys per-batch by intersection (optional fields like
                # CARLA 'context'), so batches within one group can differ
                # — a raw group[0] iteration would KeyError mid-epoch
                common = set(group[0])
                for b in group[1:]:
                    common &= set(b)
                stacked = {
                    kk: np.stack([b[kk] for b in group])
                    for kk in sorted(common)
                }
                group = []
                if self.mesh is not None:
                    stacked = shard_stacked_batch(stacked, self.mesh)
            self.timer.start()
            self.state, metrics = dispatch(self.state, stacked, self.rng)
            pending.append(metrics["loss"])
            flush_pending(max(0, self.cfg.max_inflight))
            self.timer.stop()
            # pre-grouped iterations consume k batches apiece
            consumed = consumed0 + ((i + 1) * k if pre_grouped else i + 1)
            self._maybe_save_step(epoch, consumed)
            self._host_step += steps_per_group
            self.logger.heartbeat()
            step = self._host_step
            if step % self.cfg.log_every < steps_per_group:
                self.logger.log(
                    step,
                    # scan mode returns stacked [K] metrics (log the
                    # latest step's); accum mode returns group scalars
                    {**{kk: float(np.asarray(v).reshape(-1)[-1])
                        for kk, v in metrics.items()},
                     **self.timer.stats()},
                    prefix="train",
                )
        # tail: leftover batches run through the single-step path with the
        # same per-batch bookkeeping as the scan path (heartbeat keeps the
        # supervisor's hang detection fresh; _maybe_save_step keeps
        # --save-every-steps working when an epoch is shorter than K)
        tail0 = last_i - len(group) + 1  # loop index of group[0]
        for j, b in enumerate(group):
            self.timer.start()
            self.state, metrics = self.train_step(
                self.state, self._device_batch(b), self.rng
            )
            pending.append(metrics["loss"])
            flush_pending(max(0, self.cfg.max_inflight))
            self.timer.stop()
            self._maybe_save_step(epoch, consumed0 + tail0 + j + 1)
            self._host_step += 1
            self.logger.heartbeat()
        flush_pending(0)
        avg = total / max(1, n)
        self._log_epoch_summary(avg, n, t0)
        return avg

    def _set_epoch_with_skip(self, epoch: int):
        """Reshuffle for `epoch` and, when resuming this epoch mid-way,
        skip the consumed batches — at the sampler INDEX level when the
        loader supports it (nothing is loaded for skipped batches), else
        by discarding in the loop. Returns (consumed0, skip_in_loop):
        consumed0 = batches already accounted before enumerate's i=0."""
        skip = self.start_batch if epoch == self.start_epoch else 0
        set_epoch = getattr(self.train_loader, "set_epoch", None)
        if set_epoch is None:  # plain torch-style iterable
            return 0, skip
        if skip:
            try:
                set_epoch(epoch, skip_batches=skip)
                return skip, 0
            except TypeError:  # loader without index-level skip support
                pass
        set_epoch(epoch)
        return 0, skip

    def _log_epoch_summary(self, avg: float, n: int, t0: float) -> None:
        self.logger.log(
            self._host_step,
            {"loss_epoch": avg, "epoch_seconds": time.time() - t0,
             "steps_per_sec": n / max(time.time() - t0, 1e-9)},
            prefix="train",
        )

    def _maybe_save_step(self, epoch: int, consumed: int) -> None:
        """Write the mid-epoch 'step' checkpoint when `consumed` batches
        cross a save_every_steps boundary (works for any steps_per_call)."""
        s = self.cfg.save_every_steps
        if not s:
            return
        marker = consumed // s
        if marker > self._step_save_marker:
            self._step_save_marker = marker
            self.ckpt.save_step(self.state, epoch, consumed)

    def train_epoch(self, epoch: int) -> float:
        s = self.cfg.save_every_steps
        self._step_save_marker = (
            self.start_batch // s if s and epoch == self.start_epoch else 0
        )
        if self.scan_train_step is not None:
            k = self.cfg.steps_per_call
            dispatch = self.scan_train_step
            if getattr(self.train_loader, "index_mode", False):
                def dispatch(state, stacked, rng):
                    # stacked is the loader's {"__group_index__": i32}
                    # marker; the flat epoch tree is re-read each call
                    # (set_epoch re-gathers it between epochs)
                    return self.indexed_scan_train_step(
                        state,
                        self.train_loader.epoch_batches,
                        stacked["__group_index__"],
                        rng,
                    )
            return self._train_epoch_grouped(
                epoch, k, dispatch, steps_per_group=k
            )
        if self.accum_train_step is not None:
            return self._train_epoch_grouped(
                epoch, self.cfg.grad_accum, self.accum_train_step,
                steps_per_group=1,
            )
        consumed0, skip_in_loop = self._set_epoch_with_skip(epoch)
        total, n = 0.0, 0
        t0 = time.time()
        # bounded pipeline: keep ≤ max_inflight dispatched steps pending,
        # waiting only on the OLDEST one — the host never pays a full
        # round trip per step and the device never sits idle between steps
        pending: list = []
        for i, batch in enumerate(self.train_loader):
            if i < skip_in_loop:
                continue
            self.timer.start()
            self.state, metrics = self.train_step(
                self.state, self._device_batch(batch), self.rng
            )
            pending.append(metrics["loss"])
            if len(pending) > max(0, self.cfg.max_inflight):
                total += float(pending.pop(0))  # sync on the oldest step
                n += 1
            self.timer.stop()
            self._maybe_save_step(epoch, consumed0 + i + 1)
            self._host_step += 1
            self.logger.heartbeat()
            step = self._host_step
            if step % self.cfg.log_every == 0:
                self.logger.log(
                    step,
                    {**{k: float(v) for k, v in metrics.items()},
                     **self.timer.stats()},
                    prefix="train",
                )
        for loss in pending:  # drain the tail
            total += float(loss)
            n += 1
        avg = total / max(1, n)
        self._log_epoch_summary(avg, n, t0)
        return avg

    def rebind_train_loader(self, loader) -> None:
        """Swap the training loader post-construction (the
        --device-resident stage-in path: the resident loader is built
        AFTER the feature-cache attach, which needs this Trainer's
        restored/grafted state). When the new loader's length differs
        (DeviceEpochLoader trims N to a batch*group multiple), the LR
        schedule baked from the ORIGINAL loader's length would decay over
        steps that never run — rebuild the optimizer with the actual
        batches-per-epoch. Same trainable mask ⇒ same opt_state
        structure, so the (possibly resumed) opt_state stays valid."""
        def _bpe(n_batches: int) -> int:
            bpe = max(1, n_batches)
            if self.cfg.grad_accum > 1:
                k = self.cfg.grad_accum
                bpe = max(1, bpe // k + bpe % k)
            return bpe

        old_bpe = _bpe(len(self.train_loader))
        self.train_loader = loader
        bpe = _bpe(len(loader))
        if bpe == old_bpe:
            return
        mask = (
            self.wl.trainable_mask_fn(self.state.params)
            if self.wl.trainable_mask_fn
            else None
        )
        tx = make_optimizer(
            learning_rate=self.cfg.learning_rate,
            weight_decay=self.cfg.weight_decay,
            total_steps=self.cfg.epochs * bpe,
            grad_clip=self.cfg.grad_clip,
            trainable_mask=mask,
            optimizer=self.cfg.optimizer,
            schedule=self.cfg.schedule,
            steps_per_epoch=bpe,
        )
        self.state = self.state.replace(tx=tx)

    def _exact_tail_ok(self, real: int) -> bool:
        """True when the padded val tail can be trimmed to its real rows:
        single process (the count is per-process) and, under a mesh, a
        count the batch-layout quantum still divides — the 'data' axis,
        times pp_microbatches under pipeline parallelism (pipeline_apply
        splits each data shard into M microbatches and rejects batches
        that don't divide by data*M)."""
        if real <= 0 or jax.process_count() > 1:
            return False
        if self.mesh is None:
            return True
        data = dict(self.mesh.shape).get("data", 1)
        quantum = data * max(1, self.cfg.pp_microbatches)
        return real % quantum == 0

    def validate(self, epoch: int, *, use_ema: bool = False,
                 prefix: str = "val") -> float:
        """Validation epoch: loss + every scalar loss metric + optional
        per-batch task metrics (avg-IoU/recall, pixel-acc/mIoU — reference
        train_bdd100k_ddp.py:196-375), averaged over batches and summed
        exactly across processes before the best-checkpoint decision
        (reference all-reduces [loss, count], :377-397).

        use_ema=True evaluates the EMA weights instead (same eval_step
        program — the state pytree keeps its structure, only params points
        at ema_params; logged under `prefix`)."""
        state = self.state
        if use_ema:
            state = state.replace(params=state.ema_params)
        sums: Dict[str, float] = {}
        n = 0.0
        for batch in self.val_loader:
            # the non-drop_last tail is repeat-padded to keep shapes
            # static. When possible, evaluate the TRUE remainder batch by
            # trimming the duplicate rows — exactly the reference's
            # semantics (train_bdd100k_ddp.py:336-375), at the cost of one
            # extra XLA program for the tail shape (compiled once, cached).
            # Otherwise (multi-process, or a mesh the tail doesn't divide)
            # fall back to weighting the batch mean by the real fraction —
            # correct in expectation but duplicates weigh inside the mean.
            real = batch.get("_real_count") if isinstance(batch, dict) else None
            db = self._device_batch(batch)
            if real is not None:
                real = int(real)
                # _real_count is the PER-PROCESS tail count; weight against
                # the per-process batch slice, not the global batch
                bsz = next(iter(db.values())).shape[0] // jax.process_count()
                w = float(real) / float(max(1, bsz))
                if self._exact_tail_ok(real):
                    db = {k: v[:real] for k, v in db.items()}
                    if self.mesh is not None:
                        # slicing drops the batch sharding (the result
                        # comes back replicated) — re-place it, or an
                        # eval_step with explicit in_shardings (EP's
                        # shard_map) rejects the arg
                        db = self._place(db)
            else:
                w = 1.0
            self.logger.heartbeat()
            metrics = self.eval_step(state, db, self.rng)
            if self.metrics_step is not None:
                metrics = {**metrics, **self.metrics_step(state, db)}
            for k, v in metrics.items():
                if getattr(v, "ndim", 1) == 0 or isinstance(v, (int, float)):
                    sums[k] = sums.get(k, 0.0) + float(v) * w
            n += w
        sums, n = _allreduce_val_sums(sums, n)
        denom = n if n > 0 else 1.0  # n can be a fractional weighted count
        avg = {k: v / denom for k, v in sums.items()}
        self.logger.log(self._host_step, avg, prefix=prefix)
        return avg.get("loss", float("inf"))

    #: optional callable(epoch:int) invoked after each epoch's
    #: train+validate+checkpoint completes, while the devices are idle —
    #: benchmarks use it to re-measure the device-step bound BETWEEN
    #: epochs in the same process (the interleaved-bound protocol,
    #: benchmarks/sustained_epoch_bench.py --interleave-bounds), and it
    #: is the natural seam for callbacks (early stop, external eval)
    epoch_hook = None

    def fit(self, config_dump: Optional[Dict] = None) -> Dict[str, float]:
        best = float("inf")
        for epoch in range(self.start_epoch, self.cfg.epochs):
            if self.cfg.profile_dir and epoch == self.start_epoch:
                from automoe_tpu.utils.profiling import trace

                with trace(self.cfg.profile_dir):
                    train_loss = self.train_epoch(epoch)
            else:
                train_loss = self.train_epoch(epoch)
            raw_val = self.validate(epoch)
            val_loss, ema_note = raw_val, ""
            if self.state.ema_params is not None:
                # the EMA weights are what a run with --ema-decay deploys,
                # so THEY drive the is-best decision (raw val still logged)
                val_loss = self.validate(epoch, use_ema=True, prefix="val_ema")
                ema_note = f" ema {val_loss:.4f}"
            is_best = self.ckpt.save_epoch(self.state, epoch, val_loss, config_dump)
            best = min(best, val_loss)
            if jax.process_index() == 0:
                print(
                    f"[{self.wl.name}] epoch {epoch + 1}/{self.cfg.epochs} "
                    f"train {train_loss:.4f} val {raw_val:.4f}" + ema_note
                    + (" *best*" if is_best else "")
                )
            if self.epoch_hook is not None:
                self.epoch_hook(epoch)
        self.ckpt.wait()  # async saves must land before callers read them
        self.logger.close()
        return {"best_val_loss": best}
