"""N-step training-TRAJECTORY parity vs the ACTUAL reference trainer.

Single-step loss/forward parity (test_losses.py, test_torch_parity.py)
does not pin how schedule shape, gradient clipping, BN-update cadence,
and matcher interaction COMPOSE across optimizer steps. Here the real
reference `BDDTrainer.train_epoch` (/root/reference/training/
train_bdd100k_ddp.py:75-185, imported and executed on CPU via the
torchvision stub) and our generic `Trainer` run for ~12 optimizer steps
on identical synthetic fixtures from identical transferred weights, and
the per-step loss trajectories plus the final parameters must match.

SGD is the primary equivalence optimizer (AdamW's sqrt(v) normalization
amplifies fp reduction noise on near-zero-gradient leaves into O(lr)
divergence — r2 ledger, docs/DESIGN.md §3); AdamW cases run with
correspondingly looser bounds.

Coverage spans the reference's trainer families: BDD detection (T2,
SGD), drivable (T2, SGD + AdamW), nuScenes (T3, SGD — dropout disabled,
RNG streams incomparable), policy (T6, AdamW + constant lr), gating
(T7, AdamW + per-epoch cosine, frozen experts, full AutoMoE). The CARLA
fine-tune (T4) shares T2's trainer skeleton; nuScenes-2D (T5) shares
T3's loss composition with matched-only reductions (test_losses.py).

Known legitimate divergences (ledgered in docs/DESIGN.md §3):
  * seg/drivable upsample borders differ between our resize matmul and
    torch F.interpolate → the drivable case carries a looser tolerance;
  * Hungarian ties: measure-zero for random float costs, so the exact
    on-device matcher and scipy agree on these fixtures.
"""
from __future__ import annotations

import importlib
import json
import sys

import numpy as np
import pytest
import torch

from tests.torch_mirror import add_reference_to_path, install_torchvision_stub

install_torchvision_stub()
add_reference_to_path()
# the reference trainer does `from hungarian_matcher import ...` (a
# sibling-file import that torchrun's script-style launch resolves)
if "/root/reference/training" not in sys.path:
    sys.path.insert(0, "/root/reference/training")

import automoe_tpu.ckpt.torch_import as ck  # noqa: E402
from automoe_tpu.ckpt.torch_import import to_numpy_state_dict  # noqa: E402
from automoe_tpu.train.loop import TrainConfig, Trainer  # noqa: E402
from automoe_tpu.train.workloads import bdd_expert_workload  # noqa: E402

B, HW, NBOX = 4, 64, 3
N_BATCHES, N_EPOCHS = 3, 4  # 12 optimizer steps
LR = 1e-3


class _Recorder:
    """SummaryWriter stand-in: records scalars instead of event files."""

    def __init__(self, *a, **k):
        self.scalars = {}

    def add_scalar(self, tag, value, step):
        self.scalars.setdefault(tag, []).append(float(value))

    def close(self):
        pass


def _detection_fixtures(seed=0):
    """Identical batch sequence in torch (NCHW) and jax (NHWC) layouts.
    Includes padded target slots (label -1) to exercise the mask path."""
    rng = np.random.default_rng(seed)
    tb, jb = [], []
    for _ in range(N_BATCHES):
        img = rng.normal(size=(B, 3, HW, HW)).astype(np.float32)
        xy1 = rng.uniform(0.05, 0.45, (B, NBOX, 2))
        xy2 = rng.uniform(0.55, 0.95, (B, NBOX, 2))
        boxes = np.concatenate([xy1, xy2], -1).astype(np.float32)
        labels = rng.integers(0, 10, (B, NBOX)).astype(np.int64)
        labels[0, -1] = -1  # one padded slot per batch
        boxes[0, -1] = 0.0
        tb.append({
            "image": torch.from_numpy(img),
            "bboxes": torch.from_numpy(boxes),
            "labels": torch.from_numpy(labels),
        })
        jb.append({
            "image": np.transpose(img, (0, 2, 3, 1)).copy(),
            "bboxes": boxes.copy(),
            "labels": labels.astype(np.int32),
        })
    return tb, jb


def _seg_fixtures(seed=0, num_classes=3):
    rng = np.random.default_rng(seed)
    tb, jb = [], []
    for _ in range(N_BATCHES):
        img = rng.normal(size=(B, 3, HW, HW)).astype(np.float32)
        mask = rng.integers(0, num_classes, (B, HW, HW)).astype(np.int64)
        mask[:, :2, :2] = 255  # ignore-index pixels
        tb.append({
            "image": torch.from_numpy(img),
            "mask": torch.from_numpy(mask),
        })
        jb.append({
            "image": np.transpose(img, (0, 2, 3, 1)).copy(),
            "mask": mask.astype(np.int32),
        })
    return tb, jb


def _ref_trainer(task, tmodel, batches, monkeypatch, *, optimizer,
                 weight_decay=0.0):
    ref_mod = importlib.import_module("training.train_bdd100k_ddp")
    monkeypatch.setattr(ref_mod, "SummaryWriter", _Recorder)
    config = {
        "learning_rate": LR,
        "weight_decay": weight_decay,
        "epochs": N_EPOCHS,
        "run_name": "parity",
    }
    trainer = ref_mod.BDDTrainer(
        task, tmodel, batches, batches, torch.device("cpu"), config
    )
    if optimizer == "sgd":
        trainer.optimizer = torch.optim.SGD(tmodel.parameters(), lr=LR)
        trainer.scheduler = torch.optim.lr_scheduler.CosineAnnealingLR(
            trainer.optimizer, T_max=N_EPOCHS * len(batches)
        )
    return trainer


def _run_ours(wl, batches, tmp_path, variables, *, optimizer,
              weight_decay=0.0, run_name="tp", schedule="cosine"):
    from automoe_tpu.train.state import TrainState

    cfg = TrainConfig(
        epochs=N_EPOCHS, learning_rate=LR, weight_decay=weight_decay,
        optimizer=optimizer, run_name=run_name, schedule=schedule,
        ckpt_root=str(tmp_path / "ckpt"), runs_root=str(tmp_path / "runs"),
        log_every=1, max_inflight=0,
    )
    tr = Trainer(wl, batches, batches, cfg)
    tr.state = TrainState.create(
        params=variables["params"], tx=tr.state.tx,
        batch_stats=variables.get("batch_stats", {}),
    )
    for e in range(N_EPOCHS):
        tr.train_epoch(e)
    tr.logger.close()
    jsonl = tmp_path / "runs" / f"{wl.name}_{run_name}" / "metrics.jsonl"
    losses = [
        rec["train/loss"]
        for rec in map(json.loads, jsonl.read_text().splitlines())
        if "train/loss" in rec
    ]
    return tr, losses


def _assert_params_close(ours, torch_final_vars, rtol, atol,
                         max_mismatch_frac=0.0):
    """max_mismatch_frac > 0 tolerates a vanishing fraction of forked
    elements under AdamW: where v ~ 0, sqrt(v)-normalized updates turn fp
    reduction noise into O(lr) per-element divergence (r2 ledger,
    docs/DESIGN.md §3) — individual weights fork while the trajectory and
    every other element track."""
    import jax

    flat_a = jax.tree_util.tree_leaves_with_path(ours)
    flat_b = jax.tree_util.tree_leaves_with_path(torch_final_vars)
    assert len(flat_a) == len(flat_b)
    for (pa, a), (pb, b) in zip(flat_a, flat_b):
        assert pa == pb
        a, b = np.asarray(a), np.asarray(b)
        # NaN/inf must count as mismatches: np.abs(nan-b) > tol is False,
        # so a naive > comparison would pass a NaN-diverged trajectory.
        bad = ~np.isclose(a, b, rtol=rtol, atol=atol, equal_nan=False)
        frac = float(bad.sum()) / max(1, bad.size)
        if frac > max_mismatch_frac:
            np.testing.assert_allclose(
                a, b, rtol=rtol, atol=atol,
                err_msg=f"{jax.tree_util.keystr(pa)} "
                        f"(mismatch fraction {frac:.2e})",
            )


def test_detection_sgd_trajectory_parity(tmp_path, monkeypatch):
    """12 SGD steps of the reference detection trainer (cosine schedule,
    global-norm clip 1.0, Hungarian matching, masked CE+SmoothL1, BN in
    train mode) vs our Trainer — loss trajectory and final params."""
    torch.manual_seed(11)
    tbatches, jbatches = _detection_fixtures(seed=7)
    ref_mod = importlib.import_module("training.train_bdd100k_ddp")
    tmodel = ref_mod.BDDDetectionExpert(
        num_classes=10, pretrained_backbone=False
    )
    variables = ck.import_detection_expert(to_numpy_state_dict(tmodel))

    trainer = _ref_trainer(
        "detection", tmodel, tbatches, monkeypatch, optimizer="sgd"
    )
    for e in range(N_EPOCHS):
        trainer.train_epoch(e)
    ref_losses = trainer.writer.scalars["train/loss_batch"]

    wl = bdd_expert_workload("detection", image_size=HW, box_cap=NBOX,
                             matcher="hungarian")
    tr, our_losses = _run_ours(
        wl, jbatches, tmp_path, variables, optimizer="sgd", run_name="det"
    )
    assert len(our_losses) == len(ref_losses) == N_EPOCHS * N_BATCHES
    np.testing.assert_allclose(our_losses, ref_losses, rtol=1e-3, atol=1e-4)

    final_vars = ck.import_detection_expert(to_numpy_state_dict(tmodel))
    _assert_params_close(
        {"params": tr.state.params, "batch_stats": tr.state.batch_stats},
        final_vars, rtol=1e-3, atol=2e-4,
    )


def test_drivable_sgd_trajectory_parity(tmp_path, monkeypatch):
    """12 SGD steps of the seg-family trainer (CE ignore-255). Bilinear
    upsample borders differ between our resize and torch F.interpolate
    (ledgered), so bounds are looser than detection's."""
    torch.manual_seed(12)
    tbatches, jbatches = _seg_fixtures(seed=8)
    ref_mod = importlib.import_module("training.train_bdd100k_ddp")
    tmodel = ref_mod.BDDDrivableExpert(
        num_classes=3, pretrained_backbone=False
    )
    variables = ck.import_drivable_expert(to_numpy_state_dict(tmodel))

    trainer = _ref_trainer(
        "drivable", tmodel, tbatches, monkeypatch, optimizer="sgd"
    )
    for e in range(N_EPOCHS):
        trainer.train_epoch(e)
    ref_losses = trainer.writer.scalars["train/loss_batch"]

    wl = bdd_expert_workload("drivable", image_size=HW)
    tr, our_losses = _run_ours(
        wl, jbatches, tmp_path, variables, optimizer="sgd", run_name="drv"
    )
    assert len(our_losses) == len(ref_losses)
    np.testing.assert_allclose(our_losses, ref_losses, rtol=5e-3, atol=5e-3)

    final_vars = ck.import_drivable_expert(to_numpy_state_dict(tmodel))
    _assert_params_close(
        {"params": tr.state.params, "batch_stats": tr.state.batch_stats},
        final_vars, rtol=2e-2, atol=2e-3,
    )


def test_drivable_adamw_trajectory_parity(tmp_path, monkeypatch):
    """One AdamW case (the reference's actual optimizer regime,
    train_bdd100k_ddp.py:39-47): loss trajectories over 12 steps, on the
    seg-family workload. Bounds are looser than SGD's — Adam's sqrt(v)
    normalization amplifies fp reduction noise (r2 ledger). The detection
    workload is NOT used here: under Adam the amplified noise flips
    near-tie Hungarian assignments after a few steps (measured: fork at
    step 5 of 12), discretely changing the targets — both sides are
    'correct', the trajectories just stop being comparable (ledgered in
    docs/DESIGN.md §3)."""
    torch.manual_seed(13)
    tbatches, jbatches = _seg_fixtures(seed=9)
    ref_mod = importlib.import_module("training.train_bdd100k_ddp")
    tmodel = ref_mod.BDDDrivableExpert(
        num_classes=3, pretrained_backbone=False
    )
    variables = ck.import_drivable_expert(to_numpy_state_dict(tmodel))

    trainer = _ref_trainer(
        "drivable", tmodel, tbatches, monkeypatch,
        optimizer="adamw", weight_decay=1e-4,
    )
    for e in range(N_EPOCHS):
        trainer.train_epoch(e)
    ref_losses = trainer.writer.scalars["train/loss_batch"]

    wl = bdd_expert_workload("drivable", image_size=HW)
    tr, our_losses = _run_ours(
        wl, jbatches, tmp_path, variables,
        optimizer="adamw", weight_decay=1e-4, run_name="adamw",
    )
    assert len(our_losses) == len(ref_losses)
    np.testing.assert_allclose(our_losses, ref_losses, rtol=2e-2, atol=2e-2)


def test_policy_adamw_trajectory_parity(tmp_path, monkeypatch):
    """The ACTUAL policy trainer (training/train_carla_policy.py) vs our
    Trainer in its reference-faithful regime: AdamW(wd=1e-4), clip 1.0,
    and NO scheduler — the reference never creates one (:176), so the
    CLI defaults `policy` to schedule='constant' (train/cli.py
    _DEFAULT_SCHEDULE; a per-step cosine would silently change the LR
    curve). Per-epoch mean losses and final params must track through
    4 epochs x 3 batches."""
    torch.manual_seed(14)
    from automoe_tpu.train.workloads import policy_workload

    H = 8
    rng = np.random.default_rng(21)
    tb, jb = [], []
    for _ in range(N_BATCHES):
        img = rng.normal(size=(B, 3, HW, HW)).astype(np.float32)
        wp = rng.normal(size=(B, H, 2)).astype(np.float32)
        spd = rng.uniform(0, 8, (B, H)).astype(np.float32)
        tb.append({
            "image": torch.from_numpy(img),
            "waypoints": torch.from_numpy(wp),
            "speed": torch.from_numpy(spd),
        })
        jb.append({
            "image": np.transpose(img, (0, 2, 3, 1)).copy(),
            "waypoints": wp.copy(),
            "speed": spd.copy(),
        })

    ref_mod = importlib.import_module("train_carla_policy")
    tmodel = ref_mod.TrajectoryPolicy(horizon=H)
    variables = ck.import_policy(to_numpy_state_dict(tmodel))
    opt = torch.optim.AdamW(tmodel.parameters(), lr=LR, weight_decay=1e-4)
    ref_epoch_losses = [
        ref_mod.train_one_epoch(
            tmodel, tb, opt, torch.device("cpu"), e, N_EPOCHS, rank=1
        )
        for e in range(N_EPOCHS)
    ]

    wl = policy_workload(horizon=H, image_size=HW)
    tr, our_losses = _run_ours(
        wl, jb, tmp_path, variables, optimizer="adamw", weight_decay=1e-4,
        run_name="policy", schedule="constant",
    )
    our_epoch_losses = [
        float(np.mean(our_losses[e * N_BATCHES:(e + 1) * N_BATCHES]))
        for e in range(N_EPOCHS)
    ]
    np.testing.assert_allclose(
        our_epoch_losses, ref_epoch_losses, rtol=2e-2, atol=2e-2
    )
    final_vars = ck.import_policy(to_numpy_state_dict(tmodel))
    # AdamW forks isolated near-zero-v elements (measured: 1 of 262k in
    # head_wp/fc1 after 12 steps) — bound the fraction, not each element
    _assert_params_close(
        {"params": tr.state.params, "batch_stats": tr.state.batch_stats},
        final_vars, rtol=3e-2, atol=3e-3, max_mismatch_frac=1e-4,
    )


def test_nuscenes_sgd_trajectory_parity(tmp_path, monkeypatch):
    """The actual nuScenes trainer (training/train_nuscenes_expert_ddp.py
    — Hungarian matching over queries, CE(ignore -1) over ALL queries +
    SmoothL1 over ALL queries with zero pad targets, per-step cosine,
    clip 1.0) vs our Trainer on nuscenes_workload. SGD for the
    equivalence run (r2 Adam lesson)."""
    torch.manual_seed(16)
    from automoe_tpu.ckpt.torch_import import import_nuscenes_expert
    from automoe_tpu.train.workloads import nuscenes_workload

    ref_mod = importlib.import_module("train_nuscenes_expert_ddp")
    from models.experts.nuscenes_expert import NuScenesExpert as RefNu

    Q, M = 8, 3
    tmodel = RefNu(num_queries=Q, use_lidar=False, fusion="sum", bbox_dim=7)
    # the decoder has Dropout(0.3) live in train mode — torch/jax RNG
    # streams are incomparable, so disable it on both sides (same
    # treatment as the gating test; every other train-mode behavior stays)
    for m in tmodel.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
    import inspect as _inspect

    from automoe_tpu.train import workloads as W

    monkeypatch.setattr(
        W, "_det_kw",
        lambda mdl: {"deterministic": True}
        if "deterministic" in _inspect.signature(mdl.__call__).parameters
        else {},
    )
    variables = import_nuscenes_expert(to_numpy_state_dict(tmodel))

    rng = np.random.default_rng(41)
    tb, jb = [], []
    for _ in range(N_BATCHES):
        img = rng.normal(size=(B, 3, HW, HW)).astype(np.float32)
        lidar = rng.normal(size=(B, 64, 3)).astype(np.float32)
        boxes = rng.normal(size=(B, M, 7)).astype(np.float32)
        boxes[..., 3:6] = np.abs(boxes[..., 3:6]) + 0.5  # sane w/l/h
        labels = rng.integers(0, 10, (B, M)).astype(np.int64)
        labels[0, -1] = -1  # one padded slot
        tb.append({
            "image": torch.from_numpy(img),
            "lidar": torch.from_numpy(lidar),
            "intrinsics": torch.eye(3).repeat(B, 1, 1),
            "boxes": torch.from_numpy(boxes),
            "labels": torch.from_numpy(labels),
        })
        jb.append({
            "image": np.transpose(img, (0, 2, 3, 1)).copy(),
            "lidar": lidar.copy(),
            "boxes": boxes.copy(),
            "labels": labels.astype(np.int32),
        })

    config = {
        "learning_rate": LR, "weight_decay": 0.0, "epochs": N_EPOCHS,
        "run_name": "parity", "bbox_loss_weight": 5.0,
    }
    trainer = ref_mod.NuScenesTrainer(
        tmodel, tb, tb, torch.device("cpu"), config
    )
    trainer.optimizer = torch.optim.SGD(tmodel.parameters(), lr=LR)
    trainer.scheduler = torch.optim.lr_scheduler.CosineAnnealingLR(
        trainer.optimizer, T_max=N_EPOCHS * N_BATCHES
    )
    ref_epoch_losses = [
        trainer.train_epoch(e) for e in range(N_EPOCHS)
    ]

    wl = nuscenes_workload(
        num_queries=Q, use_lidar=False, fusion="sum", image_size=HW,
        lidar_cap=64, box_cap=M, matcher="hungarian",
    )
    tr, our_losses = _run_ours(
        wl, jb, tmp_path, variables, optimizer="sgd", run_name="nusc"
    )
    our_epoch_losses = [
        float(np.mean(our_losses[e * N_BATCHES:(e + 1) * N_BATCHES]))
        for e in range(N_EPOCHS)
    ]
    np.testing.assert_allclose(
        our_epoch_losses, ref_epoch_losses, rtol=1e-3, atol=1e-4
    )
    final_vars = import_nuscenes_expert(to_numpy_state_dict(tmodel))
    _assert_params_close(
        {"params": tr.state.params, "batch_stats": tr.state.batch_stats},
        final_vars, rtol=1e-3, atol=2e-4,
    )


def test_carla_finetune_sgd_trajectory_parity(tmp_path, monkeypatch):
    """The actual CARLA fine-tune trainer
    (training/train_carla_bdd_experts_ddp.py — matched-only detection
    loss with bbox weight DEFAULT 1.0, vs the BDD trainer's 2.0;
    out-of-range seg labels sanitized to ignore-255) vs our Trainer on
    bdd_expert_workload with the finetune-carla CLI's defaults. Both the
    detection task and the seg task with deliberately out-of-range
    labels (raw CARLA IDs) run."""
    torch.manual_seed(18)
    ref_mod = importlib.import_module("train_carla_bdd_experts_ddp")

    # --- detection: bbox weight 1.0 (the T4 default) ---
    tbatches, jbatches = _detection_fixtures(seed=23)
    tmodel = ref_mod.BDDDetectionExpert(
        num_classes=10, pretrained_backbone=False
    )
    variables = ck.import_detection_expert(to_numpy_state_dict(tmodel))
    config = {"learning_rate": LR, "weight_decay": 0.0, "epochs": N_EPOCHS}
    trainer = ref_mod.Trainer(
        "detection", tmodel, tbatches, tbatches, torch.device("cpu"),
        config, rank=1,
    )
    trainer.optimizer = torch.optim.SGD(tmodel.parameters(), lr=LR)
    trainer.scheduler = torch.optim.lr_scheduler.CosineAnnealingLR(
        trainer.optimizer, T_max=N_EPOCHS * N_BATCHES
    )
    ref_epoch_losses = [trainer.train_epoch(e) for e in range(N_EPOCHS)]

    wl = bdd_expert_workload(
        "detection", image_size=HW, box_cap=NBOX, matcher="hungarian",
        bbox_loss_weight=1.0,  # finetune-carla CLI default (T4's)
    )
    tr, our_losses = _run_ours(
        wl, jbatches, tmp_path, variables, optimizer="sgd", run_name="t4d"
    )
    our_epoch_losses = [
        float(np.mean(our_losses[e * N_BATCHES:(e + 1) * N_BATCHES]))
        for e in range(N_EPOCHS)
    ]
    np.testing.assert_allclose(
        our_epoch_losses, ref_epoch_losses, rtol=1e-3, atol=1e-4
    )

    # --- segmentation with raw out-of-range CARLA IDs ---
    torch.manual_seed(19)
    rng = np.random.default_rng(29)
    tb, jb = [], []
    for _ in range(N_BATCHES):
        img = rng.normal(size=(B, 3, HW, HW)).astype(np.float32)
        mask = rng.integers(0, 3, (B, HW, HW)).astype(np.int64)
        mask[:, :3, :3] = 23  # raw CARLA semantic ID >= num_classes
        tb.append({"image": torch.from_numpy(img),
                   "mask": torch.from_numpy(mask)})
        # our side: the LOADER sanitizes (CarlaSegmentationDataset);
        # emulate its output here
        jm = np.where(mask >= 3, 255, mask).astype(np.int32)
        jb.append({"image": np.transpose(img, (0, 2, 3, 1)).copy(),
                   "mask": jm})
    tmodel2 = ref_mod.BDDDrivableExpert(
        num_classes=3, pretrained_backbone=False
    )
    variables2 = ck.import_drivable_expert(to_numpy_state_dict(tmodel2))
    trainer2 = ref_mod.Trainer(
        "drivable", tmodel2, tb, tb, torch.device("cpu"), config, rank=1
    )
    trainer2.optimizer = torch.optim.SGD(tmodel2.parameters(), lr=LR)
    trainer2.scheduler = torch.optim.lr_scheduler.CosineAnnealingLR(
        trainer2.optimizer, T_max=N_EPOCHS * N_BATCHES
    )
    ref2 = [trainer2.train_epoch(e) for e in range(N_EPOCHS)]

    wl2 = bdd_expert_workload("drivable", image_size=HW)
    tr2, ours2 = _run_ours(
        wl2, jb, tmp_path, variables2, optimizer="sgd", run_name="t4s"
    )
    ours2_ep = [
        float(np.mean(ours2[e * N_BATCHES:(e + 1) * N_BATCHES]))
        for e in range(N_EPOCHS)
    ]
    # looser: the upsample-border divergence (ledgered) applies here
    np.testing.assert_allclose(ours2_ep, ref2, rtol=2e-2, atol=2e-2)


def test_nuscenes_2d_sgd_trajectory_parity(tmp_path, monkeypatch):
    """The actual nuScenes→CARLA 2D fine-tune trainer
    (training/train_carla_nuscenes_expert_2d_ddp.py — ImageOnlyWrapper,
    Hungarian matching, MATCHED-ONLY CE + SmoothL1, per-step cosine,
    clip 1.0) vs our Trainer on carla_nuscenes_2d_workload. With this,
    every reference trainer file has a trajectory-parity test."""
    torch.manual_seed(17)
    import inspect as _inspect

    from automoe_tpu.ckpt import import_nuscenes_2d_head
    from automoe_tpu.train import workloads as W
    from automoe_tpu.train.workloads import carla_nuscenes_2d_workload

    ref_mod = importlib.import_module("train_carla_nuscenes_expert_2d_ddp")
    from models.experts.nuscenes_expert import NuScenesExpert as RefNu

    Q = 12
    base = RefNu(num_queries=4, use_lidar=False)
    tmodel = ref_mod.ImageOnlyWrapper(base, num_queries=Q, num_classes=10)
    for m in tmodel.modules():  # mlp Dropout(0.1): RNGs incomparable
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
    monkeypatch.setattr(
        W, "_det_kw",
        lambda mdl: {"deterministic": True}
        if "deterministic" in _inspect.signature(mdl.__call__).parameters
        else {},
    )
    variables = import_nuscenes_2d_head(to_numpy_state_dict(tmodel))

    tbatches, jbatches = _detection_fixtures(seed=19)

    config = {
        "learning_rate": LR, "weight_decay": 0.0, "epochs": N_EPOCHS,
        "num_classes": 10, "bbox_loss_weight": 1.0,
    }
    trainer = ref_mod.Trainer(
        tmodel, tbatches, tbatches, torch.device("cpu"), config, rank=1
    )
    trainer.optimizer = torch.optim.SGD(tmodel.parameters(), lr=LR)
    trainer.scheduler = torch.optim.lr_scheduler.CosineAnnealingLR(
        trainer.optimizer, T_max=N_EPOCHS * N_BATCHES
    )
    ref_epoch_losses = [trainer.train_epoch(e) for e in range(N_EPOCHS)]

    wl = carla_nuscenes_2d_workload(
        num_queries=Q, image_size=HW, box_cap=NBOX, bbox_loss_weight=1.0,
    )
    tr, our_losses = _run_ours(
        wl, jbatches, tmp_path, variables, optimizer="sgd", run_name="n2d"
    )
    our_epoch_losses = [
        float(np.mean(our_losses[e * N_BATCHES:(e + 1) * N_BATCHES]))
        for e in range(N_EPOCHS)
    ]
    np.testing.assert_allclose(
        our_epoch_losses, ref_epoch_losses, rtol=1e-3, atol=1e-4
    )
    final_vars = import_nuscenes_2d_head(to_numpy_state_dict(tmodel))
    _assert_params_close(
        {"params": tr.state.params, "batch_stats": tr.state.batch_stats},
        final_vars, rtol=1e-3, atol=2e-4,
    )


@pytest.mark.slow
def test_gating_adamw_trajectory_parity(tmp_path, monkeypatch):
    """The FLAGSHIP pipeline: the actual reference gating trainer
    (training/train_gating_network.py — full AutoMoE forward, frozen
    experts, ADE/FDE/speed/smooth + load-balancing + entropy losses,
    AdamW + a cosine stepped once per EPOCH) vs our Trainer with
    gating_workload + schedule='cosine_per_epoch'. Dropout is disabled
    on both sides (torch/jax RNG streams are incomparable; every other
    regularizer stays live). Pins: per-epoch loss trajectory, frozen
    experts bit-unchanged, trainable params tracking."""
    import train_gating_network as ref_gate
    from models.automoe import create_automoe_model as ref_create

    from automoe_tpu.ckpt import import_automoe
    from automoe_tpu.configs import load_model_config
    from automoe_tpu.train import workloads as W
    from automoe_tpu.train.workloads import gating_workload

    CONFIG = {
        "experts": [
            {"type": "detection", "num_classes": 10, "output_dim": 256,
             "pretrained_backbone": False},
            {"type": "drivable", "num_classes": 3, "output_dim": 256,
             "pretrained_backbone": False},
            {"type": "nuscenes", "num_queries": 8, "num_classes": 10,
             "output_dim": 256, "fusion": "sum", "use_lidar": False,
             "use_tnet": False, "bbox_dim": 4},
        ],
        "gating": {"processed_dim": 256, "hidden_dim": 128,
                   "temperature": 1.0, "use_softmax": True, "top_k": 0,
                   "noise_type": "gumbel", "noise_scale": 0.0},
        "context": {"type": "simple", "context_dim": 64},
        "policy": {"hidden_dim": 256, "num_waypoints": 8,
                   "waypoint_dim": 2},
    }
    H = 8
    torch.manual_seed(15)
    tmodel = ref_create(CONFIG, device="cpu")
    tmodel.freeze_experts()
    for m in tmodel.modules():  # RNG streams incomparable
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
    cfg = load_model_config(CONFIG)
    variables = import_automoe(to_numpy_state_dict(tmodel), cfg)
    # frozen = the expert PARAMETERS; BN running stats still update in
    # train mode on both sides (model.train() in the reference — the
    # composite's forward feeds batches through frozen experts)
    frozen_before = {
        k: np.asarray(v).copy()
        for k, v in to_numpy_state_dict(tmodel).items()
        if k.startswith("experts.")
        and "running_" not in k and "num_batches" not in k
    }

    rng = np.random.default_rng(31)
    tb, jb = [], []
    for _ in range(N_BATCHES):
        img = rng.normal(size=(B, 3, HW, HW)).astype(np.float32)
        wp = rng.normal(size=(B, H, 2)).astype(np.float32)
        seqs = {
            k: rng.uniform(0, 1, (B, H)).astype(np.float32)
            for k in ("speed", "steering", "throttle", "brake")
        }
        tb.append({
            "image": torch.from_numpy(img),
            "waypoints": torch.from_numpy(wp),
            **{k: torch.from_numpy(v) for k, v in seqs.items()},
        })
        jb.append({
            "image": np.transpose(img, (0, 2, 3, 1)).copy(),
            "waypoints": wp.copy(), **{k: v.copy() for k, v in seqs.items()},
        })

    loss_cfg = {}  # reference defaults: lb 0.01, entropy 0.001
    opt = torch.optim.AdamW(tmodel.parameters(), lr=LR, weight_decay=1e-4)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(
        opt, T_max=N_EPOCHS * N_BATCHES
    )
    tmodel.train()
    ref_epoch_losses = []
    for e in range(N_EPOCHS):
        ref_epoch_losses.append(ref_gate.train_one_epoch(
            tmodel, tb, opt, torch.device("cpu"), e, N_EPOCHS,
            rank=1, config=loss_cfg,
        ))
        sched.step()  # the reference's per-EPOCH cadence (:314)

    # ours: same model config, dropout off via the deterministic flag
    monkeypatch.setattr(
        W, "_det_kw",
        lambda m: {"deterministic": True}
        if "deterministic" in __import__("inspect").signature(
            m.__call__).parameters else {},
    )
    wl = gating_workload(CONFIG, image_size=HW)
    tr, our_losses = _run_ours(
        wl, jb, tmp_path, variables, optimizer="adamw", weight_decay=1e-4,
        run_name="gating", schedule="cosine_per_epoch",
    )
    our_epoch_losses = [
        float(np.mean(our_losses[e * N_BATCHES:(e + 1) * N_BATCHES]))
        for e in range(N_EPOCHS)
    ]
    np.testing.assert_allclose(
        our_epoch_losses, ref_epoch_losses, rtol=2e-2, atol=2e-2
    )

    # frozen experts: the reference leaves them bit-identical; so must we
    final_sd = to_numpy_state_dict(tmodel)
    for k, v in frozen_before.items():
        np.testing.assert_array_equal(np.asarray(final_sd[k]), v, err_msg=k)
    final_vars = import_automoe(final_sd, cfg)
    import jax as _jax

    ours_flat = dict(_jax.tree_util.tree_leaves_with_path(
        {"params": tr.state.params}))
    ref_flat = dict(_jax.tree_util.tree_leaves_with_path(
        {"params": final_vars["params"]}))
    for i in range(len(CONFIG["experts"])):
        key = f"expert_{i}"
        for p, a in ours_flat.items():
            if f"'{key}'" in _jax.tree_util.keystr(p):
                np.testing.assert_array_equal(
                    np.asarray(a), np.asarray(ref_flat[p]),
                    err_msg=_jax.tree_util.keystr(p),
                )
    _assert_params_close(
        {"params": tr.state.params, "batch_stats": tr.state.batch_stats},
        final_vars, rtol=3e-2, atol=3e-3, max_mismatch_frac=1e-4,
    )


@pytest.mark.slow
@pytest.mark.skipif(
    __import__("os").environ.get("RUN_SLOW_CONVERGENCE") != "1",
    reason="convergence-outcome lane: RUN_SLOW_CONVERGENCE=1 "
           "(scripts/slow_lane.sh) — ~200 SGD steps on each framework",
)
def test_drivable_convergence_outcome_parity(tmp_path, monkeypatch):
    """OUTCOME parity to convergence (VERDICT r4 item 3): trajectory
    parity stops at 12 steps (the AdamW assignment-fork boundary); this
    closes the remaining question — do both frameworks arrive at the
    SAME QUALITY MODEL? Same learnable fixture dataset (drivable 32²,
    200 train / 48 val, road-geometry masks correlated with pixels),
    same initial weights, both trained ~16 epochs of SGD through the
    REAL reference BDDTrainer (train_bdd100k_ddp.py:336-397) vs our
    Trainer; final eval metrics must agree within tolerance under BOTH
    metric recipes (the reference's _evaluate_segmentation_batch and
    our evals/segmentation.seg_metrics), and both must beat chance by a
    wide margin (the dataset is learnable, so 'both diverged' cannot
    pass)."""
    import importlib

    from automoe_tpu.evals.segmentation import seg_metrics

    S, Btr, EPOCHS = 32, 16, 16
    N_TRAIN, N_VAL = 192, 48
    rng = np.random.default_rng(77)

    def make_split(n):
        tb, jb = [], []
        for lo in range(0, n, Btr):
            b = min(Btr, n - lo)
            img = rng.normal(size=(b, 3, S, S)).astype(np.float32) * 0.3
            mask = np.zeros((b, S, S), np.int64)
            for i in range(b):
                y0 = int(S * rng.uniform(0.35, 0.65))
                xm = int(S * rng.uniform(0.3, 0.7))
                mask[i, y0:, :xm] = 1
                mask[i, y0:, xm:] = 2
                # class-correlated pixels (learnable, not trivial)
                img[i, 0, y0:, :xm] += 1.2
                img[i, 1, y0:, xm:] += 1.2
                img[i, 2, :y0, :] += 0.8
            tb.append({"image": torch.from_numpy(img.copy()),
                       "mask": torch.from_numpy(mask.copy())})
            jb.append({"image": np.transpose(img, (0, 2, 3, 1)).copy(),
                       "mask": mask.astype(np.int32)})
        return tb, jb

    t_train, j_train = make_split(N_TRAIN)
    t_val, j_val = make_split(N_VAL)

    torch.manual_seed(33)
    ref_mod = importlib.import_module("training.train_bdd100k_ddp")
    tmodel = ref_mod.BDDDrivableExpert(num_classes=3,
                                       pretrained_backbone=False)
    variables = ck.import_drivable_expert(to_numpy_state_dict(tmodel))

    trainer = _ref_trainer("drivable", tmodel, t_train, monkeypatch,
                           optimizer="sgd")
    trainer.scheduler = torch.optim.lr_scheduler.CosineAnnealingLR(
        trainer.optimizer, T_max=EPOCHS * len(t_train)
    )
    for e in range(EPOCHS):
        trainer.train_epoch(e)

    # reference metrics via the reference's own eval recipe
    tmodel.eval()
    ref_mets = {"pixel_acc": [], "mean_iou": []}
    for b in t_val:
        _, m = trainer._evaluate_segmentation_batch(b)
        for k in ref_mets:
            ref_mets[k].append(m[k])
    ref_final = {k: float(np.mean(v)) for k, v in ref_mets.items()}

    # ours: same init, same schedule shape, same epochs
    wl = bdd_expert_workload("drivable", image_size=S)
    cfg = TrainConfig(
        epochs=EPOCHS, learning_rate=LR, weight_decay=0.0,
        optimizer="sgd", run_name="conv", schedule="cosine",
        ckpt_root=str(tmp_path / "ckpt"), runs_root=str(tmp_path / "runs"),
        log_every=100, max_inflight=0,
    )
    from automoe_tpu.train.state import TrainState

    tr = Trainer(wl, j_train, j_val, cfg)
    tr.state = TrainState.create(
        params=variables["params"], tx=tr.state.tx,
        batch_stats=variables.get("batch_stats", {}),
    )
    for e in range(EPOCHS):
        tr.train_epoch(e)
    tr.logger.close()

    # our metrics via OUR eval recipe (jitted batch metrics)
    import jax

    @jax.jit
    def _eval_batch(params, stats, image):
        v = {"params": params}
        if stats:
            v["batch_stats"] = stats
        return wl.model.apply(v, image, train=False)

    ours_mets = {"pixel_acc": [], "mean_iou": []}
    for b in j_val:
        logits = _eval_batch(tr.state.params, tr.state.batch_stats,
                             b["image"])
        m = seg_metrics(logits, b["mask"], num_classes=3)
        for k in ours_mets:
            ours_mets[k].append(float(m[k]))
    ours_final = {k: float(np.mean(v)) for k, v in ours_mets.items()}

    # cross-check: the reference's FINAL weights through OUR eval suite
    # (eval-recipe parity at the converged point)
    ref_weights = ck.import_drivable_expert(to_numpy_state_dict(tmodel))
    cross = {"pixel_acc": [], "mean_iou": []}
    for b in j_val:
        logits = _eval_batch(
            ref_weights["params"], ref_weights.get("batch_stats", {}),
            b["image"],
        )
        m = seg_metrics(logits, b["mask"], num_classes=3)
        for k in cross:
            cross[k].append(float(m[k]))
    cross_final = {k: float(np.mean(v)) for k, v in cross.items()}

    print(f"[convergence] ref={ref_final} ours={ours_final} "
          f"cross={cross_final}", flush=True)
    # both frameworks LEARNED (chance pixel-acc on this geometry ~0.45)
    assert ref_final["pixel_acc"] > 0.85, ref_final
    assert ours_final["pixel_acc"] > 0.85, ours_final
    # outcome parity between frameworks
    assert abs(ours_final["pixel_acc"] - ref_final["pixel_acc"]) < 0.03, (
        ours_final, ref_final)
    assert abs(ours_final["mean_iou"] - ref_final["mean_iou"]) < 0.05, (
        ours_final, ref_final)
    # eval-suite parity on identical weights
    assert abs(cross_final["pixel_acc"] - ref_final["pixel_acc"]) < 0.01, (
        cross_final, ref_final)
    assert abs(cross_final["mean_iou"] - ref_final["mean_iou"]) < 0.02, (
        cross_final, ref_final)
