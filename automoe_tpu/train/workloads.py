"""Workload definitions: model + loss closure per training pipeline.

One uniform shape replaces the reference's five trainer scripts
(train_bdd100k_ddp.py, train_nuscenes_expert_ddp.py,
train_carla_bdd_experts_ddp.py, train_carla_policy.py,
train_gating_network.py — SURVEY.md §2.1 T2-T7). Each workload exposes
(model, loss_fn, example_batch); the generic step/loop handles the rest.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from automoe_tpu.configs import AutoMoEConfig, ExpertConfig, load_model_config
from automoe_tpu.losses import (
    detection_set_loss,
    gating_losses,
    nuscenes_set_loss,
    policy_losses,
    segmentation_loss,
)
from automoe_tpu.models import (
    BDDDetectionExpert,
    BDDDrivableExpert,
    BDDSegmentationExpert,
    NuScenesExpert,
    TrajectoryPolicy,
    create_automoe_model,
)
from automoe_tpu.models.automoe import expert_param_mask


@dataclasses.dataclass
class Workload:
    name: str
    model: Any
    loss_fn: Callable  # (params, batch_stats, batch, rng, train) -> (loss, (metrics, stats))
    # numpy (NOT device arrays): init_variables jit-closes over these,
    # and closed-over device arrays poison dispatch (CLAUDE.md landmine 1)
    example_batch: Dict[str, np.ndarray]
    trainable_mask_fn: Optional[Callable] = None  # params -> mask pytree
    # builds the model.__call__ positional args from a batch dict:
    init_args: Callable = lambda b: (b["image"],)
    # optional per-batch task metrics for validation epochs (reference
    # computes avg-IoU/recall@0.5 and pixel-acc/mIoU during training,
    # train_bdd100k_ddp.py:196-375): (params, batch_stats, batch) ->
    # {name: scalar}. Jitted by the Trainer.
    metrics_fn: Optional[Callable] = None

    def init_variables(self, rng, batch=None):
        batch = batch if batch is not None else self.example_batch
        args = self.init_args(batch)
        return jax.jit(lambda k: self.model.init(k, *args))(rng)


def _apply(model, params, batch_stats, args, rng, train, needs_rngs=("dropout",),
           extra_kwargs=None):
    """Run a flax module handling BN mutability + dropout RNG threading."""
    extra = dict(extra_kwargs or {})
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    if train:
        rngs = {name: jax.random.fold_in(rng, i) for i, name in enumerate(needs_rngs)}
        out, updates = model.apply(
            variables,
            *args,
            train=True,
            mutable=["batch_stats"],
            rngs=rngs,
            **_det_kw(model),
            **extra,
        )
        return out, updates.get("batch_stats", batch_stats)
    out = model.apply(variables, *args, train=False, **extra)
    return out, batch_stats


def default_matcher() -> str:
    """TPU: the Pallas auction kernel (0.38 ms vs 12.4 ms exact Hungarian
    at B=32/Q=64/N=48; train-step sweep-validated vs Hungarian — see
    benchmarks/BENCHMARKS.md). Elsewhere: the jnp auction (the Pallas
    kernel would run in slow interpret mode)."""
    return "auction_pallas" if jax.default_backend() == "tpu" else "auction"


def _det_kw(model) -> Dict[str, Any]:
    # modules with dropout take `deterministic`; train=True → active dropout
    import inspect

    sig = inspect.signature(model.__call__)
    return {"deterministic": False} if "deterministic" in sig.parameters else {}


# ---------------------------------------------------------------------------
# BDD experts (detection / segmentation / drivable)
# ---------------------------------------------------------------------------

def bdd_expert_workload(
    task: str,
    *,
    num_classes: Optional[int] = None,
    image_size: int = 256,
    box_cap: int = 48,
    bbox_loss_weight: float = 2.0,
    cost_class: float = 1.0,
    cost_bbox: float = 5.0,
    cost_giou: float = 2.0,
    matcher: Optional[str] = None,
    dtype=jnp.float32,
    remat: bool = False,
    qat: bool = False,
    augment: bool = False,
) -> Workload:
    """BDD100K expert training (reference train_bdd100k_ddp.py) and its
    CARLA fine-tune variant (train_carla_bdd_experts_ddp.py) — the same
    workload over a different data source.

    remat=True checkpoints each backbone BasicBlock (nn.remat inside
    ResNet18Backbone): the backward recomputes one block at a time
    instead of holding the whole stack's activations — the TPU HBM/FLOPs
    trade for batches/resolutions that don't otherwise fit. Same param
    tree, same math (tests/test_remat.py).

    augment=True fuses on-device crop/flip/color-jitter (with
    box/mask-consistent label geometry) into the TRAIN step's jit, keyed
    by the step RNG; validation is never augmented. OFF by default —
    the reference has no augmentation (ops/augment.py docstring)."""
    defaults = {"detection": 10, "segmentation": 19, "drivable": 3}
    C = num_classes if num_classes is not None else defaults[task]
    matcher = matcher or default_matcher()
    if augment:
        from automoe_tpu.ops.augment import (
            AugmentConfig,
            augment_detection,
            augment_segmentation,
        )

        aug_cfg = AugmentConfig()

    if task == "detection":
        model = BDDDetectionExpert(
            num_classes=C, dtype=dtype, remat=remat, qat=qat
        )

        def loss_fn(params, batch_stats, batch, rng, train):
            if augment and train:
                batch = augment_detection(
                    batch, jax.random.fold_in(rng, 0x41554721), aug_cfg
                )
            out, new_stats = _apply(
                model, params, batch_stats, (batch["image"],), rng, train
            )
            res = detection_set_loss(
                out["class_logits"],
                out["bbox_deltas"],
                batch["bboxes"],
                batch["labels"],
                num_classes=C,
                bbox_loss_weight=bbox_loss_weight,
                cost_class=cost_class,
                cost_bbox=cost_bbox,
                cost_giou=cost_giou,
                matcher=matcher,
            )
            metrics = {"class_loss": res["class_loss"], "bbox_loss": res["bbox_loss"]}
            if not train:
                # per-epoch val task metrics (train_bdd100k_ddp.py:266-294:
                # batch value = mean over samples WITH matches, 0.0 when
                # none) — reuses the loss's OWN matching (no second
                # forward, no second assignment)
                from automoe_tpu.evals.detection import matched_iou_recall

                B, hh, ww, _ = out["class_logits"].shape
                pred_boxes = out["bbox_deltas"].reshape(B, hh * ww, 4)
                si, sr, has = matched_iou_recall(
                    pred_boxes, batch["bboxes"], res["query_idx"], res["valid"]
                )
                denom = jnp.maximum(jnp.sum(has), 1)
                metrics["avg_iou"] = jnp.sum(jnp.where(has, si, 0.0)) / denom
                metrics["recall_0.5"] = jnp.sum(jnp.where(has, sr, 0.0)) / denom
            return res["loss"], (metrics, new_stats)

        example = {
            "image": np.zeros((2, image_size, image_size, 3), jnp.float32),
            "bboxes": np.zeros((2, box_cap, 4), jnp.float32),
            "labels": np.full((2, box_cap), -1, jnp.int32),
        }
    else:
        model = (
            BDDSegmentationExpert(
                num_classes=C, dtype=dtype, remat=remat, qat=qat
            )
            if task == "segmentation"
            else BDDDrivableExpert(
                num_classes=C, dtype=dtype, remat=remat, qat=qat
            )
        )

        def loss_fn(params, batch_stats, batch, rng, train):
            if augment and train:
                batch = augment_segmentation(
                    batch, jax.random.fold_in(rng, 0x41554721), aug_cfg
                )
            logits, new_stats = _apply(
                model, params, batch_stats, (batch["image"],), rng, train
            )
            res = segmentation_loss(logits, batch["mask"])
            metrics = {}
            if not train:
                # pixel-acc + mIoU per val batch (train_bdd100k_ddp.py:
                # 297-334), from the logits already in hand
                from automoe_tpu.evals.segmentation import seg_metrics

                metrics = dict(
                    seg_metrics(logits, batch["mask"], num_classes=C)
                )
            return res["loss"], (metrics, new_stats)

        example = {
            "image": np.zeros((2, image_size, image_size, 3), jnp.float32),
            "mask": np.zeros((2, image_size, image_size), jnp.int32),
        }

    return Workload(
        name=f"bdd_{task}", model=model, loss_fn=loss_fn, example_batch=example
    )


# ---------------------------------------------------------------------------
# nuScenes expert
# ---------------------------------------------------------------------------

def nuscenes_workload(
    *,
    num_queries: int = 100,
    bbox_dim: int = 7,
    use_lidar: bool = True,
    use_tnet: bool = False,
    fusion: str = "concat",
    image_size: int = 256,
    lidar_cap: int = 2048,
    box_cap: int = 64,
    bbox_loss_weight: float = 5.0,
    matcher: Optional[str] = None,
    dtype=jnp.float32,
    remat: bool = False,
    qat: bool = False,
) -> Workload:
    matcher = matcher or default_matcher()
    model = NuScenesExpert(
        num_queries=num_queries,
        fusion=fusion,
        use_lidar=use_lidar,
        use_tnet=use_tnet,
        bbox_dim=bbox_dim,
        dtype=dtype,
        remat=remat,
        qat=qat,
    )

    def loss_fn(params, batch_stats, batch, rng, train):
        out, new_stats = _apply(
            model,
            params,
            batch_stats,
            ({"image": batch["image"], "lidar": batch.get("lidar")},),
            rng,
            train,
        )
        res = nuscenes_set_loss(
            out["class_logits"],
            out["bbox_preds"],
            batch["boxes"],
            batch["labels"],
            bbox_loss_weight=bbox_loss_weight,
            matcher=matcher,
        )
        metrics = {"class_loss": res["class_loss"], "bbox_loss": res["bbox_loss"]}
        return res["loss"], (metrics, new_stats)

    example = {
        "image": np.zeros((2, image_size, image_size, 3), jnp.float32),
        "lidar": np.zeros((2, lidar_cap, 3), jnp.float32),
        "boxes": np.zeros((2, box_cap, bbox_dim), jnp.float32),
        "labels": np.full((2, box_cap), -1, jnp.int32),
    }
    return Workload(
        "nuscenes", model, loss_fn, example,
        init_args=lambda b: ({"image": b["image"], "lidar": b["lidar"]},),
    )


# ---------------------------------------------------------------------------
# nuScenes → CARLA image-only 2D fine-tune (reference
# train_carla_nuscenes_expert_2d_ddp.py). Loss: matched-only CE + matched
# SmoothL1 (mean), bbox weight default 1.0 (:99-114).
# ---------------------------------------------------------------------------

def carla_nuscenes_2d_workload(
    *,
    num_queries: int = 196,
    num_classes: int = 10,
    image_size: int = 256,
    box_cap: int = 48,
    bbox_loss_weight: float = 1.0,
    dtype=jnp.float32,
    remat: bool = False,
    qat: bool = False,
    augment: bool = False,
) -> Workload:
    from automoe_tpu.models.experts import NuScenesImage2DHead
    from automoe_tpu.losses.detection import scatter_matched_targets
    from automoe_tpu.ops.boxes import box_convert
    from automoe_tpu.ops.masked import masked_cross_entropy, masked_smooth_l1
    from automoe_tpu.ops.matching import hungarian_match

    model = NuScenesImage2DHead(
        num_queries=num_queries, num_classes=num_classes, dtype=dtype,
        remat=remat, qat=qat,
    )
    if augment:
        from automoe_tpu.ops.augment import AugmentConfig, augment_detection

        aug_cfg = AugmentConfig()

    def loss_fn(params, batch_stats, batch, rng, train):
        if augment and train:
            batch = augment_detection(
                batch, jax.random.fold_in(rng, 0x41554721), aug_cfg
            )
        out, new_stats = _apply(
            model, params, batch_stats, (batch["image"],), rng, train
        )
        logits, boxes = out["pred_logits"], out["pred_boxes"]
        B, Q, C = logits.shape
        tgt_cxcywh = box_convert(batch["bboxes"], "xyxy", "cxcywh")
        qidx, valid = hungarian_match(logits, boxes, tgt_cxcywh, batch["labels"])
        tc, tb = scatter_matched_targets(qidx, valid, tgt_cxcywh, batch["labels"], Q, C)
        cls_loss = masked_cross_entropy(
            logits.reshape(B * Q, C), tc.reshape(B * Q), ignore_index=C
        )
        matched = tc.reshape(B * Q) != C
        box_loss = masked_smooth_l1(
            boxes.reshape(B * Q, 4), tb.reshape(B * Q, 4), matched
        )
        total = cls_loss + bbox_loss_weight * box_loss
        return total, ({"class_loss": cls_loss, "bbox_loss": box_loss}, new_stats)

    example = {
        "image": np.zeros((2, image_size, image_size, 3), jnp.float32),
        "bboxes": np.zeros((2, box_cap, 4), jnp.float32),
        "labels": np.full((2, box_cap), -1, jnp.int32),
    }
    return Workload("carla_nuscenes_2d", model, loss_fn, example)


# ---------------------------------------------------------------------------
# CARLA trajectory policy
# ---------------------------------------------------------------------------

def policy_workload(
    *,
    horizon: int = 8,
    context_dim: int = 0,
    backbone_dim: int = 512,
    image_size: int = 256,
    dtype=jnp.float32,
    trunk_depth: int = 0,
    trunk_width: int = 128,
    pipeline_mesh=None,
    pipeline_microbatches: int = 0,
) -> Workload:
    """Standalone TrajectoryPolicy training (train_carla_policy.py).

    trunk_depth > 0 swaps EasyBackbone for the depth-scalable
    `models/deep_policy.py::DeepTrajectoryPolicy` (L residual GroupNorm
    blocks of `trunk_width` channels). With `pipeline_mesh` (+
    `pipeline_microbatches`) the trunk runs PIPELINE-PARALLEL across the
    mesh's 'model' axis (parallel/pp.py::grouped_pipeline_apply);
    the Trainer places the stacked block params per stage when
    TrainConfig.pp_microbatches > 0."""
    if trunk_depth > 0:
        from automoe_tpu.models.deep_policy import DeepTrajectoryPolicy

        model = DeepTrajectoryPolicy(
            horizon=horizon, context_dim=context_dim,
            backbone_dim=backbone_dim, depth=trunk_depth,
            width=trunk_width, dtype=dtype,
        )
    else:
        model = TrajectoryPolicy(
            horizon=horizon, context_dim=context_dim,
            backbone_dim=backbone_dim, dtype=dtype,
        )
    extra_kwargs = {}
    if pipeline_microbatches > 0:
        if trunk_depth <= 0:
            raise ValueError(
                "pipeline_microbatches needs trunk_depth > 0 (only the "
                "deep trunk is stage-partitionable)"
            )
        if pipeline_mesh is None:
            raise ValueError("pipeline_microbatches needs pipeline_mesh")
        from automoe_tpu.parallel.pp import grouped_pipeline_apply

        extra_kwargs["trunk_apply"] = functools.partial(
            grouped_pipeline_apply, mesh=pipeline_mesh,
            microbatches=pipeline_microbatches,
        )

    def loss_fn(params, batch_stats, batch, rng, train):
        ctx = batch.get("context") if context_dim > 0 else None
        out, new_stats = _apply(
            model, params, batch_stats, (batch["image"], ctx), rng, train,
            extra_kwargs=extra_kwargs,
        )
        res = policy_losses(out, batch["waypoints"], batch["speed"])
        metrics = {k: v for k, v in res.items() if k != "loss"}
        return res["loss"], (metrics, new_stats)

    example = {
        "image": np.zeros((2, image_size, image_size, 3), jnp.float32),
        "waypoints": np.zeros((2, horizon, 2), jnp.float32),
        "speed": np.zeros((2, horizon), jnp.float32),
    }
    if context_dim > 0:
        example["context"] = np.zeros((2, context_dim), jnp.float32)
    return Workload(
        "carla_policy", model, loss_fn, example,
        init_args=lambda b: (b["image"], b.get("context")),
    )


# ---------------------------------------------------------------------------
# Gating network (full AutoMoE, frozen experts)
# ---------------------------------------------------------------------------

def pooled_feature_dim(ecfg) -> int:
    """Width of an expert's parameter-free pooled extractor input
    (models/extractors.py pooling; models/automoe.py
    automoe_pooled_features)."""
    if ecfg.type == "detection":
        return ecfg.num_classes + 4
    if ecfg.type in ("segmentation", "drivable"):
        return ecfg.num_classes
    return ecfg.num_queries * (ecfg.num_classes + ecfg.bbox_dim)


def gating_workload(
    model_config: Any,
    *,
    loss_config: Optional[Dict] = None,
    image_size: int = 256,
    freeze_experts: bool = True,
    dtype=jnp.float32,
    cache_features: bool = False,
    experts_eval: bool = False,
) -> Workload:
    """Gating training over the full AutoMoE (train_gating_network.py):
    experts frozen (stop-gradient via optimizer mask), gating + extractors +
    context + policy train.

    experts_eval: frozen experts run in eval mode (frozen BN) instead of
    the reference's train-mode BN — see train/feature_cache.py.
    cache_features: skip the expert trunks entirely; batches must carry
    `expert_pooled_{i}` keys (PooledFeatureDataset). Implies experts_eval
    semantics and is exactly equivalent to it (tests/test_feature_cache.py).
    """
    cfg: AutoMoEConfig = load_model_config(model_config)
    model = create_automoe_model(cfg, dtype=dtype)
    horizon = cfg.policy.num_waypoints
    lcfg = dict(loss_config or {})
    n_experts = len(cfg.experts)
    pooled_names = [f"expert_pooled_{i}" for i in range(n_experts)]

    def loss_fn(params, batch_stats, batch, rng, train):
        extra: Dict[str, Any] = {}
        if cache_features:
            extra["cached_pooled"] = [batch[k] for k in pooled_names]
            batch = {k: v for k, v in batch.items() if k not in pooled_names}
        elif experts_eval:
            extra["experts_eval"] = True
        out, new_stats = _apply(
            model,
            params,
            batch_stats,
            (batch,),
            rng,
            train,
            needs_rngs=("dropout", "gating"),
            extra_kwargs=extra,
        )
        if cache_features and train:
            # skipped expert modules drop out of the mutable batch_stats
            # collection — merge their (frozen, untouched) subtrees back so
            # the train state / checkpoints keep the full stats tree
            merged = dict(batch_stats)
            merged.update(new_stats)
            new_stats = merged
        res = gating_losses(out, batch["waypoints"], batch["speed"], lcfg)
        metrics = {k: v for k, v in res.items() if k != "total_loss"}
        return res["total_loss"], (metrics, new_stats)

    example = {
        "image": np.zeros((2, image_size, image_size, 3), jnp.float32),
        "lidar": np.zeros((2, 1000, 3), jnp.float32),
        "speed": np.zeros((2, horizon), jnp.float32),
        "steering": np.zeros((2, horizon), jnp.float32),
        "throttle": np.zeros((2, horizon), jnp.float32),
        "brake": np.zeros((2, horizon), jnp.float32),
        "waypoints": np.zeros((2, horizon, 2), jnp.float32),
    }
    if cache_features:
        for i, ecfg in enumerate(cfg.experts):
            example[pooled_names[i]] = np.zeros(
                (2, pooled_feature_dim(ecfg)), np.float32
            )
    mask_fn = (lambda params: expert_param_mask(params, frozen=True)) if freeze_experts else None
    return Workload(
        "gating", model, loss_fn, example,
        trainable_mask_fn=mask_fn, init_args=lambda b: (b,),
    )
