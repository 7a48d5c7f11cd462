"""The four perception experts, NHWC / TPU-native.

Behavioral parity targets (shapes & output schemas) with the reference:
  - BDDDetectionExpert    (models/experts/bdd_detection_expert.py:4-31)
  - BDDSegmentationExpert (models/experts/bdd_segmentation_expert.py:5-23)
  - BDDDrivableExpert     (models/experts/bdd_drivable_expert.py:5-23)
  - NuScenesExpert (+TNet/PointNet)
                          (models/experts/nuscenes_expert.py:6-190)

All dense-map outputs are channel-last ([B,H,W,C]); the reference's
`permute(0,2,3,1).reshape(B,Q,C)` query flattening becomes a plain reshape.
Bilinear upsampling uses half-pixel centers (= torch align_corners=False).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn

from automoe_tpu.models.norm import TorchBatchNorm
import jax
import jax.numpy as jnp

from automoe_tpu.models.resnet import ResNet18Backbone

Dtype = Any


class _ConvHead(nn.Module):
    """3x3 conv(512→256) + ReLU + 1x1 conv(256→out): the shared dense head."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(
            256, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv1"
        )(x)
        x = nn.relu(x)
        return nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv2")(x)


def bilinear_resize(x: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """[B,h,w,C] → [B,H,W,C] bilinear, matching F.interpolate(align_corners=
    False) to ~5e-7. Runs as two MXU matmuls (automoe_tpu.ops.resize) —
    jax.image.resize's gather lowering is ~40x slower on TPU."""
    from automoe_tpu.ops.resize import resize_bilinear

    return resize_bilinear(x, height, width, antialias=False)


class BDDDetectionExpert(nn.Module):
    """Dense per-cell detector: ResNet18 trunk → {class_logits, bbox_deltas}."""

    num_classes: int = 10
    dtype: Dtype = jnp.float32
    remat: bool = False  # per-block activation checkpointing in the backbone
    qat: bool = False  # int8 fake-quant training (models/resnet.py)

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> Dict[str, jnp.ndarray]:
        feats = ResNet18Backbone(dtype=self.dtype, remat=self.remat, qat=self.qat, name="backbone")(x, train=train)
        out = _ConvHead(self.num_classes + 4, dtype=self.dtype, name="head")(feats)
        return {
            "class_logits": out[..., : self.num_classes],  # [B,H/32,W/32,C]
            "bbox_deltas": out[..., self.num_classes :],  # [B,H/32,W/32,4]
        }

    def predict(self, variables, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        out = self.apply(variables, x)
        return {
            "class_probs": jax.nn.softmax(out["class_logits"], axis=-1),
            "bbox_deltas": jax.nn.sigmoid(out["bbox_deltas"]),
        }


class BDDSegmentationExpert(nn.Module):
    """ResNet18 trunk → conv decoder → bilinear upsample to input res.

    upsample=False returns the low-res logits (serving fast path: the
    gating extractor pools them with exact mean-of-resize weights)."""

    num_classes: int = 19
    dtype: Dtype = jnp.float32
    remat: bool = False  # per-block activation checkpointing in the backbone
    qat: bool = False  # int8 fake-quant training (models/resnet.py)
    upsample: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        feats = ResNet18Backbone(dtype=self.dtype, remat=self.remat, qat=self.qat, name="backbone")(x, train=train)
        logits = _ConvHead(self.num_classes, dtype=self.dtype, name="decoder")(feats)
        if not self.upsample:
            return logits  # [B,H/32,W/32,C]
        return bilinear_resize(logits, x.shape[1], x.shape[2])  # [B,H,W,C]


class BDDDrivableExpert(nn.Module):
    """Same architecture, 3 classes {bg, drivable, alternative}."""

    num_classes: int = 3
    dtype: Dtype = jnp.float32
    remat: bool = False  # per-block activation checkpointing in the backbone
    qat: bool = False  # int8 fake-quant training (models/resnet.py)
    upsample: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        feats = ResNet18Backbone(dtype=self.dtype, remat=self.remat, qat=self.qat, name="backbone")(x, train=train)
        logits = _ConvHead(self.num_classes, dtype=self.dtype, name="decoder")(feats)
        if not self.upsample:
            return logits
        return bilinear_resize(logits, x.shape[1], x.shape[2])


class TNet(nn.Module):
    """PointNet alignment net: predicts a k×k transform per cloud."""

    k: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        # x: [B, N, k]. Per-point 1x1 convs are plain Dense layers over the
        # feature axis (maps onto the MXU as one batched matmul).
        norm = lambda name: TorchBatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        h = nn.relu(norm("bn1")(nn.Dense(64, dtype=self.dtype, name="conv1")(x)))
        h = nn.relu(norm("bn2")(nn.Dense(128, dtype=self.dtype, name="conv2")(h)))
        h = nn.relu(norm("bn3")(nn.Dense(1024, dtype=self.dtype, name="conv3")(h)))
        h = jnp.max(h, axis=1)  # [B, 1024]
        h = nn.relu(norm("bn4")(nn.Dense(512, dtype=self.dtype, name="fc1")(h)))
        h = nn.relu(norm("bn5")(nn.Dense(256, dtype=self.dtype, name="fc2")(h)))
        h = nn.Dense(self.k * self.k, dtype=self.dtype, name="fc3")(h)
        eye = jnp.eye(self.k, dtype=h.dtype).reshape(1, self.k * self.k)
        return (h + eye).reshape(-1, self.k, self.k)


class PointNet(nn.Module):
    """PointNet encoder: per-point MLP + max-pool + head MLP → [B, output_dim]."""

    output_dim: int = 1024
    use_tnet: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, *, train: bool = False, deterministic: bool = True
    ) -> jnp.ndarray:
        # x: [B, N, 3]
        norm = lambda name: TorchBatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        if self.use_tnet:
            trans = TNet(k=3, dtype=self.dtype, name="input_transform")(x, train=train)
            x = jnp.einsum("bij,bnj->bni", trans, x)
        h = nn.relu(norm("bn1")(nn.Dense(64, dtype=self.dtype, name="conv1")(x)))
        if self.use_tnet:
            trans_feat = TNet(k=64, dtype=self.dtype, name="feature_transform")(
                h, train=train
            )
            h = jnp.einsum("bij,bnj->bni", trans_feat, h)
        h = nn.relu(norm("bn2")(nn.Dense(128, dtype=self.dtype, name="conv2")(h)))
        h = nn.relu(norm("bn3")(nn.Dense(1024, dtype=self.dtype, name="conv3")(h)))
        h = jnp.max(h, axis=1)  # symmetric max over points
        h = nn.relu(norm("bn4")(nn.Dense(512, dtype=self.dtype, name="fc1")(h)))
        h = nn.Dropout(0.3, deterministic=deterministic)(h)
        h = nn.relu(norm("bn5")(nn.Dense(256, dtype=self.dtype, name="fc2")(h)))
        h = nn.Dropout(0.3, deterministic=deterministic)(h)
        return nn.Dense(self.output_dim, dtype=self.dtype, name="fc3")(h)


class NuScenesImage2DHead(nn.Module):
    """Image-only 2D detection head over the nuScenes backbone — the
    CARLA fine-tune wrapper (reference training/
    train_carla_nuscenes_expert_2d_ddp.py:25-49 `ImageOnlyWrapper`):
    ResNet18(+pool)→proj(256), 196 learned queries added to the broadcast
    scene feature, MLP 256→256→128 with Dropout(0.1), 10-way class head +
    4-dim box head. Module names align with the wrapper's state dict
    (query_embed / mlp / class_head / box_head) for weight import."""

    num_queries: int = 196
    num_classes: int = 10
    dtype: Dtype = jnp.float32
    remat: bool = False  # per-block activation checkpointing in the backbone
    qat: bool = False  # int8 fake-quant training (models/resnet.py)

    @nn.compact
    def __call__(
        self, image: jnp.ndarray, *, train: bool = False,
        deterministic: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        feat = ResNet18Backbone(
            include_pool=True, dtype=self.dtype, remat=self.remat,
            qat=self.qat, name="image_backbone"
        )(image, train=train)
        feat = nn.Dense(256, dtype=self.dtype, name="image_projection")(feat)
        queries = self.param(
            "query_embed", nn.initializers.normal(1.0), (self.num_queries, 256)
        ).astype(feat.dtype)
        x = feat[:, None, :] + queries[None, :, :]
        x = nn.Dense(256, dtype=self.dtype, name="mlp_fc1")(x)
        x = nn.relu(x)
        x = nn.Dropout(0.1, deterministic=deterministic)(x)
        x = nn.Dense(128, dtype=self.dtype, name="mlp_fc2")(x)
        x = nn.relu(x)
        x = nn.Dropout(0.1, deterministic=deterministic)(x)
        return {
            "pred_logits": nn.Dense(
                self.num_classes, dtype=self.dtype, name="class_head"
            )(x),
            "pred_boxes": nn.Dense(4, dtype=self.dtype, name="box_head")(x),
        }


class NuScenesExpert(nn.Module):
    """Camera(+LiDAR) DETR-lite: global scene feature broadcast over learned
    queries → MLP decoder → class/bbox heads."""

    num_queries: int = 100
    fusion: str = "concat"  # 'concat' | 'sum'
    use_lidar: bool = False
    use_tnet: bool = False
    bbox_dim: int = 7
    num_classes: int = 10
    dtype: Dtype = jnp.float32
    remat: bool = False  # per-block activation checkpointing in the backbone
    qat: bool = False  # int8 fake-quant training (models/resnet.py)

    @property
    def fusion_dim(self) -> int:
        return 512 if (self.use_lidar and self.fusion == "concat") else 256

    @nn.compact
    def __call__(
        self,
        batch: Dict[str, jnp.ndarray],
        *,
        train: bool = False,
        deterministic: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        image = batch["image"]  # [B,H,W,3]
        lidar: Optional[jnp.ndarray] = batch.get("lidar")

        img_feat = ResNet18Backbone(
            include_pool=True, dtype=self.dtype, remat=self.remat,
            qat=self.qat, name="image_backbone"
        )(image, train=train)  # [B,512]
        img_feat = nn.Dense(256, dtype=self.dtype, name="image_projection")(img_feat)

        if self.use_lidar and lidar is not None:
            lidar_feat = PointNet(
                output_dim=256, use_tnet=self.use_tnet, dtype=self.dtype,
                name="lidar_backbone",
            )(lidar, train=train, deterministic=deterministic)
            if self.fusion == "concat":
                fused = jnp.concatenate([img_feat, lidar_feat], axis=-1)  # [B,512]
            else:
                fused = img_feat + lidar_feat
        else:
            fused = img_feat  # image-only

        queries = self.param(
            "query_embed",
            nn.initializers.normal(1.0),
            (self.num_queries, self.fusion_dim),
        ).astype(fused.dtype)
        x = fused[:, None, :] + queries[None, :, :]  # [B,Q,fusion_dim]

        x = nn.Dense(256, dtype=self.dtype, name="decoder_fc1")(x)
        x = nn.relu(x)
        x = nn.Dropout(0.3, deterministic=deterministic)(x)
        x = nn.Dense(128, dtype=self.dtype, name="decoder_fc2")(x)
        x = nn.relu(x)
        x = nn.Dropout(0.3, deterministic=deterministic)(x)

        return {
            "class_logits": nn.Dense(
                self.num_classes, dtype=self.dtype, name="class_head"
            )(x),  # [B,Q,10]
            "bbox_preds": nn.Dense(self.bbox_dim, dtype=self.dtype, name="bbox_head")(
                x
            ),  # [B,Q,bbox_dim]
        }
