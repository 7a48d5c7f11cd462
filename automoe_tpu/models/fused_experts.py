"""Fused multi-expert ResNet trunk: N ResNet-18s as ONE grouped-conv net.

The reference runs its four experts as sequential model calls
(models/automoe.py:156-187). On TPU, the three BDD experts and the
nuScenes image branch share an identical ResNet-18 topology over the SAME
input image, so their convolutions can execute as a single network with
`feature_group_count=N` — N× wider matmuls, N× fewer kernel launches,
far better MXU utilization at small batch. Grouped convolution with
concatenated per-expert weights is EXACTLY equivalent to N independent
convolutions (verified to fp32 round-off in tests/test_fused.py).

`fuse_expert_variables` builds the fused parameter tree from N standalone
expert trees, so checkpoints remain per-expert and fusion is a pure
inference/serving-time transform.
"""
from __future__ import annotations

from typing import Any, Dict, List, Sequence

import flax.linen as nn

from automoe_tpu.models.norm import TorchBatchNorm
import jax.numpy as jnp
import numpy as np

Dtype = Any


class FusedBasicBlock(nn.Module):
    filters: int  # per-expert filters
    groups: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        total = self.filters * self.groups
        norm = lambda name: TorchBatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        residual = x
        y = nn.Conv(
            total, (3, 3), strides=(self.stride, self.stride),
            padding=((1, 1), (1, 1)), use_bias=False,
            feature_group_count=self.groups, dtype=self.dtype, name="conv1",
        )(x)
        y = nn.relu(norm("bn1")(y))
        y = nn.Conv(
            total, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
            feature_group_count=self.groups, dtype=self.dtype, name="conv2",
        )(y)
        y = norm("bn2")(y)
        if residual.shape[-1] != total or self.stride != 1:
            residual = nn.Conv(
                total, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, feature_group_count=self.groups,
                dtype=self.dtype, name="downsample_conv",
            )(x)
            residual = norm("downsample_bn")(residual)
        return nn.relu(y + residual)


class FusedResNet18Trunk(nn.Module):
    """N grouped ResNet-18 trunks over one shared image.

    Input [B,H,W,3] is tiled to [B,H,W,3N]; output [B,H/32,W/32,512N]
    where channels [i*512:(i+1)*512] are expert i's feature map.
    """

    groups: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        x = jnp.tile(image.astype(self.dtype), (1, 1, 1, self.groups))
        x = nn.Conv(
            64 * self.groups, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
            use_bias=False, feature_group_count=self.groups,
            dtype=self.dtype, name="conv1",
        )(x)
        x = TorchBatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn1",
        )(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for stage, (filters, stride) in enumerate(
            [(64, 1), (128, 2), (256, 2), (512, 2)], start=1
        ):
            x = FusedBasicBlock(
                filters, self.groups, stride, self.dtype, name=f"layer{stage}_0"
            )(x, train=train)
            x = FusedBasicBlock(
                filters, self.groups, 1, self.dtype, name=f"layer{stage}_1"
            )(x, train=train)
        return x  # [B, H/32, W/32, 512*groups]


# ---------------------------------------------------------------------------
# Weight fusion: N standalone ResNet18Backbone trees → one fused tree
# ---------------------------------------------------------------------------

def _concat_leaf(leaves: Sequence[np.ndarray], kind: str) -> np.ndarray:
    arrs = [np.asarray(a) for a in leaves]
    if kind == "conv_kernel":  # [kh,kw,in,out] → concat along out
        return np.concatenate(arrs, axis=-1)
    return np.concatenate(arrs, axis=0)  # bn scale/bias/mean/var


def fuse_backbone_params(backbones: List[Dict]) -> Dict:
    """N ResNet18Backbone param/batch_stats subtrees → fused trunk tree.

    Grouped conv kernels are per-group concatenations along the OUTPUT
    channel axis (group g consumes input channels [g*in:(g+1)*in]).
    """
    import flax

    flats = [flax.traverse_util.flatten_dict(b) for b in backbones]
    fused = {}
    for key in flats[0]:
        leaves = [f[key] for f in flats]
        kind = "conv_kernel" if key[-1] == "kernel" else "bn"
        fused[key] = _concat_leaf(leaves, kind)
    return flax.traverse_util.unflatten_dict(fused)


def fuse_expert_variables(expert_vars: List[Dict[str, Any]]) -> Dict[str, Any]:
    """N expert variable dicts ({params:{backbone:...}, batch_stats:...})
    → fused-trunk variables."""
    params = fuse_backbone_params([v["params"]["backbone"] for v in expert_vars])
    stats = fuse_backbone_params(
        [v.get("batch_stats", {}).get("backbone", {}) for v in expert_vars]
    )
    out: Dict[str, Any] = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


def split_fused_features(feats: jnp.ndarray, groups: int) -> List[jnp.ndarray]:
    """[B,h,w,512N] → N× [B,h,w,512] per-expert feature maps."""
    per = feats.shape[-1] // groups
    return [feats[..., i * per : (i + 1) * per] for i in range(groups)]


# ---------------------------------------------------------------------------
# Fused AutoMoE: serving-path composite with one trunk for all four experts
# ---------------------------------------------------------------------------


class FusedAutoMoE(nn.Module):
    """Inference-path AutoMoE where every expert's ResNet-18 trunk runs as
    one grouped network. Numerically equivalent to models.AutoMoE with the
    same (fused via `fuse_automoe_variables`) weights; trains are done on
    the standard AutoMoE and fused for serving."""

    config: Any  # AutoMoEConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, Any]:
        from automoe_tpu.models.automoe import _last_step
        from automoe_tpu.models.context import make_context_extractor
        from automoe_tpu.models.experts import _ConvHead, bilinear_resize
        from automoe_tpu.models.extractors import make_extractor
        from automoe_tpu.models.gating import gating_network_from_config
        from automoe_tpu.models.policy import TrajectoryPolicy

        cfg = self.config
        image = batch["image"]
        B = image.shape[0]
        groups = len(cfg.experts)
        for e in cfg.experts:
            if e.type == "nuscenes" and e.use_lidar:
                raise NotImplementedError("fused path is image-only nuScenes")

        # context — same simple/full branch as the dense composite
        # (automoe.py:99-120; 'full' takes one context_data dict)
        zeros = jnp.zeros((B, 1), image.dtype)
        speed = _last_step(batch["speed"]) if "speed" in batch else zeros
        steering = _last_step(batch["steering"]) if "steering" in batch else zeros
        throttle = _last_step(batch["throttle"]) if "throttle" in batch else zeros
        brake = _last_step(batch["brake"]) if "brake" in batch else zeros
        ctx = make_context_extractor(cfg.context, self.dtype, name="context_extractor")
        if cfg.context.type == "simple":
            context_features = ctx(speed, steering, throttle, brake)
        else:
            context_features = ctx({
                "speed": speed, "steering": steering,
                "throttle": throttle, "brake": brake,
                "hour": batch.get("hour", zeros),
                "minute": batch.get("minute", zeros),
                "weather": batch.get("weather", {}),
                "road": batch.get("road", {}),
            })

        # one grouped trunk for every expert
        feats = FusedResNet18Trunk(groups=groups, dtype=self.dtype, name="fused_trunk")(
            image
        )
        parts = split_fused_features(feats, groups)

        expert_outputs: List[Any] = []
        for i, (ecfg, f) in enumerate(zip(cfg.experts, parts)):
            if ecfg.type == "detection":
                out = _ConvHead(
                    ecfg.num_classes + 4, dtype=self.dtype, name=f"expert_{i}_head"
                )(f)
                expert_outputs.append(
                    {
                        "class_logits": out[..., : ecfg.num_classes],
                        "bbox_deltas": out[..., ecfg.num_classes :],
                    }
                )
            elif ecfg.type in ("segmentation", "drivable"):
                logits = _ConvHead(
                    ecfg.num_classes, dtype=self.dtype, name=f"expert_{i}_decoder"
                )(f)
                expert_outputs.append(
                    bilinear_resize(logits, image.shape[1], image.shape[2])
                )
            elif ecfg.type == "nuscenes":
                pooled = jnp.mean(f, axis=(1, 2))  # the trunk's GAP
                proj = nn.Dense(
                    256, dtype=self.dtype, name=f"expert_{i}_image_projection"
                )(pooled)
                queries = self.param(
                    f"expert_{i}_query_embed",
                    nn.initializers.normal(1.0),
                    (ecfg.num_queries, 256),
                ).astype(proj.dtype)
                x = proj[:, None, :] + queries[None, :, :]
                x = nn.Dense(256, dtype=self.dtype, name=f"expert_{i}_decoder_fc1")(x)
                x = nn.relu(x)
                x = nn.Dense(128, dtype=self.dtype, name=f"expert_{i}_decoder_fc2")(x)
                x = nn.relu(x)
                expert_outputs.append(
                    {
                        "class_logits": nn.Dense(
                            ecfg.num_classes, dtype=self.dtype,
                            name=f"expert_{i}_class_head",
                        )(x),
                        "bbox_preds": nn.Dense(
                            ecfg.bbox_dim, dtype=self.dtype,
                            name=f"expert_{i}_bbox_head",
                        )(x),
                    }
                )
            else:
                raise ValueError(f"unfusable expert type {ecfg.type}")

        expert_features = [
            make_extractor(ecfg, self.dtype, name=f"extractor_{i}")(out)
            for i, (ecfg, out) in enumerate(zip(cfg.experts, expert_outputs))
        ]
        gating = gating_network_from_config(
            cfg, self.dtype, name="gating_network", num_experts=groups
        )
        gating_output = gating(expert_features, context_features)
        policy = TrajectoryPolicy(
            horizon=cfg.policy.num_waypoints,
            context_dim=cfg.gating.processed_dim,
            backbone_dim=cfg.policy.backbone_dim,
            dtype=self.dtype,
            name="policy_head",
        )
        policy_output = policy(image, context=gating_output["combined_output"])
        speed_seq = policy_output["speed"]
        return {
            "waypoints": policy_output["waypoints"],
            "speed": speed_seq[:, -1:],
            "speed_seq": speed_seq,
            "expert_weights": gating_output["expert_weights"],
            "expert_outputs": expert_outputs,
            "context_features": context_features,
            "combined_features": gating_output["combined_output"],
            "gate_logits": gating_output["gate_logits"],
        }


def fuse_automoe_variables(variables: Dict[str, Any], config) -> Dict[str, Any]:
    """Standard AutoMoE variables → FusedAutoMoE variables."""
    params, stats = variables["params"], variables.get("batch_stats", {})
    trunk_key = {"nuscenes": "image_backbone"}

    expert_vars = []
    for i, ecfg in enumerate(config.experts):
        bk = trunk_key.get(ecfg.type, "backbone")
        expert_vars.append(
            {
                "params": {"backbone": params[f"expert_{i}"][bk]},
                "batch_stats": {
                    "backbone": stats.get(f"expert_{i}", {}).get(bk, {})
                },
            }
        )
    fused_trunk = fuse_expert_variables(expert_vars)

    new_params: Dict[str, Any] = {"fused_trunk": fused_trunk["params"]}
    new_stats: Dict[str, Any] = {"fused_trunk": fused_trunk.get("batch_stats", {})}
    for i, ecfg in enumerate(config.experts):
        ep, es = params[f"expert_{i}"], stats.get(f"expert_{i}", {})
        if ecfg.type == "detection":
            new_params[f"expert_{i}_head"] = ep["head"]
        elif ecfg.type in ("segmentation", "drivable"):
            new_params[f"expert_{i}_decoder"] = ep["decoder"]
        elif ecfg.type == "nuscenes":
            new_params[f"expert_{i}_image_projection"] = ep["image_projection"]
            new_params[f"expert_{i}_query_embed"] = ep["query_embed"]
            new_params[f"expert_{i}_decoder_fc1"] = ep["decoder_fc1"]
            new_params[f"expert_{i}_decoder_fc2"] = ep["decoder_fc2"]
            new_params[f"expert_{i}_class_head"] = ep["class_head"]
            new_params[f"expert_{i}_bbox_head"] = ep["bbox_head"]
        del es
    for name in ("context_extractor", "gating_network", "policy_head"):
        new_params[name] = params[name]
        if name in stats:
            new_stats[name] = stats[name]
    for i in range(len(config.experts)):
        new_params[f"extractor_{i}"] = params[f"extractor_{i}"]
    out: Dict[str, Any] = {"params": new_params}
    if any(v for v in new_stats.values()):
        out["batch_stats"] = {k: v for k, v in new_stats.items() if v}
    return out
