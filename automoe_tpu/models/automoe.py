"""AutoMoE composite model: experts + extractors + context + gating + policy.

Parity with reference models/automoe.py:13-299. The entire forward is one
static graph: under `jax.jit` the four expert CNNs, the gating MLPs, and
the policy head compile into a single fused XLA computation (the
BASELINE.json north star). Differences from the reference, by design:

  * NHWC image layout ([B,H,W,3]).
  * The reference's per-expert try/except → zero-feature fallback
    (automoe.py:181-185) is replaced by trace-time shape validation —
    silently zeroing an expert is a correctness hazard under jit.
  * Expert freezing (automoe.py:269-279) is functional: `expert_param_mask`
    labels expert subtrees so trainers can stop gradients / mask the
    optimizer instead of mutating requires_grad.
"""
from __future__ import annotations

from typing import Any, Dict, List

import flax.linen as nn
import jax.numpy as jnp

from automoe_tpu.configs import AutoMoEConfig, load_model_config
from automoe_tpu.models.context import make_context_extractor
from automoe_tpu.models.experts import (
    BDDDetectionExpert,
    BDDDrivableExpert,
    BDDSegmentationExpert,
    NuScenesExpert,
)
from automoe_tpu.models.extractors import make_extractor
from automoe_tpu.models.gating import gating_network_from_config
from automoe_tpu.models.policy import TrajectoryPolicy

Dtype = Any


def _make_expert(cfg, dtype, name, upsample=True):
    if cfg.type == "detection":
        return BDDDetectionExpert(cfg.num_classes, dtype, name=name)
    if cfg.type == "segmentation":
        # keyword args: r3 inserted remat/qat fields before upsample and a
        # positional third arg silently bound to remat (full-res fast path
        # + remat'd composite) — caught by test_fast_pool
        return BDDSegmentationExpert(
            cfg.num_classes, dtype, upsample=upsample, name=name
        )
    if cfg.type == "drivable":
        return BDDDrivableExpert(
            cfg.num_classes, dtype, upsample=upsample, name=name
        )
    if cfg.type == "nuscenes":
        return NuScenesExpert(
            num_queries=cfg.num_queries,
            fusion=cfg.fusion,
            use_lidar=cfg.use_lidar,
            use_tnet=cfg.use_tnet,
            bbox_dim=cfg.bbox_dim,
            num_classes=cfg.num_classes,
            dtype=dtype,
            name=name,
        )
    raise ValueError(f"Unknown expert type: {cfg.type}")


def _last_step(x: jnp.ndarray) -> jnp.ndarray:
    """[B] → [B,1]; [B,T>1] → last step [B,1] (automoe.py:108-134)."""
    if x.ndim == 1:
        return x[:, None]
    if x.ndim == 2:
        return x[:, -1:]
    return x.reshape(x.shape[0], -1)[:, -1:]


class AutoMoE(nn.Module):
    config: AutoMoEConfig
    dtype: Dtype = jnp.float32
    #: Serving fast path: seg/drivable experts skip the full-res bilinear
    #: upsample and their gating extractors pool the low-res logits with
    #: exact mean-of-resize weights (bit-equivalent gating inputs, no
    #: [B,H,W,C] map materialisation). expert_outputs then contain the
    #: LOW-RES maps — use the default for dense-map consumers.
    fast_gating_pool: bool = False

    @nn.compact
    def __call__(
        self,
        batch: Dict[str, jnp.ndarray],
        *,
        train: bool = False,
        deterministic: bool = True,
        experts_eval: bool = False,
        cached_pooled: Any = None,
    ) -> Dict[str, Any]:
        """experts_eval: run the (frozen) experts in eval mode — BN uses
        running stats and stops accumulating — while the trainable parts
        keep train-mode semantics. The reference's gating trainer runs
        experts train-mode (torch `requires_grad=False` does not stop BN
        stat drift, train_gating_network.py:226-233 + model.train()); this
        is the standard frozen-BN alternative and the semantics the
        feature cache below reproduces exactly.

        cached_pooled: list of per-expert POOLED extractor inputs (the
        parameter-free pool/flatten of each expert's output, see
        train/feature_cache.py). When given, the expert trunks are skipped
        entirely and the extractor MLP heads consume these directly —
        `expert_outputs` in the result is then an empty list. Implies
        experts_eval semantics (the cache is computed in eval mode).
        """
        cfg = self.config
        image = batch["image"]  # [B,H,W,3]
        if image.ndim != 4 or image.shape[-1] != 3:
            raise ValueError(f"expected NHWC image [B,H,W,3], got {image.shape}")
        B = image.shape[0]

        # --- context (simple path: last-step vehicle state) ---
        zeros = jnp.zeros((B, 1), image.dtype)
        speed = _last_step(batch["speed"]) if "speed" in batch else zeros
        has_simple = all(k in batch for k in ("speed", "steering", "throttle", "brake"))
        ctx_extractor = make_context_extractor(
            cfg.context, self.dtype, name="context_extractor"
        )
        if cfg.context.type == "simple":
            if has_simple:
                steering = _last_step(batch["steering"])
                throttle = _last_step(batch["throttle"])
                brake = _last_step(batch["brake"])
            else:
                steering = throttle = brake = zeros
            context_features = ctx_extractor(
                speed, steering, throttle, brake, deterministic=deterministic
            )
        else:
            context_data = {
                "speed": speed,
                "steering": _last_step(batch["steering"]) if "steering" in batch else zeros,
                "throttle": _last_step(batch["throttle"]) if "throttle" in batch else zeros,
                "brake": _last_step(batch["brake"]) if "brake" in batch else zeros,
                "hour": batch.get("hour", zeros),
                "minute": batch.get("minute", zeros),
                "weather": batch.get("weather", {}),
                "road": batch.get("road", {}),
            }
            context_features = ctx_extractor(context_data, deterministic=deterministic)

        # --- experts (dense execution; unrolls into one fused graph) ---
        expert_train = train and not experts_eval
        expert_outputs: List[Any] = []
        if cached_pooled is None:
            for i, ecfg in enumerate(cfg.experts):
                expert = _make_expert(
                    ecfg, self.dtype, name=f"expert_{i}",
                    upsample=not self.fast_gating_pool,
                )
                if ecfg.type == "nuscenes":
                    lidar = batch.get("lidar")
                    if lidar is None:
                        lidar = jnp.zeros((B, 1000, 3), image.dtype)
                    out = expert(
                        {"image": image, "lidar": lidar},
                        train=expert_train,
                        # experts_eval = torch .eval() semantics for the
                        # frozen experts: BN running stats AND dropout off
                        # (the default — train-mode experts, live dropout —
                        # is the reference's model.train() behavior)
                        deterministic=deterministic or experts_eval,
                    )
                else:
                    out = expert(image, train=expert_train)
                expert_outputs.append(out)

        # --- uniform features + gating ---
        expert_features = []
        for i, ecfg in enumerate(cfg.experts):
            if cached_pooled is not None:
                expert_features.append(
                    make_extractor(ecfg, self.dtype, name=f"extractor_{i}")(
                        None,
                        deterministic=deterministic,
                        pooled=jnp.asarray(cached_pooled[i], self.dtype),
                    )
                )
                continue
            out = expert_outputs[i]
            pool_uv = None
            if self.fast_gating_pool and ecfg.type in ("segmentation",
                                                       "drivable"):
                from automoe_tpu.ops.resize import mean_of_resize_weights

                # low-res dims come from the expert's ACTUAL output — the
                # trunk's stride-32 reduction uses ceil-like dims, so
                # image_dim // 32 is wrong for non-multiple-of-32 inputs
                # (einsum would crash, or silently broadcast a size-1 dim
                # into ~2x-scaled gating features)
                pool_uv = mean_of_resize_weights(
                    out.shape[1], out.shape[2],
                    image.shape[1], image.shape[2], False,
                )
            expert_features.append(
                make_extractor(
                    ecfg, self.dtype, name=f"extractor_{i}", pool_uv=pool_uv,
                )(out, deterministic=deterministic)
            )
        # Reference parity: the composite constructor DROPS top_k/noise from
        # the gating config (automoe.py:78-91 passes neither) —
        # gating_network_from_config encodes the quirk once.
        gating = gating_network_from_config(
            cfg, self.dtype, name="gating_network"
        )
        gating_output = gating(
            expert_features, context_features, train=train, deterministic=deterministic
        )

        # --- policy head (image consumed a second time, automoe.py:218) ---
        policy = TrajectoryPolicy(
            horizon=cfg.policy.num_waypoints,
            context_dim=cfg.gating.processed_dim,
            backbone_dim=cfg.policy.backbone_dim,
            dtype=self.dtype,
            name="policy_head",
        )
        policy_output = policy(
            image, context=gating_output["combined_output"], train=train
        )
        speed_seq = policy_output["speed"]  # [B, horizon]

        return {
            "waypoints": policy_output["waypoints"],  # [B, horizon, 2]
            "speed": speed_seq[:, -1:],  # [B, 1] last-step speed
            "speed_seq": speed_seq,
            "expert_weights": gating_output["expert_weights"],  # [B, E]
            "expert_outputs": expert_outputs,
            "context_features": context_features,  # [B, context_dim]
            "combined_features": gating_output["combined_output"],  # [B, processed]
            "gate_logits": gating_output["gate_logits"],  # [B, E]
        }


def create_automoe_model(config, dtype=jnp.float32, fast_gating_pool=False) -> AutoMoE:
    """Build AutoMoE from a config dict / JSON path / AutoMoEConfig
    (parity with reference create_automoe_model, automoe.py:282-299)."""
    return AutoMoE(
        config=load_model_config(config), dtype=dtype,
        fast_gating_pool=fast_gating_pool,
    )


def expert_param_mask(params: Dict, frozen: bool = True) -> Dict:
    """Pytree mask marking expert subtrees (expert_*). True = trainable.

    Used by the gating trainer to freeze experts functionally — the TPU
    equivalent of requires_grad=False (reference automoe.py:269-273).
    """
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    mask = {
        k: (not k[0].startswith("expert_")) if frozen else True for k in flat
    }
    return flax.traverse_util.unflatten_dict(mask)


def automoe_pooled_features(model: AutoMoE, variables, batch) -> List[jnp.ndarray]:
    """Eval-mode expert forward + the extractors' parameter-free pooling,
    WITHOUT the extractor MLPs — the per-sample quantity the frozen-expert
    feature cache stores (train/feature_cache.py).

    Per expert type (mirrors the extractor pooling, extractors.py):
      detection  → mean_{H,W} concat(class_logits, bbox_deltas)   [B, C+4]
      seg/drv    → exact mean-of-resize pool of the LOW-RES logits [B, C]
                   (u^T x v == GAP of the full-res upsampled map;
                   ops/resize.py mean_of_resize_weights)
      nuscenes   → flatten concat(class_logits, bbox_preds)  [B, Q*(C+bb)]

    Jit the caller; the function is pure in (variables, batch).
    """
    from automoe_tpu.ops.resize import mean_of_resize_weights

    cfg = model.config
    image = batch["image"]
    B = image.shape[0]
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    pooled: List[jnp.ndarray] = []
    for i, ecfg in enumerate(cfg.experts):
        name = f"expert_{i}"
        evars = {"params": params[name]}
        if name in stats:
            evars["batch_stats"] = stats[name]
        if ecfg.type == "nuscenes":
            expert = _make_expert(ecfg, model.dtype, name=name)
            lidar = batch.get("lidar")
            if lidar is None:
                lidar = jnp.zeros((B, 1000, 3), image.dtype)
            out = expert.apply(
                evars, {"image": image, "lidar": lidar}, train=False
            )
            combined = jnp.concatenate(
                [out["class_logits"], out["bbox_preds"]], axis=-1
            )
            pooled.append(combined.reshape(B, -1))
        elif ecfg.type == "detection":
            expert = _make_expert(ecfg, model.dtype, name=name)
            out = expert.apply(evars, image, train=False)
            combined = jnp.concatenate(
                [out["class_logits"], out["bbox_deltas"]], axis=-1
            )
            pooled.append(jnp.mean(combined, axis=(1, 2)))
        else:  # segmentation / drivable: pool low-res, skip the upsample
            expert = _make_expert(ecfg, model.dtype, name=name, upsample=False)
            out = expert.apply(evars, image, train=False)
            u, v = mean_of_resize_weights(
                out.shape[1], out.shape[2], image.shape[1], image.shape[2],
                False,
            )
            pooled.append(
                jnp.einsum("h,bhwc,w->bc", jnp.asarray(u, out.dtype), out,
                           jnp.asarray(v, out.dtype))
            )
    return [p.astype(jnp.float32) for p in pooled]


def automoe_context_weights(model: AutoMoE, variables, batch):
    """Expert weights from context only, without running the experts
    (parity with reference AutoMoE.get_expert_weights, automoe.py:235-238:
    zero PROCESSED features injected past the expert processors).
    Analysis-only. Supports both 'simple' and 'full' context extractors."""
    cfg = model.config
    gating = gating_network_from_config(
        cfg, model.dtype, force_deterministic=True
    )
    ctx = make_context_extractor(cfg.context, model.dtype)
    ctx_vars = {"params": variables["params"]["context_extractor"]}
    zeros = jnp.zeros((batch["speed"].shape[0], 1), jnp.float32)
    if cfg.context.type == "simple":
        context_features = ctx.apply(
            ctx_vars,
            _last_step(batch["speed"]),
            _last_step(batch.get("steering", zeros)),
            _last_step(batch.get("throttle", zeros)),
            _last_step(batch.get("brake", zeros)),
        )
    else:
        context_data = {
            "speed": _last_step(batch["speed"]),
            "steering": _last_step(batch.get("steering", zeros)),
            "throttle": _last_step(batch.get("throttle", zeros)),
            "brake": _last_step(batch.get("brake", zeros)),
            "hour": batch.get("hour", zeros),
            "minute": batch.get("minute", zeros),
            "weather": batch.get("weather", {}),
            "road": batch.get("road", {}),
        }
        context_features = ctx.apply(ctx_vars, context_data)
    return gating.apply(
        {"params": variables["params"]["gating_network"]},
        context_features,
        method="context_only_weights",
    )
