"""flax variables → PyTorch state-dict export (inverse of torch_import).

Lets reference-pipeline users consume weights trained here: the exported
flat dict uses the reference modules' parameter names (experts.{i}.*,
gating_network.*, policy_head.* …) with torch layouts (conv HWIO→OIHW,
linear [in,out]→[out,in], BN running stats). Round-trip
export→import ≡ identity is tested in tests/test_torch_export.py.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np

from automoe_tpu.configs import AutoMoEConfig


def _np(x) -> np.ndarray:
    return np.asarray(x)


class _Sink:
    def __init__(self):
        self.out: Dict[str, np.ndarray] = {}

    def conv(self, torch_name: str, tree: Dict[str, Any]):
        self.out[f"{torch_name}.weight"] = _np(tree["kernel"]).transpose(3, 2, 0, 1)
        if "bias" in tree:
            self.out[f"{torch_name}.bias"] = _np(tree["bias"])

    def linear(self, torch_name: str, tree: Dict[str, Any]):
        self.out[f"{torch_name}.weight"] = _np(tree["kernel"]).T
        if "bias" in tree:
            self.out[f"{torch_name}.bias"] = _np(tree["bias"])

    def norm(self, torch_name: str, params: Dict, stats: Dict | None = None):
        self.out[f"{torch_name}.weight"] = _np(params["scale"])
        self.out[f"{torch_name}.bias"] = _np(params["bias"])
        if stats:
            self.out[f"{torch_name}.running_mean"] = _np(stats["mean"])
            self.out[f"{torch_name}.running_var"] = _np(stats["var"])
            self.out[f"{torch_name}.num_batches_tracked"] = np.asarray(0)

    def embedding(self, torch_name: str, kernel):
        self.out[f"{torch_name}.weight"] = _np(kernel)


def _export_resnet(sink: _Sink, prefix: str, p: Dict, s: Dict):
    """ResNet18Backbone tree → torch Sequential(children()[:-k]) names."""
    sink.conv(f"{prefix}0", p["conv1"])
    sink.norm(f"{prefix}1", p["bn1"], s.get("bn1"))
    for idx, stage in [(4, 1), (5, 2), (6, 3), (7, 4)]:
        for blk in (0, 1):
            bp = p[f"layer{stage}_{blk}"]
            bs = s.get(f"layer{stage}_{blk}", {})
            base = f"{prefix}{idx}.{blk}"
            sink.conv(f"{base}.conv1", bp["conv1"])
            sink.norm(f"{base}.bn1", bp["bn1"], bs.get("bn1"))
            sink.conv(f"{base}.conv2", bp["conv2"])
            sink.norm(f"{base}.bn2", bp["bn2"], bs.get("bn2"))
            if "downsample_conv" in bp:
                sink.conv(f"{base}.downsample.0", bp["downsample_conv"])
                sink.norm(
                    f"{base}.downsample.1", bp["downsample_bn"],
                    bs.get("downsample_bn"),
                )


def _export_mlp_head(sink: _Sink, prefix: str, p: Dict, offsets=(2, 5, 6)):
    a, b, c = offsets
    sink.linear(f"{prefix}{a}", p["head"]["fc1"])
    sink.linear(f"{prefix}{b}", p["head"]["fc2"])
    sink.norm(f"{prefix}{c}", p["head"]["ln"])


def export_expert(variables: Dict, expert_type: str, prefix: str = "") -> Dict:
    """One expert's variables → torch names (reference module layout)."""
    sink = _Sink()
    p = variables["params"]
    s = variables.get("batch_stats", {})
    if expert_type in ("detection", "segmentation", "drivable"):
        _export_resnet(sink, f"{prefix}backbone.", p["backbone"], s.get("backbone", {}))
        head_key = "head" if expert_type == "detection" else "decoder"
        sink.conv(f"{prefix}{head_key}.0", p[head_key]["conv1"])
        sink.conv(f"{prefix}{head_key}.2", p[head_key]["conv2"])
    elif expert_type == "nuscenes":
        _export_resnet(
            sink, f"{prefix}image_backbone.", p["image_backbone"],
            s.get("image_backbone", {}),
        )
        sink.linear(f"{prefix}image_projection", p["image_projection"])
        sink.embedding(f"{prefix}query_embed", p["query_embed"])
        sink.linear(f"{prefix}decoder.0", p["decoder_fc1"])
        sink.linear(f"{prefix}decoder.3", p["decoder_fc2"])
        sink.linear(f"{prefix}class_head", p["class_head"])
        sink.linear(f"{prefix}bbox_head", p["bbox_head"])
    else:
        raise ValueError(expert_type)
    return sink.out


def export_automoe_state_dict(
    variables: Dict[str, Any], config: AutoMoEConfig
) -> Dict[str, np.ndarray]:
    """Full AutoMoE variables → reference models/automoe.py state dict."""
    sink = _Sink()
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    for i, ecfg in enumerate(config.experts):
        sub = {
            "params": params[f"expert_{i}"],
            "batch_stats": stats.get(f"expert_{i}", {}),
        }
        sink.out.update(export_expert(sub, ecfg.type, prefix=f"experts.{i}."))
        xp = params[f"extractor_{i}"]
        offsets = (0, 3, 4) if ecfg.type == "nuscenes" else (2, 5, 6)
        _export_mlp_head(
            sink, f"expert_extractors.extractors.{i}.feature_extractor.",
            xp, offsets,
        )

    cp = params["context_extractor"]
    seq = "encoder" if config.context.type == "simple" else "context_encoder"
    sink.linear(f"context_extractor.{seq}.0", cp["fc1"])
    sink.linear(f"context_extractor.{seq}.3", cp["fc2"])
    sink.norm(f"context_extractor.{seq}.4", cp["ln"])

    gp = params["gating_network"]
    sink.linear("gating_network.context_encoder.context_encoder.0",
                gp["context_encoder"]["fc1"])
    sink.linear("gating_network.context_encoder.context_encoder.3",
                gp["context_encoder"]["fc2"])
    for i in range(len(config.experts)):
        pp = gp[f"expert_processor_{i}"]
        base = f"gating_network.expert_processors.{i}.processor"
        sink.linear(f"{base}.0", pp["fc1"])
        sink.linear(f"{base}.3", pp["fc2"])
        sink.norm(f"{base}.4", pp["ln"])
    sink.linear("gating_network.gate_network.0", gp["gate_fc1"])
    sink.linear("gating_network.gate_network.3", gp["gate_fc2"])
    sink.linear("gating_network.output_projection", gp["output_projection"])

    pp = params["policy_head"]
    ps = stats.get("policy_head", {})
    net_map = [("conv0", "bn0", 0, 1), ("conv1", "bn1", 3, 4),
               ("conv2", "bn2", 6, 7), ("conv3", "bn3", 9, 10)]
    for conv, bn, ci, bi in net_map:
        sink.conv(f"policy_head.backbone.net.{ci}", pp["backbone"][conv])
        sink.norm(
            f"policy_head.backbone.net.{bi}", pp["backbone"][bn],
            ps.get("backbone", {}).get(bn),
        )
    sink.linear("policy_head.backbone.fc", pp["backbone"]["fc"])
    for head in ("head_wp", "head_spd"):
        for j, fc in ((0, "fc1"), (2, "fc2"), (4, "fc3")):
            sink.linear(f"policy_head.{head}.{j}", pp[head][fc])

    return sink.out


def save_torch_checkpoint(variables, config, path: str, **extra) -> None:
    """Write a reference-loadable .pth ({'model_state_dict': ...})."""
    import torch

    sd = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in export_automoe_state_dict(variables, config).items()
    }
    torch.save({"model_state_dict": sd, **extra}, path)
