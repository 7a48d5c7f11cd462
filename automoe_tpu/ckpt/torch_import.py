"""PyTorch state-dict → flax variables importer.

The parity bridge: reference checkpoints (or torch-side mirrors used by the
numeric parity tests) load into the TPU models bit-for-bit modulo layout:
conv OIHW→HWIO, linear [out,in]→[in,out], BatchNorm running stats →
`batch_stats`. Also re-implements the nuScenes checkpoint key remap
(`mlp.* → decoder.*`, `box_head.* → bbox_head.*`; reference
models/automoe.py:251-262) and the DDP `module.` prefix strip
(inference/run_automoe.py:149-151).
"""
from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Tuple

import numpy as np
from flax.traverse_util import unflatten_dict


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint file to {name: np.ndarray}, unwrapping the
    reference's {'model_state_dict': ...} payloads and DDP 'module.' prefixes."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model_state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


def to_numpy_state_dict(module) -> Dict[str, np.ndarray]:
    """torch.nn.Module → {name: np.ndarray} (helper for parity tests).

    Copies: `.numpy()` would alias torch's storage, and a torch optimizer
    updates parameters IN PLACE — an aliased snapshot silently tracks
    subsequent training (bit the N-step trajectory-parity tests)."""
    return {
        k: v.detach().cpu().numpy().copy()
        for k, v in module.state_dict().items()
    }


# ---------------------------------------------------------------------------
# Generic conversion engine
# ---------------------------------------------------------------------------

def _convert(
    sd: Mapping[str, np.ndarray], rules: list[tuple[str, str]]
) -> Tuple[Dict, Dict]:
    """Apply (regex → flax path template) rules to a flat torch state dict.

    The template names the flax *module* path (slash-separated; may use
    regex groups \\1..). Leaf names and layout transposes are inferred from
    the torch suffix and tensor rank. Returns (params, batch_stats) trees.
    """
    params: Dict[Tuple[str, ...], np.ndarray] = {}
    stats: Dict[Tuple[str, ...], np.ndarray] = {}
    matched = set()

    for name, arr in sd.items():
        if name.endswith("num_batches_tracked"):
            matched.add(name)
            continue
        base, _, leaf = name.rpartition(".")
        for pattern, template in rules:
            m = re.fullmatch(pattern, base)
            if m is None:
                continue
            module_path = tuple(p for p in m.expand(template).split("/") if p)
            arr = np.asarray(arr)
            if leaf == "weight":
                if arr.ndim == 4:  # Conv2d OIHW → HWIO
                    params[module_path + ("kernel",)] = arr.transpose(2, 3, 1, 0)
                elif arr.ndim == 3:  # Conv1d kernel-1 → Dense [in,out]
                    params[module_path + ("kernel",)] = arr[:, :, 0].T
                elif arr.ndim == 2:
                    if module_path[-1] == "query_embed":  # Embedding
                        params[module_path] = arr
                    else:  # Linear [out,in] → [in,out]
                        params[module_path + ("kernel",)] = arr.T
                else:  # 1-D: BN or LN scale
                    params[module_path + ("scale",)] = arr
            elif leaf == "bias":
                params[module_path + ("bias",)] = arr
            elif leaf == "running_mean":
                stats[module_path + ("mean",)] = arr
            elif leaf == "running_var":
                stats[module_path + ("var",)] = arr
            else:
                raise KeyError(f"unhandled leaf {name}")
            matched.add(name)
            break

    unmatched = set(sd) - matched
    if unmatched:
        raise KeyError(f"unmatched torch keys: {sorted(unmatched)[:8]} "
                       f"({len(unmatched)} total)")
    return (
        unflatten_dict(params),
        unflatten_dict(stats),
    )


# ResNet-18 inside nn.Sequential(children()[:-k]): index → our stage names.
def _resnet_rules(torch_prefix: str, flax_prefix: str) -> list[tuple[str, str]]:
    p, f = re.escape(torch_prefix), flax_prefix
    rules = [
        (rf"{p}0", rf"{f}/conv1"),
        (rf"{p}1", rf"{f}/bn1"),
    ]
    for idx, stage in [(4, 1), (5, 2), (6, 3), (7, 4)]:
        rules += [
            (rf"{p}{idx}\.([01])\.(conv1|bn1|conv2|bn2)", rf"{f}/layer{stage}_\1/\2"),
            (rf"{p}{idx}\.([01])\.downsample\.0", rf"{f}/layer{stage}_\1/downsample_conv"),
            (rf"{p}{idx}\.([01])\.downsample\.1", rf"{f}/layer{stage}_\1/downsample_bn"),
        ]
    return rules


def _mlp_head_rules(torch_prefix: str, flax_prefix: str, offsets=(2, 5, 6)):
    """feature_extractor-style Sequential: Linear,...,Linear,LayerNorm."""
    p = re.escape(torch_prefix)
    a, b, c = offsets
    return [
        (rf"{p}{a}", f"{flax_prefix}/fc1"),
        (rf"{p}{b}", f"{flax_prefix}/fc2"),
        (rf"{p}{c}", f"{flax_prefix}/ln"),
    ]


def _variables(params: Dict, stats: Dict) -> Dict[str, Any]:
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


# ---------------------------------------------------------------------------
# Per-model importers. Each takes a flat torch state dict (optionally with a
# torch-side name prefix) and returns flax variables.
# ---------------------------------------------------------------------------

def _strip_prefix(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    if not prefix:
        return dict(sd)
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def import_torchvision_resnet18(sd, prefix: str = "") -> Dict[str, Any]:
    """Raw torchvision `resnet18` state dict (canonical key names —
    conv1/bn1/layerS.B.*, the layout `resnet18(pretrained=True)` downloads;
    reference models/experts/bdd_detection_expert.py:9-10) → variables for
    `ResNet18Backbone`. The classifier (`fc.*`) is dropped, exactly like
    the reference's `children()[:-2]` / `[:-1]` slicing. The expected
    key/shape contract ships as ckpt/torchvision_resnet18_manifest.json
    and is pinned by tests/test_torchvision_manifest.py."""
    sd = {k: v for k, v in _strip_prefix(sd, prefix).items()
          if not k.startswith("fc.")}
    rules = [
        (r"conv1", "conv1"),
        (r"bn1", "bn1"),
        (r"layer([1-4])\.([01])\.(conv1|bn1|conv2|bn2)", r"layer\1_\2/\3"),
        (r"layer([1-4])\.([01])\.downsample\.0", r"layer\1_\2/downsample_conv"),
        (r"layer([1-4])\.([01])\.downsample\.1", r"layer\1_\2/downsample_bn"),
    ]
    return _variables(*_convert(sd, rules))


def graft_backbone(variables: Dict[str, Any], backbone: Dict[str, Any],
                   path: str = "backbone") -> Dict[str, Any]:
    """Replace the `path` subtree of an expert's variables with imported
    backbone variables (the pretrained-init flow: reference experts start
    from ImageNet ResNet-18). Shapes are validated leaf-by-leaf."""
    import jax

    out = jax.tree.map(lambda x: x, variables)  # shallow-ish copy
    for col in ("params", "batch_stats"):
        if col not in backbone:
            continue
        if path not in out.get(col, {}):
            raise KeyError(f"no '{path}' subtree in variables['{col}']")
        old, new = out[col][path], backbone[col]
        old_shapes = {
            k: v.shape for k, v in _flatten_tree(old).items()
        }
        new_shapes = {
            k: v.shape for k, v in _flatten_tree(new).items()
        }
        if old_shapes != new_shapes:
            diff = set(old_shapes.items()) ^ set(new_shapes.items())
            raise ValueError(f"backbone shape mismatch: {sorted(diff)[:6]}")
        out[col] = dict(out[col])
        out[col][path] = new
    return out


def _flatten_tree(tree, prefix=()) -> Dict[Tuple[str, ...], Any]:
    flat = {}
    for k, v in tree.items():
        if isinstance(v, Mapping):
            flat.update(_flatten_tree(v, prefix + (k,)))
        else:
            flat[prefix + (k,)] = v
    return flat


def import_detection_expert(sd, prefix: str = "") -> Dict[str, Any]:
    sd = _strip_prefix(sd, prefix)
    rules = _resnet_rules("backbone.", "backbone") + [
        (r"head\.0", "head/conv1"),
        (r"head\.2", "head/conv2"),
    ]
    return _variables(*_convert(sd, rules))


def _import_seg_like(sd, prefix: str) -> Dict[str, Any]:
    sd = _strip_prefix(sd, prefix)
    rules = _resnet_rules("backbone.", "backbone") + [
        (r"decoder\.0", "decoder/conv1"),
        (r"decoder\.2", "decoder/conv2"),
    ]
    return _variables(*_convert(sd, rules))


def import_segmentation_expert(sd, prefix: str = "") -> Dict[str, Any]:
    return _import_seg_like(sd, prefix)


def import_drivable_expert(sd, prefix: str = "") -> Dict[str, Any]:
    return _import_seg_like(sd, prefix)


def _remap_nuscenes_keys(sd: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """mlp.* → decoder.*, box_head.* → bbox_head.* (automoe.py:251-262)."""
    out = {}
    for k, v in sd.items():
        if k.startswith("mlp."):
            k = "decoder." + k[len("mlp."):]
        elif k.startswith("box_head."):
            k = "bbox_head." + k[len("box_head."):]
        out[k] = v
    return out


def import_nuscenes_expert(sd, prefix: str = "") -> Dict[str, Any]:
    sd = _remap_nuscenes_keys(_strip_prefix(sd, prefix))
    pointnet = [
        (r"lidar_backbone\.(conv[123]|bn[12345]|fc[123])", r"lidar_backbone/\1"),
        (
            r"lidar_backbone\.(input_transform|feature_transform)"
            r"\.(conv[123]|bn[12345]|fc[123])",
            r"lidar_backbone/\1/\2",
        ),
    ]
    rules = _resnet_rules("image_backbone.", "image_backbone") + pointnet + [
        (r"image_projection", "image_projection"),
        (r"query_embed", "query_embed"),
        (r"decoder\.0", "decoder_fc1"),
        (r"decoder\.3", "decoder_fc2"),
        (r"class_head", "class_head"),
        (r"bbox_head", "bbox_head"),
    ]
    return _variables(*_convert(sd, rules))


def import_nuscenes_2d_head(sd, prefix: str = "") -> Dict[str, Any]:
    """ImageOnlyWrapper (train_carla_nuscenes_expert_2d_ddp.py:25-49) →
    NuScenesImage2DHead: ResNet18(+pool) image trunk, 256-d projection,
    learned queries, MLP 256→256→128, class + 4-dim box heads."""
    sd = _strip_prefix(sd, prefix)
    rules = _resnet_rules("image_backbone.", "image_backbone") + [
        (r"image_projection", "image_projection"),
        (r"query_embed", "query_embed"),
        (r"mlp\.0", "mlp_fc1"),
        (r"mlp\.3", "mlp_fc2"),
        (r"class_head", "class_head"),
        (r"box_head", "box_head"),
    ]
    return _variables(*_convert(sd, rules))


def import_gating(sd, prefix: str = "") -> Dict[str, Any]:
    sd = _strip_prefix(sd, prefix)
    rules = [
        (r"context_encoder\.context_encoder\.0", "context_encoder/fc1"),
        (r"context_encoder\.context_encoder\.3", "context_encoder/fc2"),
        (r"expert_processors\.(\d+)\.processor\.0", r"expert_processor_\1/fc1"),
        (r"expert_processors\.(\d+)\.processor\.3", r"expert_processor_\1/fc2"),
        (r"expert_processors\.(\d+)\.processor\.4", r"expert_processor_\1/ln"),
        (r"gate_network\.0", "gate_fc1"),
        (r"gate_network\.3", "gate_fc2"),
        (r"output_projection", "output_projection"),
    ]
    return _variables(*_convert(sd, rules))


def import_context(sd, prefix: str = "", kind: str = "simple") -> Dict[str, Any]:
    sd = _strip_prefix(sd, prefix)
    seq = "encoder" if kind == "simple" else "context_encoder"
    rules = [
        (rf"{seq}\.0", "fc1"),
        (rf"{seq}\.3", "fc2"),
        (rf"{seq}\.4", "ln"),
    ]
    return _variables(*_convert(sd, rules))


def import_policy(sd, prefix: str = "") -> Dict[str, Any]:
    sd = _strip_prefix(sd, prefix)
    rules = [
        (r"backbone\.net\.0", "backbone/conv0"),
        (r"backbone\.net\.1", "backbone/bn0"),
        (r"backbone\.net\.3", "backbone/conv1"),
        (r"backbone\.net\.4", "backbone/bn1"),
        (r"backbone\.net\.6", "backbone/conv2"),
        (r"backbone\.net\.7", "backbone/bn2"),
        (r"backbone\.net\.9", "backbone/conv3"),
        (r"backbone\.net\.10", "backbone/bn3"),
        (r"backbone\.fc", "backbone/fc"),
        (r"head_wp\.0", "head_wp/fc1"),
        (r"head_wp\.2", "head_wp/fc2"),
        (r"head_wp\.4", "head_wp/fc3"),
        (r"head_spd\.0", "head_spd/fc1"),
        (r"head_spd\.2", "head_spd/fc2"),
        (r"head_spd\.4", "head_spd/fc3"),
    ]
    return _variables(*_convert(sd, rules))


def import_extractor(sd, kind: str, prefix: str = "") -> Dict[str, Any]:
    sd = _strip_prefix(sd, prefix)
    offsets = (0, 3, 4) if kind == "nuscenes" else (2, 5, 6)
    rules = _mlp_head_rules("feature_extractor.", "head", offsets)
    return _variables(*_convert(sd, rules))


def import_automoe(sd, config) -> Dict[str, Any]:
    """Full AutoMoE state dict (e.g. a reference gating checkpoint) → flax.

    config: AutoMoEConfig (for expert types / extractor kinds).
    """
    importers = {
        "detection": import_detection_expert,
        "segmentation": import_segmentation_expert,
        "drivable": import_drivable_expert,
        "nuscenes": import_nuscenes_expert,
    }
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def merge(name: str, variables: Dict[str, Any]):
        params[name] = variables["params"]
        if "batch_stats" in variables:
            stats[name] = variables["batch_stats"]

    for i, ecfg in enumerate(config.experts):
        merge(f"expert_{i}", importers[ecfg.type](sd, prefix=f"experts.{i}."))
        merge(
            f"extractor_{i}",
            import_extractor(
                sd, ecfg.type, prefix=f"expert_extractors.extractors.{i}."
            ),
        )
    merge(
        "context_extractor",
        import_context(sd, prefix="context_extractor.", kind=config.context.type),
    )
    merge("gating_network", import_gating(sd, prefix="gating_network."))
    merge("policy_head", import_policy(sd, prefix="policy_head."))
    out: Dict[str, Any] = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out
