"""Cross-component checkpoint composition.

`load_expert_checkpoints` grafts trained expert weights into a full
AutoMoE variable tree (parity with reference models/automoe.py:240-267,
including torch `.pth` sources with the nuScenes key remap). Sources may
be orbax checkpoint dirs (our expert trainers) or reference torch files.
Empty string entries skip that expert, as in the reference.
"""
from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, List, Sequence

from automoe_tpu.configs import AutoMoEConfig


def _expert_importer(expert_type: str):
    from automoe_tpu.ckpt import torch_import as ti

    return {
        "detection": ti.import_detection_expert,
        "segmentation": ti.import_segmentation_expert,
        "drivable": ti.import_drivable_expert,
        "nuscenes": ti.import_nuscenes_expert,
    }[expert_type]


def load_expert_checkpoints(
    variables: Dict[str, Any],
    config: AutoMoEConfig,
    checkpoint_paths: Sequence[str],
) -> Dict[str, Any]:
    """Return a new AutoMoE variable tree with expert_{i} subtrees replaced
    by the checkpointed weights."""
    if len(checkpoint_paths) != len(config.experts):
        raise ValueError(
            f"expected {len(config.experts)} checkpoint paths, got "
            f"{len(checkpoint_paths)}"
        )
    params = dict(variables["params"])
    stats = dict(variables.get("batch_stats", {}))

    for i, (ecfg, path) in enumerate(zip(config.experts, checkpoint_paths)):
        if not path:
            continue
        p = Path(path)
        if p.is_file() and p.suffix in (".pth", ".pt"):
            from automoe_tpu.ckpt.torch_import import load_torch_state_dict

            sd = load_torch_state_dict(str(p))
            loaded = _expert_importer(ecfg.type)(sd)
        else:  # orbax dir from our expert trainers
            from automoe_tpu.ckpt.checkpoint import load_variables

            template = {
                "params": params[f"expert_{i}"],
                "batch_stats": stats.get(f"expert_{i}", {}),
            }
            # The CARLA fine-tune writes NuScenesImage2DHead trees
            # (module names mlp_fc*/box_head — the reference wrapper's
            # state-dict layout); the composite's NuScenesExpert names
            # the same tensors decoder_fc*/bbox_head. Mirror the
            # reference's load-time remap (automoe.py:250-262
            # mlp.->decoder., box_head.->bbox_head.) for orbax sources.
            # The layout must be detected from the checkpoint's METADATA:
            # load_variables restores with partial_restore=True, which
            # silently leaves template (init!) values in place for keys
            # the checkpoint doesn't have — a mismatched-layout restore
            # "succeeds" with untrained decoder weights rather than
            # raising, so an exception fallback never fires.
            if ecfg.type == "nuscenes" and "mlp_fc1" in _orbax_param_keys(p):
                loaded = _restore_nuscenes_2d(str(p), template)
            else:
                loaded = load_variables(str(p), template)
        params[f"expert_{i}"] = loaded["params"]
        if loaded.get("batch_stats"):
            stats[f"expert_{i}"] = loaded["batch_stats"]

    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


def _orbax_param_keys(path) -> set:
    """Top-level key names under 'params' in an orbax checkpoint dir,
    read from checkpoint metadata (no tensor loads). Empty set if the
    metadata is unreadable — callers then take the plain-restore path."""
    import orbax.checkpoint as ocp

    try:
        with ocp.PyTreeCheckpointer() as ckptr:
            md = ckptr.metadata(Path(path).resolve())
        tree = getattr(md, "item_metadata", md)
        return set(tree["params"].keys())
    except Exception:
        return set()


_NUSCENES_2D_RENAME = {
    "decoder_fc1": "mlp_fc1",
    "decoder_fc2": "mlp_fc2",
    "bbox_head": "box_head",
}


def _restore_nuscenes_2d(path: str, template: Dict[str, Any]) -> Dict[str, Any]:
    """Restore a `carla_nuscenes_2d` workload checkpoint into a
    NuScenesExpert-shaped template (gating --expert-ckpts handoff: the
    4th expert checkpoint comes from the image-only 2D fine-tune,
    train_gating_network.sh's EXPERT_CHECKPOINTS[3])."""
    from automoe_tpu.ckpt.checkpoint import load_variables

    t2 = {
        "params": {
            _NUSCENES_2D_RENAME.get(k, k): v
            for k, v in template["params"].items()
        },
        "batch_stats": {
            _NUSCENES_2D_RENAME.get(k, k): v
            for k, v in template.get("batch_stats", {}).items()
        },
    }
    inv = {v: k for k, v in _NUSCENES_2D_RENAME.items()}
    # expected-partial: a lidar-fused expert template holds pointnet/TNet
    # modules the image-only 2D fine-tune never trained — those stay init
    # by design (the reference loads the same subset, automoe.py:250-262)
    loaded = load_variables(path, t2, on_missing="ignore")
    return {
        "params": {
            inv.get(k, k): v for k, v in loaded["params"].items()
        },
        "batch_stats": {
            inv.get(k, k): v
            for k, v in loaded.get("batch_stats", {}).items()
        },
    }
