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
            loaded = load_variables(str(p), template)
        params[f"expert_{i}"] = loaded["params"]
        if loaded.get("batch_stats"):
            stats[f"expert_{i}"] = loaded["batch_stats"]

    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out
