"""Trajectory (policy) and gating losses.

Policy loss mirrors training/train_carla_policy.py:22-31:
  loss = ADE + 2·FDE + 0.2·speed L1 + 0.1·smoothness (L1 of consecutive
  waypoint-delta differences).

Gating loss mirrors training/train_gating_network.py:21-79: the policy
terms (with pluggable weights) plus
  * load balancing: MSE(mean expert usage, uniform), weight 0.01;
  * negative entropy of expert weights (confidence bonus), weight 0.001.
"""
from __future__ import annotations

from typing import Dict, Mapping, Optional

import jax.numpy as jnp


def _l1(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))


def _trajectory_terms(
    pred_wp: jnp.ndarray, target_wp: jnp.ndarray
) -> Dict[str, jnp.ndarray]:
    ade = _l1(pred_wp, target_wp)
    fde = _l1(pred_wp[:, -1, :], target_wp[:, -1, :])
    deltas = pred_wp[:, 1:, :] - pred_wp[:, :-1, :]
    smooth = _l1(deltas[:, 1:, :], deltas[:, :-1, :])
    return {"ade": ade, "fde": fde, "smoothness": smooth}


def _speed_term(
    pred: Mapping[str, jnp.ndarray], target_spd: jnp.ndarray
) -> jnp.ndarray:
    """Full-profile L1 when horizons line up, else last-step L1
    (train_gating_network.py:28-37)."""
    pred_spd = pred.get("speed_seq", pred.get("speed"))
    if (
        pred_spd is not None
        and pred_spd.ndim == 2
        and target_spd.ndim == 2
        and pred_spd.shape[1] == target_spd.shape[1]
    ):
        return _l1(pred_spd, target_spd)
    pred_last = pred.get("speed")
    if pred_last is not None and pred_last.ndim == 2 and pred_last.shape[1] == 1:
        return _l1(pred_last, target_spd[:, -1:])
    return jnp.zeros((), jnp.float32)


def policy_losses(
    pred: Mapping[str, jnp.ndarray],
    target_wp: jnp.ndarray,
    target_spd: jnp.ndarray,
) -> Dict[str, jnp.ndarray]:
    t = _trajectory_terms(pred["waypoints"], target_wp)
    speed = _l1(pred["speed"], target_spd)
    loss = t["ade"] + 2.0 * t["fde"] + 0.2 * speed + 0.1 * t["smoothness"]
    return {
        "loss": loss,
        "ade": t["ade"],
        "fde": t["fde"],
        "speed": speed,
        "smooth": t["smoothness"],
    }


def gating_losses(
    pred: Mapping[str, jnp.ndarray],
    target_wp: jnp.ndarray,
    target_spd: jnp.ndarray,
    config: Optional[Mapping] = None,
) -> Dict[str, jnp.ndarray]:
    cfg = dict(config or {})
    t = _trajectory_terms(pred["waypoints"], target_wp)
    speed_loss = _speed_term(pred, target_spd)

    w = pred["expert_weights"].astype(jnp.float32)  # [B, E]
    if cfg.get("use_load_balancing", True):
        mean_usage = jnp.mean(w, axis=0)
        target_usage = jnp.full_like(mean_usage, 1.0 / mean_usage.shape[0])
        load_balancing = jnp.mean((mean_usage - target_usage) ** 2)
    else:
        load_balancing = jnp.zeros((), jnp.float32)

    if cfg.get("use_entropy_loss", True):
        entropy = -jnp.mean(jnp.sum(w * jnp.log(w + 1e-8), axis=1))
        entropy_loss = -entropy  # negative entropy → confident selection
    else:
        entropy_loss = jnp.zeros((), jnp.float32)

    total = (
        cfg.get("ade_weight", 1.0) * t["ade"]
        + cfg.get("fde_weight", 2.0) * t["fde"]
        + cfg.get("speed_weight", 0.2) * speed_loss
        + cfg.get("smoothness_weight", 0.1) * t["smoothness"]
        + cfg.get("load_balancing_weight", 0.01) * load_balancing
        + cfg.get("entropy_weight", 0.001) * entropy_loss
    )
    return {
        "total_loss": total,
        "ade": t["ade"],
        "fde": t["fde"],
        "speed": speed_loss,
        "smoothness": t["smoothness"],
        "load_balancing": load_balancing,
        "entropy": entropy_loss,
    }
